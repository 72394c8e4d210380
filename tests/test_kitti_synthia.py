"""KITTI/SYNTHIA loaders against tiny fake dataset trees."""

import os

import numpy as np
import pytest
from PIL import Image

from lsi_tpu.config import DataConfig
from lsi_tpu.data import kitti, synthia
from lsi_tpu.data.pipeline import make_dataset


def _png(path, h, w, value=None, mode="RGB", dtype=np.uint8):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    if value is None:
        arr = np.random.default_rng(0).integers(
            0, 255, (h, w, 3), dtype=np.uint8)
    else:
        arr = np.full((h, w, 3) if mode == "RGB" else (h, w), value,
                      dtype=dtype)
    Image.fromarray(arr, mode=mode if mode != "I;16" else None).save(path)


CALIB = """calib_time: 09-Jan-2012 13:57:47
P_rect_02: 7.215377e+02 0.000000e+00 6.095593e+02 4.485728e+01 0.000000e+00 7.215377e+02 1.728540e+02 2.163791e-01 0.000000e+00 0.000000e+00 1.000000e+00 2.745884e-03
P_rect_03: 7.215377e+02 0.000000e+00 6.095593e+02 -3.395242e+02 0.000000e+00 7.215377e+02 1.728540e+02 2.199936e+00 0.000000e+00 0.000000e+00 1.000000e+00 2.729905e-03
"""


@pytest.fixture
def kitti_root(tmp_path):
    root = tmp_path / "kitti"
    date = "2011_09_26"
    drive = f"{date}_drive_0001_sync"
    for cam in ("image_02", "image_03"):
        for i in range(3):
            _png(str(root / date / drive / cam / "data" / f"{i:010d}.png"),
                 64, 192)
    (root / date / "calib_cam_to_cam.txt").write_text(CALIB)
    return str(root)


def test_kitti_calib_parsing(kitti_root):
    calib = kitti.parse_calib_cam_to_cam(
        os.path.join(kitti_root, "2011_09_26", "calib_cam_to_cam.txt"))
    K, baseline = kitti.stereo_params(calib)
    assert abs(K[0, 0] - 721.5377) < 1e-3
    assert abs(K[0, 2] - 609.5593) < 1e-3
    # standard KITTI baseline ~0.537 m
    assert abs(baseline - (44.85728 + 339.5242) / 721.5377) < 1e-4
    assert 0.4 < baseline < 0.6


def test_kitti_indexing_and_stream(kitti_root):
    records = kitti.index_drives(kitti_root)
    assert len(records) == 3
    cfg = DataConfig(dataset="kitti", root=kitti_root, height=32, width=96,
                     batch_size=2, augment=False)
    it = make_dataset(cfg, seed=0, repeat=False)
    batch = next(it)
    assert batch.src_image.shape == (2, 32, 96, 3)
    K = np.asarray(batch.intrinsics)[0]
    # fake images are 192x64, resized to 96x32 => K scales by 0.5
    assert abs(K[0, 0] - 721.5377 * 0.5) < 1e-2
    assert abs(K[1, 1] - 721.5377 * 0.5) < 1e-2
    assert abs(K[0, 2] - (609.5593 * 0.5 - 0.25)) < 1e-2
    pose = np.asarray(batch.pose_src2trg)[0]
    assert pose[0, 3] < -0.4  # -baseline
    np.testing.assert_allclose(pose[:3, :3], np.eye(3))


def test_kitti_augment_swaps_and_jitters(kitti_root):
    cfg = DataConfig(dataset="kitti", root=kitti_root, height=32, width=96,
                     batch_size=6, augment=True)
    it = make_dataset(cfg, seed=3, repeat=True)
    batch = next(it)
    poses = np.asarray(batch.pose_src2trg)[:, 0, 3]
    assert (poses > 0).any() and (poses < 0).any()  # both directions seen


@pytest.fixture
def synthia_root(tmp_path):
    root = tmp_path / "synthia"
    seq = root / "SYNTHIA-SEQS-01-SUMMER"
    for cam in ("Stereo_Left", "Stereo_Right"):
        for i in range(2):
            _png(str(seq / "RGB" / cam / "Omni_F" / f"{i:07d}.png"), 76, 128)
    for i in range(2):
        path = seq / "Depth" / "Stereo_Left" / "Omni_F" / f"{i:07d}.png"
        os.makedirs(os.path.dirname(str(path)), exist_ok=True)
        depth_cm = np.full((76, 128), 500, np.uint16)  # 5 m
        Image.fromarray(depth_cm).save(str(path))
    return str(root)


def test_synthia_stream_with_depth(synthia_root):
    cfg = DataConfig(dataset="synthia", root=synthia_root, height=38,
                     width=64, batch_size=2, augment=False)
    it = make_dataset(cfg, seed=0, repeat=False)
    batch = next(it)
    assert batch.src_image.shape == (2, 38, 64, 3)
    disp = np.asarray(batch.gt_disparity)
    valid = np.asarray(batch.gt_valid)
    assert valid.min() == 1.0
    np.testing.assert_allclose(disp, 1.0 / 5.0, rtol=1e-5)
    pose = np.asarray(batch.pose_src2trg)[0]
    assert abs(pose[0, 3] + synthia.BASELINE_M) < 1e-6


def test_missing_roots_raise():
    cfg = DataConfig(dataset="kitti", root="/nonexistent", height=8,
                     width=8, batch_size=1)
    with pytest.raises(Exception):
        next(iter(kitti.example_stream(cfg, 0, False)))


def _write_oxts_tree(root, n_frames=3, forward_per_frame=1.0):
    """Extend the fake KITTI tree with OXTS + imu/velo calibs: the car
    drives straight 'north' (lat increasing) with identity attitude."""
    import numpy as np
    date = "2011_09_26"
    drive = f"{date}_drive_0001_sync"
    odir = root / date / drive / "oxts" / "data"
    os.makedirs(str(odir), exist_ok=True)
    lat0 = 49.0
    # meters -> degrees latitude: with the devkit's scale = cos(lat0), the
    # Mercator y displacement is ~R * dlat_rad near lat0.
    from lsi_tpu.data.kitti_oxts import EARTH_RADIUS
    for i in range(n_frames):
        dlat = np.rad2deg(i * forward_per_frame / EARTH_RADIUS)
        vals = [lat0 + dlat, 8.43, 110.0, 0.0, 0.0, np.pi / 2] + [0.0] * 24
        (odir / f"{i:010d}.txt").write_text(
            " ".join(f"{v:.12f}" for v in vals))
    # identity imu->velo->cam chain for a clean analytic check
    (root / date / "calib_imu_to_velo.txt").write_text(
        "R: 1 0 0 0 1 0 0 0 1\nT: 0 0 0\n")
    (root / date / "calib_velo_to_cam.txt").write_text(
        "R: 1 0 0 0 1 0 0 0 1\nT: 0 0 0\n")


def test_kitti_temporal_pairs(kitti_root, tmp_path):
    import pathlib
    _write_oxts_tree(pathlib.Path(kitti_root))
    cfg = DataConfig(dataset="kitti", root=kitti_root, height=32, width=96,
                     batch_size=2, augment=False, kitti_pairs="temporal",
                     temporal_stride=1)
    it = make_dataset(cfg, seed=0, repeat=False)
    batch = next(it)
    assert batch.src_image.shape == (2, 32, 96, 3)
    pose = np.asarray(batch.pose_src2trg)[0]
    # Heading yaw=pi/2 means the IMU x-axis (forward) points along world-y
    # (north); the car moves 1 m/frame north => in the (identity-calib)
    # camera frame the motion is 1 m along camera x. Points of frame t map
    # into frame t+1 shifted by -1 m along x.
    np.testing.assert_allclose(pose[:3, :3], np.eye(3), atol=1e-6)
    np.testing.assert_allclose(pose[:3, 3], [-1.0, 0.0, 0.0], atol=1e-3)


def test_oxts_pose_math_rotation():
    """Pure yaw change between frames -> pure rotation in the cam frame."""
    import numpy as np
    from lsi_tpu.data import kitti_oxts
    o0 = np.array([49.0, 8.43, 110.0, 0.0, 0.0, 0.0] + [0.0] * 24)
    o1 = o0.copy()
    o1[5] = 0.1  # yaw by 0.1 rad, no translation
    T = kitti_oxts.relative_camera_pose(
        o0, o1, np.eye(4), kitti_oxts.mercator_scale(o0))
    np.testing.assert_allclose(T[:3, 3], 0.0, atol=1e-6)
    # R should be Rz(-0.1) (t1 frame sees t0 points rotated back)
    ang = np.arctan2(T[1, 0], T[0, 0])
    np.testing.assert_allclose(ang, -0.1, atol=1e-8)


def test_kitti_drive_level_split(tmp_path):
    """Two drives: train/val must partition at the drive level."""
    root = tmp_path / "kitti2"
    date = "2011_09_26"
    for drive_id in ("0001", "0002"):
        drive = f"{date}_drive_{drive_id}_sync"
        for cam in ("image_02", "image_03"):
            for i in range(2):
                _png(str(root / date / drive / cam / "data"
                         / f"{i:010d}.png"), 64, 192)
    (root / date / "calib_cam_to_cam.txt").write_text(CALIB)

    all_recs = kitti.index_drives(str(root))
    assert len(all_recs) == 4
    from lsi_tpu.data.splits import split_records
    key = lambda r: os.path.dirname(os.path.dirname(  # noqa: E731
        os.path.dirname(r["left"])))
    train = split_records(all_recs, key, "train", 0.1)
    val = split_records(all_recs, key, "val", 0.1)
    assert len(train) == 2 and len(val) == 2
    assert {key(r) for r in train}.isdisjoint({key(r) for r in val})

    # and the stream respects cfg.split
    cfg = DataConfig(dataset="kitti", root=str(root), height=32, width=96,
                     batch_size=2, augment=False, split="val")
    batch = next(make_dataset(cfg, seed=0, repeat=False))
    assert batch.src_image.shape == (2, 32, 96, 3)


def test_synthia_right_depth_feeds_trg_gt(synthia_root, tmp_path):
    """Depth/Stereo_Right populates the occluded-region eval's target GT."""
    seq = os.path.join(synthia_root, "SYNTHIA-SEQS-01-SUMMER")
    for i in range(2):
        path = os.path.join(seq, "Depth", "Stereo_Right", "Omni_F",
                            f"{i:07d}.png")
        os.makedirs(os.path.dirname(path), exist_ok=True)
        Image.fromarray(np.full((76, 128), 800, np.uint16)).save(path)  # 8 m

    cfg = DataConfig(dataset="synthia", root=synthia_root, height=38,
                     width=64, batch_size=2, augment=False)
    batch = next(make_dataset(cfg, seed=0, repeat=False))
    np.testing.assert_allclose(np.asarray(batch.trg_gt_disparity), 1.0 / 8.0,
                               rtol=1e-5)
    assert np.asarray(batch.trg_gt_valid).min() == 1.0


# ----------------------------------------------------- velodyne LiDAR depth

def test_velodyne_projection_analytic():
    """Hand-computed rasterization: nearest-point z-buffer, range cuts,
    1/depth convention."""
    from lsi_tpu.data.kitti_velodyne import project_to_disparity
    K = np.array([[100.0, 0, 32], [0, 100.0, 16], [0, 0, 1]])
    proj = np.concatenate([K, np.zeros((3, 1))], axis=1)  # cam == velo frame
    pts = np.array([
        [0.1, 0.04, 10.0, 1.0],    # u=33, v=16.4->16, depth 10
        [0.1, 0.04, 5.0, 1.0],     # same pixel (u=34,v=16.8->17)? no:
                                   # u=100*0.02+32=34 -> different pixel
        [-0.64, 0.0, 2.0, 1.0],    # u=0, v=16, depth 2
        [0.0, 0.0, -5.0, 1.0],     # behind camera: dropped
        [0.0, 0.0, 500.0, 1.0],    # beyond max_depth: dropped
    ], np.float32)
    disp, valid = project_to_disparity(pts, proj, (32, 64), (32, 64))
    assert disp.shape == (32, 64, 1) and valid.shape == (32, 64, 1)
    np.testing.assert_allclose(disp[16, 33, 0], 0.1, rtol=1e-6)
    np.testing.assert_allclose(disp[16, 0, 0], 0.5, rtol=1e-6)
    # center pixel (behind-camera + too-far points) stays invalid
    assert valid[16, 32, 0] == 0.0
    assert valid.sum() == 3.0  # exactly the three in-range points


def test_velodyne_zbuffer_nearest_wins():
    from lsi_tpu.data.kitti_velodyne import project_to_disparity
    K = np.array([[100.0, 0, 32], [0, 100.0, 16], [0, 0, 1]])
    proj = np.concatenate([K, np.zeros((3, 1))], axis=1)
    # two points projecting to the SAME pixel at different depths
    pts = np.array([[0.0, 0.0, 10.0, 1.0],
                    [0.0, 0.0, 4.0, 1.0]], np.float32)
    disp, valid = project_to_disparity(pts, proj, (32, 64), (32, 64))
    np.testing.assert_allclose(disp[16, 32, 0], 0.25, rtol=1e-6)  # 1/4 m


def _write_velodyne_tree(root):
    """Extend the fake KITTI tree with velodyne scans + velo->cam calib.

    Uses the real KITTI axis convention (velo x fwd, y left, z up ->
    cam x right, y down, z fwd) and crafts points that land INSIDE the
    (64, 192)-pixel fake images under the fixture's P_rect_02."""
    date = "2011_09_26"
    drive = f"{date}_drive_0001_sync"
    (root / date / "calib_velo_to_cam.txt").write_text(
        "R: 0 -1 0 0 0 -1 1 0 0\nT: 0 0 0\n")
    # append R_rect_00 (identity) to the cam calib
    calib_path = root / date / "calib_cam_to_cam.txt"
    calib_path.write_text(calib_path.read_text()
                          + "R_rect_00: 1 0 0 0 1 0 0 0 1\n")
    vdir = root / date / drive / "velodyne_points" / "data"
    os.makedirs(str(vdir), exist_ok=True)
    # camera-frame target: pixel (u_orig, v_orig) ~ (100, 30) at depth 20 m.
    # With P_rect_02: u = (fx*x_c + cx*z_c + 44.857)/z_c.
    fx, cx, cy = 721.5377, 609.5593, 172.854
    z_c = 20.0
    x_c = ((100.0 * z_c) - cx * z_c - 44.85728) / fx
    y_c = ((30.0 * z_c) - cy * z_c - 0.2163791) / fx
    # invert cam<-velo: x_c=-y_v, y_c=-z_v, z_c=x_v
    pt = np.array([z_c, -x_c, -y_c, 1.0], np.float32)
    for i in range(3):
        pt.tofile(str(vdir / f"{i:010d}.bin"))


def test_kitti_stream_emits_lidar_gt(kitti_root):
    import pathlib
    _write_velodyne_tree(pathlib.Path(kitti_root))
    cfg = DataConfig(dataset="kitti", root=kitti_root, height=32, width=96,
                     batch_size=2, augment=False)
    batch = next(make_dataset(cfg, seed=0, repeat=False))
    disp = np.asarray(batch.gt_disparity)
    valid = np.asarray(batch.gt_valid)
    # each example carries exactly the one projected point
    assert valid.sum(axis=(1, 2, 3)).tolist() == [1.0, 1.0]
    # fake images are (64, 192) but calib is for full-res KITTI -> the
    # stream scales by (96/192, 32/64): pixel (100, 30) -> (50, 15)
    # rtol accounts for P_rect_02's small z-translation (P[2,3] = 2.7 mm)
    np.testing.assert_allclose(disp[0, 15, 50, 0], 1.0 / 20.0, rtol=1e-3)
    # and the depth eval path consumes it end-to-end
    from lsi_tpu.evaluation.metrics import depth_metrics
    import jax.numpy as jnp
    m = depth_metrics(jnp.asarray(disp), jnp.asarray(disp),
                      jnp.asarray(valid))
    np.testing.assert_allclose(float(m["abs_rel"]), 0.0, atol=1e-6)


def test_kitti_stream_no_velodyne_keeps_zero_gt(kitti_root):
    cfg = DataConfig(dataset="kitti", root=kitti_root, height=32, width=96,
                     batch_size=2, augment=False)
    batch = next(make_dataset(cfg, seed=0, repeat=False))
    assert np.asarray(batch.gt_valid).sum() == 0.0
