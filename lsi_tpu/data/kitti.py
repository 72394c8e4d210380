"""KITTI raw stereo-pair dataset.

Capability parity with the reference's KITTI loader (``lsi/data/kitti/…``):
indexes KITTI-raw city/residential/road drives, parses
``calib_cam_to_cam.txt`` for the rectified color-camera intrinsics
(P_rect_02 / P_rect_03) and the stereo baseline, loads left/right image
pairs, resizes to the training resolution (rescaling K accordingly), applies
photometric + left-right-swap augmentation, and streams (src, trg, K, pose)
examples. Directory layout expected::

    <root>/<date>/<date>_drive_<id>_sync/image_02/data/*.png   (left)
    <root>/<date>/<date>_drive_<id>_sync/image_03/data/*.png   (right)
    <root>/<date>/calib_cam_to_cam.txt

Images are decoded with PIL if available (TF not required); resize is
antialiased bilinear via PIL, matching standard KITTI preprocessing.
"""

from __future__ import annotations

import os
from typing import Dict, Iterator, List, Tuple

import numpy as np

from lsi_tpu.config import DataConfig

# KITTI rectified stereo: right camera is `baseline` meters to the LEFT
# camera's +x. Points in the left frame map to the right frame by
# x -> x - baseline.


def parse_calib_cam_to_cam(path: str) -> Dict[str, np.ndarray]:
    """Parse KITTI's calib_cam_to_cam.txt into {key: float array}."""
    out = {}
    with open(path) as f:
        for line in f:
            if ":" not in line:
                continue
            key, val = line.split(":", 1)
            try:
                out[key.strip()] = np.asarray(
                    [float(v) for v in val.split()], np.float64)
            except ValueError:
                continue  # calib_time etc.
    return out


def stereo_params(calib: Dict[str, np.ndarray]) -> Tuple[np.ndarray, float]:
    """Intrinsics K (left rectified color cam) + baseline in meters.

    From the 3x4 projection matrices: P_rect_02 = K [I | -K^-1 p2] etc.;
    baseline = (p2_x - p3_x) / fx where p*_x is P[0, 3].
    """
    p2 = calib["P_rect_02"].reshape(3, 4)
    p3 = calib["P_rect_03"].reshape(3, 4)
    K = p2[:3, :3].astype(np.float32)
    fx = K[0, 0]
    baseline = float((p2[0, 3] - p3[0, 3]) / fx)
    return K, abs(baseline)


def index_temporal(root: str, stride: int = 1) -> List[dict]:
    """(frame t, frame t+stride) records of the left camera with OXTS poses
    (temporal training pairs; requires oxts/ and the imu/velo calibs)."""
    records = []
    if not os.path.isdir(root):
        return records
    for date in sorted(os.listdir(root)):
        date_dir = os.path.join(root, date)
        calib_path = os.path.join(date_dir, "calib_cam_to_cam.txt")
        have_imu = (os.path.exists(os.path.join(date_dir,
                                                "calib_imu_to_velo.txt"))
                    and os.path.exists(os.path.join(date_dir,
                                                    "calib_velo_to_cam.txt")))
        if not os.path.isdir(date_dir) or not os.path.exists(calib_path)                 or not have_imu:
            continue
        for drive in sorted(os.listdir(date_dir)):
            ldir = os.path.join(date_dir, drive, "image_02", "data")
            odir = os.path.join(date_dir, drive, "oxts", "data")
            if not (os.path.isdir(ldir) and os.path.isdir(odir)):
                continue
            frames = sorted(f for f in os.listdir(ldir)
                            if f.endswith(".png"))
            for a, b in zip(frames, frames[stride:]):
                oa = os.path.join(odir, a.replace(".png", ".txt"))
                ob = os.path.join(odir, b.replace(".png", ".txt"))
                if os.path.exists(oa) and os.path.exists(ob):
                    records.append({
                        "src": os.path.join(ldir, a),
                        "trg": os.path.join(ldir, b),
                        "oxts_src": oa,
                        "oxts_trg": ob,
                        "calib": calib_path,
                        "date_dir": date_dir,
                    })
    return records


def index_drives(root: str) -> List[dict]:
    """Find all (left_img, right_img, calib) frame records under root."""
    records = []
    if not os.path.isdir(root):
        return records
    for date in sorted(os.listdir(root)):
        date_dir = os.path.join(root, date)
        calib_path = os.path.join(date_dir, "calib_cam_to_cam.txt")
        if not os.path.isdir(date_dir) or not os.path.exists(calib_path):
            continue
        for drive in sorted(os.listdir(date_dir)):
            ldir = os.path.join(date_dir, drive, "image_02", "data")
            rdir = os.path.join(date_dir, drive, "image_03", "data")
            if not (os.path.isdir(ldir) and os.path.isdir(rdir)):
                continue
            for fname in sorted(os.listdir(ldir)):
                rpath = os.path.join(rdir, fname)
                if fname.endswith(".png") and os.path.exists(rpath):
                    records.append({
                        "left": os.path.join(ldir, fname),
                        "right": rpath,
                        "calib": calib_path,
                    })
    return records


def _load_image(path: str, height: int, width: int) -> np.ndarray:
    from PIL import Image
    img = Image.open(path).convert("RGB")
    orig_w, orig_h = img.size
    img = img.resize((width, height), Image.BILINEAR)
    arr = np.asarray(img, np.float32) / 255.0
    return arr, (orig_h, orig_w)


def _load_stereo_pair(left: str, right: str, height: int, width: int,
                      dims_cache: Dict[str, Tuple[int, int]]):
    """Load a rectified pair, preferring the native C++ threaded loader
    (decode + antialiased resize in one call); PIL fallback. Returns
    (left, right, (orig_h, orig_w))."""
    from lsi_tpu import native

    key = os.path.dirname(left)
    if native.available():
        if key not in dims_cache:
            probe = native.decode_image(left)
            if probe is not None:
                dims_cache[key] = probe.shape[:2]
        if key in dims_cache:
            batch = native.load_batch([left, right], height, width,
                                      num_threads=2)
            if batch is not None and batch.max() > 0:
                return batch[0], batch[1], dims_cache[key]
    l_img, dims = _load_image(left, height, width)
    r_img, _ = _load_image(right, height, width)
    dims_cache[key] = dims
    return l_img, r_img, dims


def _to_wire_u8(img: np.ndarray) -> np.ndarray:
    """f32 [0,1] -> uint8 wire format (decode_batch converts on device);
    4x less host->device traffic — the tunnel binds at flagship res."""
    return (np.clip(img, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)


def _photometric_augment(rng: np.random.Generator, *imgs):
    """Shared brightness/contrast/color jitter (same for both views)."""
    gamma = rng.uniform(0.8, 1.2)
    brightness = rng.uniform(0.8, 1.2)
    colors = rng.uniform(0.9, 1.1, size=(3,)).astype(np.float32)
    out = []
    for im in imgs:
        im = im ** gamma * brightness * colors
        out.append(np.clip(im, 0.0, 1.0).astype(np.float32))
    return out


def example_stream(cfg: DataConfig, seed: int, repeat: bool
                   ) -> Iterator[dict]:
    """Yield single-example dicts for the pipeline (see pipeline.py)."""
    from lsi_tpu.geometry import projection as proj_np  # scale math only
    import jax.numpy as jnp  # noqa: F401  (scale_intrinsics is jnp-based)

    if getattr(cfg, "kitti_pairs", "stereo") == "temporal":
        yield from _temporal_stream(cfg, seed, repeat)
        return

    records = index_drives(cfg.root)
    if not records:
        raise FileNotFoundError(
            f"no KITTI records under {cfg.root!r} — expected "
            "<root>/<date>/<date>_drive_*_sync/image_0{2,3}/data/*.png")
    # Hold out whole drives so adjacent near-duplicate frames never leak
    # between train and val.
    from lsi_tpu.data.splits import split_records
    records = split_records(
        records, lambda r: os.path.dirname(os.path.dirname(
            os.path.dirname(r["left"]))),
        cfg.split, cfg.val_fraction)
    rng = np.random.default_rng(seed)
    calib_cache: Dict[str, Tuple[np.ndarray, float]] = {}
    dims_cache_img: Dict[str, Tuple[int, int]] = {}
    from lsi_tpu.data.kitti_velodyne import VelodyneDepth
    velo = VelodyneDepth()

    epoch = 0
    while True:
        order = rng.permutation(len(records)) if cfg.augment else \
            np.arange(len(records))
        for i in order:
            rec = records[i]
            if rec["calib"] not in calib_cache:
                calib_cache[rec["calib"]] = stereo_params(
                    parse_calib_cam_to_cam(rec["calib"]))
            K_full, baseline = calib_cache[rec["calib"]]

            left, right, (oh, ow) = _load_stereo_pair(
                rec["left"], rec["right"], cfg.height, cfg.width,
                dims_cache_img)

            K = np.asarray(proj_np.scale_intrinsics(
                K_full[None], cfg.width / ow, cfg.height / oh))[0]

            # left->right: right camera at +baseline along x in left coords
            # => points move by -baseline in the right frame.
            pose = np.eye(4, dtype=np.float32)
            pose[0, 3] = -baseline
            src, trg = left, right
            swapped = False

            if cfg.augment:
                if rng.uniform() < 0.5:
                    # swap roles: predict from the right image instead
                    src, trg = trg, src
                    swapped = True
                    pose = pose.copy()
                    pose[0, 3] = baseline
                src, trg = _photometric_augment(rng, src, trg)

            # LiDAR GT depth for the LEFT camera (SURVEY §3.4 depth eval):
            # swapped pairs predict from the right image, where the left
            # rasterization does not apply — leave valid empty there.
            gt = None if swapped else velo.disparity_for(
                rec["left"], rec["calib"], (oh, ow),
                (cfg.height, cfg.width))
            if gt is None:
                gt = (np.zeros((cfg.height, cfg.width, 1), np.float32),
                      np.zeros((cfg.height, cfg.width, 1), np.float32))

            yield {
                "src_image": _to_wire_u8(src),
                "trg_image": _to_wire_u8(trg),
                "intrinsics": K.astype(np.float32),
                "pose_src2trg": pose,
                "gt_disparity": gt[0],
                "gt_valid": gt[1],
            }
        if not repeat:
            return
        epoch += 1


def _temporal_stream(cfg: DataConfig, seed: int, repeat: bool
                     ) -> Iterator[dict]:
    """Temporal (same-camera) pairs with OXTS ego-motion poses."""
    from lsi_tpu.geometry import projection as proj_np
    from lsi_tpu.data import kitti_oxts

    records = index_temporal(cfg.root, cfg.temporal_stride)
    if not records:
        raise FileNotFoundError(
            f"no KITTI temporal records under {cfg.root!r} — needs "
            "image_02, oxts/data and calib_imu_to_velo/velo_to_cam")
    from lsi_tpu.data.splits import split_records
    records = split_records(
        records, lambda r: os.path.dirname(os.path.dirname(
            os.path.dirname(r["src"]))),
        cfg.split, cfg.val_fraction)
    rng = np.random.default_rng(seed)
    calib_cache: Dict[str, Tuple[np.ndarray, float]] = {}
    imu_cache: Dict[str, np.ndarray] = {}
    scale_cache: Dict[str, float] = {}
    dims_cache: Dict[str, Tuple[int, int]] = {}

    while True:
        order = rng.permutation(len(records)) if cfg.augment else \
            np.arange(len(records))
        for i in order:
            rec = records[i]
            if rec["calib"] not in calib_cache:
                calib_cache[rec["calib"]] = stereo_params(
                    parse_calib_cam_to_cam(rec["calib"]))
            K_full, _ = calib_cache[rec["calib"]]
            if rec["date_dir"] not in imu_cache:
                imu_cache[rec["date_dir"]] = kitti_oxts.cam_from_imu(
                    rec["date_dir"])

            oxts_src = kitti_oxts.load_oxts(rec["oxts_src"])
            oxts_trg = kitti_oxts.load_oxts(rec["oxts_trg"])
            drive = os.path.dirname(rec["oxts_src"])
            if drive not in scale_cache:
                scale_cache[drive] = kitti_oxts.mercator_scale(oxts_src)
            pose = kitti_oxts.relative_camera_pose(
                oxts_src, oxts_trg, imu_cache[rec["date_dir"]],
                scale_cache[drive])

            src, trg, (oh, ow) = _load_stereo_pair(
                rec["src"], rec["trg"], cfg.height, cfg.width, dims_cache)
            K = np.asarray(proj_np.scale_intrinsics(
                K_full[None], cfg.width / ow, cfg.height / oh))[0]
            if cfg.augment:
                src, trg = _photometric_augment(rng, src, trg)

            yield {
                "src_image": _to_wire_u8(src),
                "trg_image": _to_wire_u8(trg),
                "intrinsics": K.astype(np.float32),
                "pose_src2trg": pose,
                "gt_disparity": np.zeros(
                    (cfg.height, cfg.width, 1), np.float32),
                "gt_valid": np.zeros(
                    (cfg.height, cfg.width, 1), np.float32),
            }
        if not repeat:
            return
