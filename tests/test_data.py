"""Synthetic dataset + input pipeline tests."""

import numpy as np
import jax

from lsi_tpu.config import DataConfig
from lsi_tpu.data import synthetic
from lsi_tpu.data.pipeline import make_dataset


def test_scene_geometric_consistency(rng):
    """The analytic stereo pair must satisfy the warp equation: warping the
    target image back with GT disparity reproduces the source (away from
    occlusion boundaries)."""
    s = synthetic.make_scene(rng, 32, 64, baseline=0.3)
    fx = s.intrinsics[0, 0]
    h, w = s.src_image.shape[:2]
    shift = fx * 0.3 * s.gt_visible_disparity  # pixels moved left in target
    xs = np.arange(w, dtype=np.float32)[None, :] - shift
    # bilinear sample target at xs
    x0 = np.floor(xs).astype(int)
    f = xs - x0
    x0c = np.clip(x0, 0, w - 1)
    x1c = np.clip(x0 + 1, 0, w - 1)
    rows = np.arange(h)[:, None]
    resampled = ((1 - f)[..., None] * s.trg_image[rows, x0c]
                 + f[..., None] * s.trg_image[rows, x1c])
    valid = (xs >= 0) & (xs <= w - 1)
    err = np.abs(resampled - s.src_image).mean(-1)
    # exclude pixels near depth edges (disocclusions)
    d = s.gt_visible_disparity
    edge = np.abs(np.diff(d, axis=1, prepend=d[:, :1])) > 1e-3
    for k in range(1, 6):
        edge |= np.roll(edge, k, axis=1) | np.roll(edge, -k, axis=1)
    keep = valid & ~edge
    assert keep.mean() > 0.5
    assert err[keep].mean() < 0.02


def test_scene_determinism():
    a = list(synthetic.generate(7, 16, 24, 2))
    b = list(synthetic.generate(7, 16, 24, 2))
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x.src_image, y.src_image)
        np.testing.assert_array_equal(x.pose_src2trg, y.pose_src2trg)


def test_pipeline_batches_and_prefetch():
    cfg = DataConfig(dataset="synthetic", height=16, width=24, batch_size=4,
                     prefetch=2)
    it = make_dataset(cfg, seed=0)
    b1 = next(it)
    b2 = next(it)
    assert b1.src_image.shape == (4, 16, 24, 3)
    assert b1.intrinsics.shape == (4, 3, 3)
    assert b1.pose_src2trg.shape == (4, 4, 4)
    assert b1.gt_disparity.shape == (4, 16, 24, 1)
    assert not np.array_equal(np.asarray(b1.src_image),
                              np.asarray(b2.src_image))


def test_pipeline_sharded_layout():
    """Batch lands sharded over the mesh data axis: 8-way on the virtual
    CPU mesh (conftest), 1-way on a single real chip — each device holds
    batch/num_devices samples either way."""
    from lsi_tpu.parallel.mesh import make_mesh_plan
    plan = make_mesh_plan()
    n = plan.num_devices
    cfg = DataConfig(dataset="synthetic", height=16, width=24, batch_size=8)
    it = make_dataset(cfg, seed=0, sharding=plan.batch_sharding())
    b = next(it)
    assert len(b.src_image.sharding.device_set) == n
    shard = b.src_image.addressable_shards[0]
    assert shard.data.shape == (8 // n, 16, 24, 3)


def test_pipeline_stream_deterministic():
    """Per-index seeding: the stream is a pure function of the seed."""
    base = dict(dataset="synthetic", height=16, width=24, batch_size=4)
    b1 = next(make_dataset(DataConfig(**base), seed=5))
    b2 = next(make_dataset(DataConfig(**base), seed=5))
    np.testing.assert_array_equal(np.asarray(b1.src_image),
                                  np.asarray(b2.src_image))
    np.testing.assert_array_equal(np.asarray(b1.pose_src2trg),
                                  np.asarray(b2.pose_src2trg))


def test_prefetcher_propagates_worker_errors():
    """A bad dataset root must raise promptly in the consumer, not hang."""
    import pytest

    cfg = DataConfig(dataset="kitti", root="/nonexistent_kitti_root",
                     height=8, width=8, batch_size=1)
    it = make_dataset(cfg, seed=0)
    with pytest.raises(FileNotFoundError):
        next(it)
    # terminal state stays re-raisable on subsequent calls (never blocks)
    with pytest.raises(FileNotFoundError):
        next(it)


def test_split_records_group_level():
    from lsi_tpu.data.splits import split_records

    recs = [{"g": f"g{i // 10}", "i": i} for i in range(100)]  # 10 groups
    key = lambda r: r["g"]  # noqa: E731
    train = split_records(recs, key, "train", 0.1)
    val = split_records(recs, key, "val", 0.1)
    # disjoint at the group level, jointly exhaustive
    assert {r["i"] for r in train} | {r["i"] for r in val} == set(range(100))
    assert not ({key(r) for r in train} & {key(r) for r in val})
    assert len({key(r) for r in val}) == 1
    assert split_records(recs, key, "all", 0.1) == recs
    # deterministic
    assert split_records(recs, key, "val", 0.1) == val


def test_synthetic_val_split_disjoint():
    tr = next(make_dataset(DataConfig(
        dataset="synthetic", height=16, width=24, batch_size=2,
        split="train"), seed=0))
    va = next(make_dataset(DataConfig(
        dataset="synthetic", height=16, width=24, batch_size=2,
        split="val"), seed=0))
    diff = np.abs(np.asarray(tr.src_image) - np.asarray(va.src_image)).max()
    assert diff > 1e-3  # val scenes come from a disjoint seed range


def test_multi_scene_photometric_consistency(rng):
    """Multi-object scenes under SE(3) jitter: an LDI built from the GT
    visible surface must inverse-warp-match the target image away from
    disocclusions — an independent cross-check of the analytic renderer
    against the geometry core (rotation included)."""
    import jax.numpy as jnp

    from lsi_tpu.geometry.ldi import LDI, gather_target_per_layer

    s = synthetic.make_scene_multi(rng, 48, 96, max_rotation=0.01)
    ldi = LDI(
        textures=jnp.asarray(s.src_image)[None, None],
        disparities=jnp.asarray(s.gt_visible_disparity)[None, None, ..., None],
        intrinsics=jnp.asarray(s.intrinsics)[None])
    sampled, valid, _ = gather_target_per_layer(
        ldi, jnp.asarray(s.trg_image)[None], jnp.asarray(s.pose_src2trg)[None])
    err = np.abs(np.asarray(sampled[0, 0]) - s.src_image).mean(-1)
    v = np.asarray(valid[0, 0, ..., 0]) > 0.5

    # exclude pixels near depth edges (occlusion/disocclusion bands)
    d = s.gt_visible_disparity
    edge = (np.abs(np.diff(d, axis=1, prepend=d[:, :1])) > 1e-3) | \
           (np.abs(np.diff(d, axis=0, prepend=d[:1])) > 1e-3)
    for k in range(1, 5):
        edge |= np.roll(edge, k, 1) | np.roll(edge, -k, 1)
        edge |= np.roll(edge, k, 0) | np.roll(edge, -k, 0)
    keep = v & ~edge
    assert keep.mean() > 0.3
    assert err[keep].mean() < 0.03


def test_multi_scene_structure(rng):
    s = synthetic.make_scene_multi(rng, 32, 64, num_boxes=3)
    # >= 3 distinct visible disparities (boxes + slanted bg continuum)
    assert len(np.unique(np.round(s.gt_visible_disparity, 3))) >= 3
    assert s.gt_disparity_layers.shape == (2, 32, 64)
    # second-surface layer is >= the visible layer in depth (<= in disp)
    l0, l1 = s.gt_disparity_layers
    hit2 = l1 > 0
    assert (l1[hit2] <= l0[hit2] + 1e-6).all()
    # the pose has rotation
    assert np.abs(s.pose_src2trg[:3, :3] - np.eye(3)).max() > 1e-5


def test_multi_scene_determinism():
    a = list(synthetic.generate_multi(11, 16, 24, 2))
    b = list(synthetic.generate_multi(11, 16, 24, 2))
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x.src_image, y.src_image)
        np.testing.assert_array_equal(x.pose_src2trg, y.pose_src2trg)


def test_multi_scene_pipeline():
    cfg = DataConfig(dataset="synthetic", synthetic_scene="multi",
                     height=16, width=24, batch_size=2)
    b = next(make_dataset(cfg, seed=0))
    assert b.src_image.shape == (2, 16, 24, 3)
    assert b.trg_gt_disparity.shape == (2, 16, 24, 1)
