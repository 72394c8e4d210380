"""Train-step + overfit integration tests on the virtual 8-device mesh."""

import dataclasses
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lsi_tpu.config import (Config, DataConfig, LossConfig, ModelConfig,
                            RenderConfig, TrainConfig)
from lsi_tpu.data.pipeline import make_dataset
from lsi_tpu.parallel.mesh import make_mesh_plan
from lsi_tpu.train.trainer import create_state, make_train_step


def tiny_config(tmpdir="/tmp/lsi_test_ckpt", photo_mode="inverse_warp"):
    return Config(
        model=ModelConfig(num_layers=2, base_filters=8, num_scales=3,
                          compute_dtype="float32"),
        render=RenderConfig(zbuffer_scale=30.0),
        loss=LossConfig(photo_mode=photo_mode, smoothness_weight=0.01),
        data=DataConfig(dataset="synthetic", height=32, width=64,
                        batch_size=8, prefetch=1),
        train=TrainConfig(learning_rate=1e-3, warmup_steps=10,
                          max_steps=100, checkpoint_dir=tmpdir,
                          log_every=10, checkpoint_every=1000),
    )


def test_train_step_runs_and_decreases_loss():
    cfg = tiny_config()
    plan = make_mesh_plan()
    step_fn = make_train_step(cfg, plan)
    state = plan.replicate(create_state(cfg, jax.random.key(0)))
    it = make_dataset(cfg.data, seed=0, sharding=plan.batch_sharding())
    batch = next(it)

    losses = []
    for i in range(60):
        state, metrics = step_fn(state, batch)  # overfit one batch
        losses.append(float(metrics["total"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.7, losses[::10]


@pytest.mark.parametrize("photo_mode", ["splat", "both"])
def test_train_step_other_loss_modes(photo_mode):
    cfg = tiny_config(photo_mode=photo_mode)
    plan = make_mesh_plan()
    step_fn = make_train_step(cfg, plan)
    state = plan.replicate(create_state(cfg, jax.random.key(0)))
    it = make_dataset(cfg.data, seed=0, sharding=plan.batch_sharding())
    batch = next(it)
    state, metrics = step_fn(state, batch)
    assert np.isfinite(float(metrics["total"]))


def test_train_step_multi_object_scene():
    """The multi-object family (boxes + slanted bg + SE(3) jitter) trains:
    one-batch overfit decreases loss through both photometric paths."""
    cfg = tiny_config(photo_mode="both")
    cfg = cfg.replace(data=DataConfig(
        dataset="synthetic", synthetic_scene="multi", height=32, width=64,
        batch_size=8, prefetch=1))
    plan = make_mesh_plan()
    step_fn = make_train_step(cfg, plan)
    state = plan.replicate(create_state(cfg, jax.random.key(0)))
    it = make_dataset(cfg.data, seed=0, sharding=plan.batch_sharding())
    batch = next(it)
    losses = []
    for _ in range(60):
        state, metrics = step_fn(state, batch)
        losses.append(float(metrics["total"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.7, losses[::10]


def test_sharded_equals_single_device():
    """DP over 8 devices must produce the same update as 1 device."""
    cfg = tiny_config()
    plan = make_mesh_plan()
    plan1 = make_mesh_plan(devices=jax.devices()[:1])

    state8 = plan.replicate(create_state(cfg, jax.random.key(0)))
    state1 = plan1.replicate(create_state(cfg, jax.random.key(0)))

    it = make_dataset(cfg.data, seed=0)
    batch = next(it)  # unsharded host batch

    step8 = make_train_step(cfg, plan)
    step1 = make_train_step(cfg, plan1)
    s8, m8 = step8(state8, plan.shard_batch(batch))
    s1, m1 = step1(state1, plan1.shard_batch(batch))

    np.testing.assert_allclose(float(m8["total"]), float(m1["total"]),
                               rtol=1e-5)
    l8 = jax.tree.leaves(s8.params)
    l1 = jax.tree.leaves(s1.params)
    for a, b in zip(l8, l1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def test_gt_depth_supervision_mode():
    cfg = tiny_config()
    cfg = Config(model=cfg.model, render=cfg.render,
                 loss=LossConfig(photo_mode="inverse_warp",
                                 depth_supervision_weight=0.5),
                 data=cfg.data, train=cfg.train)
    plan = make_mesh_plan()
    step_fn = make_train_step(cfg, plan)
    state = plan.replicate(create_state(cfg, jax.random.key(0)))
    it = make_dataset(cfg.data, seed=0, sharding=plan.batch_sharding())
    state, metrics = step_fn(state, next(it))
    assert "depth_supervision" in metrics
    assert np.isfinite(float(metrics["depth_supervision"]))


def test_checkpoint_roundtrip(tmp_path):
    from lsi_tpu.train.checkpoint import (CheckpointManager,
                                          export_params_npz,
                                          import_params_npz)
    cfg = tiny_config()
    state = create_state(cfg, jax.random.key(0))
    mgr = CheckpointManager(str(tmp_path / "ckpt"), max_to_keep=2)
    mgr.save(5, jax.device_get(state))
    mgr.wait()
    assert mgr.latest_step() == 5

    fresh = create_state(cfg, jax.random.key(1))
    restored = mgr.restore(jax.device_get(fresh))
    a = jax.tree.leaves(restored.params)
    b = jax.tree.leaves(state.params)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    mgr.close()

    # numpy export/import
    path = str(tmp_path / "params.npz")
    export_params_npz(state.params, path)
    again = import_params_npz(fresh.params, path)
    for x, y in zip(jax.tree.leaves(again), b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_nonfinite_update_skipped(rng):
    """optax.apply_if_finite containment: a poisoned batch must leave the
    params untouched (finite), not write NaN into the state (r3: the
    sym_occ sweep arm was killed by exactly one such step)."""
    import jax
    import jax.numpy as jnp

    from lsi_tpu.config import (Config, DataConfig, LossConfig, ModelConfig,
                                RenderConfig, TrainConfig)
    from lsi_tpu.data.pipeline import Batch, make_dataset
    from lsi_tpu.train.trainer import create_state, make_train_step

    cfg = Config(
        model=ModelConfig(num_layers=2, base_filters=4, num_scales=2),
        render=RenderConfig(use_pallas="off"),
        loss=LossConfig(photo_mode="both"),
        data=DataConfig(dataset="synthetic", height=16, width=32,
                        batch_size=4),
        train=TrainConfig(warmup_steps=0, max_steps=10),
    )
    state = create_state(cfg, jax.random.key(0))
    step = make_train_step(cfg)
    good = next(make_dataset(cfg.data, seed=0))
    state, _ = step(state, good)  # one clean step so lr > 0
    before = jax.device_get(state.params)

    bad = Batch(
        src_image=jnp.full_like(good.src_image, jnp.nan),
        trg_image=good.trg_image,
        intrinsics=good.intrinsics,
        pose_src2trg=good.pose_src2trg,
        gt_disparity=good.gt_disparity,
        gt_valid=good.gt_valid,
        trg_gt_disparity=good.trg_gt_disparity,
        trg_gt_valid=good.trg_gt_valid,
    )
    state2, metrics = step(state, bad)
    after = jax.device_get(state2.params)
    for a, b in zip(jax.tree_util.tree_leaves(before),
                    jax.tree_util.tree_leaves(after)):
        np.testing.assert_array_equal(a, b)
    assert np.isfinite(
        np.asarray(jax.tree_util.tree_leaves(after)[0])).all()

    # ... and a clean step afterwards still trains
    state3, m3 = step(state2, good)
    assert np.isfinite(float(m3["total"]))


def test_lr_schedule_stable_across_segments():
    """Segmented runs (scripts/train_chunked.py) clamp train.max_steps to
    each segment end; with train.decay_steps pinned to the true total the
    cosine schedule must be identical in every segment (no LR sawtooth on
    resume)."""
    from lsi_tpu.train.trainer import make_lr_schedule

    full = Config(train=TrainConfig(learning_rate=5e-4, warmup_steps=50,
                                    max_steps=8000))
    seg1 = Config(train=TrainConfig(learning_rate=5e-4, warmup_steps=50,
                                    max_steps=2000, decay_steps=8000))
    s_full, s_seg = make_lr_schedule(full), make_lr_schedule(seg1)
    for step in [0, 50, 1000, 1999, 2000, 5000, 7999]:
        np.testing.assert_allclose(s_seg(step), s_full(step), rtol=1e-6)
    # And the regression the field exists to prevent: a clamped max_steps
    # WITHOUT the pin produces a different (fully-decayed) LR at the
    # segment boundary.
    clamped = Config(train=TrainConfig(learning_rate=5e-4, warmup_steps=50,
                                       max_steps=2000))
    assert abs(float(make_lr_schedule(clamped)(1999)) -
               float(s_full(1999))) > 1e-5


def test_restore_raw_tolerates_extra_state_fields(tmp_path):
    """Eval must be able to read a checkpoint whose train state carries
    fields its own config would not create (e.g. ema_params from a
    loss.consistency_ema_teacher run): CheckpointManager.restore_raw
    restores the saved tree with its OWN structure, no template."""
    from lsi_tpu.train.checkpoint import CheckpointManager

    cfg = tiny_config()
    cfg = cfg.replace(loss=dataclasses.replace(
        cfg.loss, consistency_ema_teacher=True, consistency_weight=0.5,
        consistency_stop_target=True, symmetric=True))
    state = create_state(cfg, jax.random.key(0))
    assert state.ema_params is not None
    mgr = CheckpointManager(str(tmp_path / "ckpt"), max_to_keep=1)
    mgr.save(3, jax.device_get(state))
    mgr.wait()

    raw = mgr.restore_raw()
    assert raw is not None and mgr.latest_step() == 3
    assert int(raw["step"]) == int(state.step)
    assert "ema_params" in raw
    for x, y in zip(jax.tree.leaves(raw["params"]),
                    jax.tree.leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    # A teacherless template would fail the strict structure match — the
    # exact failure restore_raw exists to avoid.
    teacherless = create_state(tiny_config(), jax.random.key(1))
    with pytest.raises(Exception):
        mgr.restore(jax.device_get(teacherless))
    mgr.close()

    empty = CheckpointManager(str(tmp_path / "none"), max_to_keep=1)
    assert empty.restore_raw() is None
    empty.close()


def test_lr_end_factor():
    from lsi_tpu.train.trainer import make_lr_schedule

    cfg = Config(train=TrainConfig(learning_rate=4e-4, warmup_steps=10,
                                   max_steps=1000, lr_end_factor=0.005))
    assert abs(float(make_lr_schedule(cfg)(1000)) - 4e-4 * 0.005) < 1e-9


# --- Late layer-0 freeze (train.freeze_layer0_step) -------------------------

def test_freeze_layer0_mask_zeroes_exactly_the_layer0_entries():
    """The grad/update mask freezes the trunk + layer-0 head channels and
    nothing else (predicted-texture model: tex channels 0-2 are layer 0)."""
    from lsi_tpu.models.ldi_predictor import freeze_layer0_grad_mask
    from lsi_tpu.train.trainer import build_model

    mcfg = ModelConfig(num_layers=3, base_filters=8, num_scales=3,
                       layer0_texture_from_input=False,
                       compute_dtype="float32")
    model = build_model(mcfg)
    params = model.init(jax.random.key(0), jnp.zeros((1, 32, 64, 3)),
                        jnp.broadcast_to(jnp.eye(3), (1, 3, 3)))["params"]
    ones = jax.tree_util.tree_map(jnp.ones_like, params)
    masked = freeze_layer0_grad_mask(mcfg, ones)

    trunk = [k for k in masked if k.startswith("UNet")]
    assert trunk, list(masked)
    for g in jax.tree_util.tree_leaves({k: masked[k] for k in trunk}):
        assert float(jnp.abs(g).max()) == 0.0
    dk, db = masked["disp_head"]["kernel"], masked["disp_head"]["bias"]
    assert float(jnp.abs(dk[..., 0]).max()) == 0.0 and float(db[0]) == 0.0
    assert float(dk[..., 1:].min()) == 1.0 and float(db[1:].min()) == 1.0
    tk, tb = masked["tex_head"]["kernel"], masked["tex_head"]["bias"]
    assert float(jnp.abs(tk[..., :3]).max()) == 0.0
    assert float(jnp.abs(tb[:3]).max()) == 0.0
    assert float(tk[..., 3:].min()) == 1.0 and float(tb[3:].min()) == 1.0


def test_freeze_layer0_mask_passthrough_texture_keeps_tex_head_live():
    from lsi_tpu.models.ldi_predictor import freeze_layer0_grad_mask
    from lsi_tpu.train.trainer import build_model

    mcfg = ModelConfig(num_layers=2, base_filters=8, num_scales=3,
                       compute_dtype="float32")  # passthrough layer-0 RGB
    model = build_model(mcfg)
    params = model.init(jax.random.key(0), jnp.zeros((1, 32, 64, 3)),
                        jnp.broadcast_to(jnp.eye(3), (1, 3, 3)))["params"]
    ones = jax.tree_util.tree_map(jnp.ones_like, params)
    masked = freeze_layer0_grad_mask(mcfg, ones)
    # tex_head serves deep layers only here: fully live.
    assert float(jnp.min(masked["tex_head"]["kernel"])) == 1.0


def test_freeze_layer0_step_pins_layer0_bitwise():
    """After the freeze switch, layer-0 disparity is BITWISE constant while
    deep layers keep training — including through Adam's momentum tail from
    the pre-freeze steps (the reason updates are masked, not just grads)."""
    from lsi_tpu.train.trainer import build_model

    cfg = tiny_config()
    normal_fn = make_train_step(cfg)
    freeze_fn = make_train_step(cfg, freeze_layer0=True)
    state = create_state(cfg, jax.random.key(0))
    it = make_dataset(cfg.data, seed=0)
    for _ in range(3):  # build up nonzero Adam moments first
        state, _ = normal_fn(state, next(it))

    model = build_model(cfg.model)
    img = jnp.asarray(np.random.RandomState(0).rand(1, 32, 64, 3),
                      jnp.float32)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (1, 3, 3))
    before = model.apply({"params": state.params}, img, eye)
    for _ in range(5):
        state, metrics = freeze_fn(state, next(it))
    assert np.isfinite(float(metrics["total"]))
    after = model.apply({"params": state.params}, img, eye)

    np.testing.assert_array_equal(np.asarray(before.disparities[:, 0]),
                                  np.asarray(after.disparities[:, 0]))
    assert not np.array_equal(np.asarray(before.disparities[:, 1]),
                              np.asarray(after.disparities[:, 1]))


def test_trainer_freeze_phase_switch(tmp_path):
    """Trainer selects the freeze step from freeze_layer0_step on: the trunk
    is bitwise identical across the frozen leg of a resumed run."""
    from lsi_tpu.train.trainer import Trainer

    cfg = tiny_config(str(tmp_path))
    cfg = cfg.replace(train=dataclasses.replace(
        cfg.train, max_steps=6, freeze_layer0_step=3, checkpoint_every=3,
        log_every=2, eval_every=0))
    t = Trainer(cfg)
    assert t._freeze_step_fn is not None
    state3, _ = t.train(max_steps=3)
    trunk3 = jax.device_get({k: v for k, v in state3.params.items()
                             if k.startswith("UNet")})
    state6, _ = t.train()  # resumes from the step-3 checkpoint
    assert int(state6.step) == 6
    trunk6 = jax.device_get({k: v for k, v in state6.params.items()
                             if k.startswith("UNet")})
    for a, b in zip(jax.tree_util.tree_leaves(trunk3),
                    jax.tree_util.tree_leaves(trunk6)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # deep disparity channel kept training
    d3 = np.asarray(state3.params["disp_head"]["kernel"])[..., 1]
    d6 = np.asarray(state6.params["disp_head"]["kernel"])[..., 1]
    assert not np.array_equal(d3, d6)


def test_trainer_freeze_phase_validation(tmp_path):
    from lsi_tpu.train.trainer import Trainer

    cfg = tiny_config(str(tmp_path))
    mpi = cfg.replace(
        model=ModelConfig(family="mpi", num_planes=4, base_filters=8,
                          num_scales=3),
        train=dataclasses.replace(cfg.train, freeze_layer0_step=10))
    with pytest.raises(ValueError, match="LDI-family"):
        Trainer(mpi)
    bad_order = cfg.replace(
        loss=dataclasses.replace(cfg.loss, consistency_weight=0.5,
                                 consistency_stop_step=50),
        train=dataclasses.replace(cfg.train, freeze_layer0_step=10))
    with pytest.raises(ValueError, match="LAST phase"):
        Trainer(bad_order)


def test_splice_layer0_params_partition():
    """splice_layer0_params takes exactly the freeze partition from `best`:
    the whole UNet trunk, disp_head channel 0, tex_head channels 0-2 (when
    layer-0 texture is predicted) — everything else keeps the live values.
    Mirrors freeze_layer0_grad_mask (shared _layer0_owned_channels)."""
    import jax

    from lsi_tpu.models.ldi_predictor import (freeze_layer0_grad_mask,
                                              splice_layer0_params)

    cfg = tiny_config().model
    cfg = dataclasses.replace(cfg, layer0_texture_from_input=False)
    live = create_state(tiny_config().replace(model=cfg),
                        jax.random.key(0)).params
    best = jax.tree_util.tree_map(lambda x: x + 1.0, live)
    spliced = splice_layer0_params(cfg, live, best)

    for k in spliced:
        if k.startswith("UNet"):
            for a, b in zip(jax.tree_util.tree_leaves(spliced[k]),
                            jax.tree_util.tree_leaves(best[k])):
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    d_s = np.asarray(spliced["disp_head"]["kernel"])
    d_l = np.asarray(live["disp_head"]["kernel"])
    d_b = np.asarray(best["disp_head"]["kernel"])
    np.testing.assert_array_equal(d_s[..., :1], d_b[..., :1])
    np.testing.assert_array_equal(d_s[..., 1:], d_l[..., 1:])
    t_s = np.asarray(spliced["tex_head"]["kernel"])
    np.testing.assert_array_equal(
        t_s[..., :3], np.asarray(best["tex_head"]["kernel"])[..., :3])
    np.testing.assert_array_equal(
        t_s[..., 3:], np.asarray(live["tex_head"]["kernel"])[..., 3:])

    # the splice and the mask agree on the partition: entries the mask
    # zeroes are exactly the entries the splice replaced
    mask = freeze_layer0_grad_mask(cfg, jax.tree_util.tree_map(
        jnp.ones_like, live))
    changed = jax.tree_util.tree_map(
        lambda s, l: (np.asarray(s) != np.asarray(l)).astype(np.float32),
        spliced, live)
    for m, c in zip(jax.tree_util.tree_leaves(mask),
                    jax.tree_util.tree_leaves(changed)):
        # mask==0 <=> frozen <=> taken from best (best = live+1 everywhere,
        # so "changed" marks the replaced entries exactly)
        np.testing.assert_array_equal(1.0 - np.asarray(m), c)
