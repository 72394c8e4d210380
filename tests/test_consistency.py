"""Round-3 quality machinery: cross-view depth consistency, per-layer
smoothness edge gating, ordering-ratio cap, staged layer-0 training.

These are the levers VERDICT r2 prescribed against the two measured quality
weaknesses: layer-0 depth drifting while PSNR improves (depth-consistency
term, SURVEY.md §2 Losses row) and disoccluded-region depth (~abs_rel 3.4:
hidden-layer smoothness gating, ordering cap, staged training).
"""

import jax
import jax.numpy as jnp
import numpy as np

from lsi_tpu.config import (Config, DataConfig, LossConfig, ModelConfig,
                            RenderConfig, TrainConfig)
from lsi_tpu.geometry import transforms
from lsi_tpu.geometry.ldi import LDI
from lsi_tpu.losses.losses import (depth_consistency, disparity_smoothness,
                                   total_loss_bidirectional)


def make_K(w=32, h=16):
    return np.array([[0.9 * w, 0, (w - 1) / 2], [0, 0.9 * w, (h - 1) / 2],
                     [0, 0, 1]], np.float32)


def flat_ldi(rng, h=16, w=32, l=2, d=0.5):
    tex = rng.uniform(size=(1, l, h, w, 3)).astype(np.float32)
    disp = np.stack([np.full((1, h, w, 1), d / (i + 1), np.float32)
                     for i in range(l)], axis=1)
    return LDI(textures=jnp.asarray(tex), disparities=jnp.asarray(disp),
               intrinsics=jnp.asarray(make_K(w, h)[None]))


# ---------------------------------------------------------------- consistency

def test_depth_consistency_zero_when_consistent(rng):
    """Fronto-parallel plane, pure x-translation: the plane has the same
    depth in both frames, so two flat predictions at the true disparity are
    perfectly consistent (loss at the charbonnier eps floor)."""
    ldi_src = flat_ldi(rng, l=1, d=0.5)
    ldi_trg = flat_ldi(rng, l=1, d=0.5)
    pose = transforms.translation_pose(np.array([[-0.1, 0, 0]], np.float32))
    loss = depth_consistency(ldi_src, ldi_trg, pose, RenderConfig())
    assert float(loss) < 2e-4


def test_depth_consistency_detects_disagreement(rng):
    ldi_src = flat_ldi(rng, l=1, d=0.5)
    ldi_trg = flat_ldi(rng, l=1, d=0.8)
    pose = transforms.translation_pose(np.array([[-0.1, 0, 0]], np.float32))
    loss = depth_consistency(ldi_src, ldi_trg, pose, RenderConfig())
    assert float(loss) > 0.2  # |0.8 - 0.5| charbonnier


def test_depth_consistency_differentiable_both_sides(rng):
    ldi_src = flat_ldi(rng, l=2, d=0.5)
    ldi_trg = flat_ldi(rng, l=2, d=0.6)
    pose = transforms.translation_pose(np.array([[-0.1, 0, 0]], np.float32))

    def f(ds, dt):
        a = LDI(textures=ldi_src.textures, disparities=ds,
                intrinsics=ldi_src.intrinsics)
        b = LDI(textures=ldi_trg.textures, disparities=dt,
                intrinsics=ldi_trg.intrinsics)
        return depth_consistency(a, b, pose, RenderConfig())

    gs, gt = jax.grad(f, argnums=(0, 1))(ldi_src.disparities,
                                         ldi_trg.disparities)
    assert np.isfinite(np.asarray(gs)).all()
    assert np.isfinite(np.asarray(gt)).all()
    # Both predictions must receive signal (the term ties them together).
    assert float(jnp.max(jnp.abs(gs))) > 0
    assert float(jnp.max(jnp.abs(gt))) > 0


def test_total_loss_bidirectional_assembles(rng):
    ldi_src = flat_ldi(rng)
    ldi_trg = flat_ldi(rng)
    src = jnp.asarray(rng.uniform(size=(1, 16, 32, 3)), jnp.float32)
    trg = jnp.asarray(rng.uniform(size=(1, 16, 32, 3)), jnp.float32)
    pose = transforms.translation_pose(np.array([[-0.05, 0, 0]], np.float32))
    cfg = LossConfig(photo_mode="both", consistency_weight=0.5,
                     symmetric=True)
    parts = total_loss_bidirectional(ldi_src, ldi_trg, src, trg, pose,
                                     cfg, RenderConfig())
    assert {"photo_inverse_warp", "photo_splat", "photo_inverse_warp_rev",
            "photo_splat_rev", "depth_consistency", "total"} <= set(parts)
    # total really sums the mirrored and consistency parts
    summed = sum(v for k, v in parts.items()
                 if k not in ("total", "window_dropped_frac",
                              "window_dropped_frac_rev"))
    np.testing.assert_allclose(float(parts["total"]), float(summed),
                               rtol=1e-6)
    assert np.isfinite(float(parts["total"]))


def test_consistency_anchors_drifted_layer0(rng):
    """The mechanism claim behind the term: given a photometrically-plausible
    but geometrically-drifted source layer-0, the consistency loss against a
    correct target prediction is larger than against the true geometry —
    i.e. the term's gradient pushes the drifted prediction back."""
    true = flat_ldi(rng, l=1, d=0.5)
    drifted = LDI(textures=true.textures,
                  disparities=true.disparities * 1.4,
                  intrinsics=true.intrinsics)
    trg_pred = flat_ldi(rng, l=1, d=0.5)
    pose = transforms.translation_pose(np.array([[-0.1, 0, 0]], np.float32))
    l_true = float(depth_consistency(true, trg_pred, pose, RenderConfig()))
    l_drift = float(depth_consistency(drifted, trg_pred, pose,
                                      RenderConfig()))
    assert l_drift > l_true + 0.1


# ------------------------------------------------------- smoothness gating

def test_hidden_layer_smoothness_not_gated_by_visible_edges(rng):
    """A deep-layer disparity cliff aligned with a visible-image edge is
    forgiven by the fully-gated penalty but NOT by edge_gate_deep=False
    (hidden surfaces must stay smooth across occluder boundaries)."""
    h, w = 16, 32
    # layer-0 texture: hard vertical edge at w//2
    tex0 = np.zeros((1, h, w, 3), np.float32)
    tex0[:, :, w // 2:] = 1.0
    tex = np.stack([tex0[0], rng.uniform(size=(h, w, 3)).astype(np.float32)],
                   axis=0)[None]
    # layer-0 flat; deep layer has a disparity cliff at the same column
    d0 = np.full((h, w, 1), 0.5, np.float32)
    d1 = np.full((h, w, 1), 0.25, np.float32)
    d1[:, w // 2:] = 0.1
    disp = np.stack([d0, d1], axis=0)[None]
    ldi = LDI(textures=jnp.asarray(tex), disparities=jnp.asarray(disp),
              intrinsics=jnp.asarray(make_K(w, h)[None]))

    gated = float(disparity_smoothness(ldi, edge_aware=True,
                                       edge_gate_deep=True))
    ungated_deep = float(disparity_smoothness(ldi, edge_aware=True,
                                              edge_gate_deep=False))
    assert ungated_deep > gated * 5.0

    # single-layer LDI: the flag is a no-op
    one = LDI(textures=ldi.textures[:, :1], disparities=ldi.disparities[:, :1],
              intrinsics=ldi.intrinsics)
    np.testing.assert_allclose(
        float(disparity_smoothness(one, True, True)),
        float(disparity_smoothness(one, True, False)))


# ------------------------------------------------------------ ordering cap

def test_ordering_cap_enforces_strict_separation(rng):
    from lsi_tpu.models.ldi_predictor import LDIPredictor

    cfg = ModelConfig(num_layers=3, base_filters=4, num_scales=2,
                      ordering_floor=0.2, ordering_cap=0.9)
    model = LDIPredictor(cfg)
    img = jnp.asarray(rng.uniform(size=(1, 16, 32, 3)), jnp.float32)
    K = jnp.asarray(make_K()[None])
    params = model.init(jax.random.key(0), img, K)["params"]
    ldi = model.apply({"params": params}, img, K)
    d = np.asarray(ldi.disparities)[..., 0]  # (1, 3, H, W)
    assert (d[:, 1] <= 0.9 * d[:, 0] + 1e-6).all()
    assert (d[:, 2] <= 0.9 * d[:, 1] + 1e-6).all()
    assert (d[:, 1] >= 0.2 * d[:, 0] - 1e-6).all()


# ------------------------------------------------- trainer integration

def _tiny_cfg(**loss_kw):
    return Config(
        model=ModelConfig(num_layers=2, base_filters=4, num_scales=2,
                          layer0_texture_from_input=False),
        render=RenderConfig(use_pallas="off"),
        loss=LossConfig(photo_mode="both", **loss_kw),
        data=DataConfig(dataset="synthetic", height=16, width=32,
                        batch_size=8, synthetic_scene="two_plane"),
        train=TrainConfig(max_steps=2, warmup_steps=1, log_every=1,
                          checkpoint_every=1000),
    )


def test_fused_pair_forward_matches_two_applies(rng):
    """The stacked (src+trg on batch) forward the two-prediction recipes use
    is math-identical to two separate applies: the UNet is per-sample
    (convs + GroupNorm normalize within each sample)."""
    from lsi_tpu.data.pipeline import decode_batch, make_dataset
    from lsi_tpu.train.trainer import build_model, create_state

    cfg = _tiny_cfg(consistency_weight=0.5, symmetric=True)
    state = create_state(cfg, jax.random.key(0))
    model = build_model(cfg.model)
    batch = decode_batch(next(make_dataset(cfg.data, seed=0)))

    sep_src = model.apply({"params": state.params}, batch.src_image,
                          batch.intrinsics)
    sep_trg = model.apply({"params": state.params}, batch.trg_image,
                          batch.intrinsics)
    b = batch.src_image.shape[0]
    both = model.apply(
        {"params": state.params},
        jnp.concatenate([batch.src_image, batch.trg_image], axis=0),
        jnp.concatenate([batch.intrinsics, batch.intrinsics], axis=0))
    np.testing.assert_allclose(np.asarray(both.disparities[:b]),
                               np.asarray(sep_src.disparities),
                               rtol=2e-2, atol=2e-3)
    np.testing.assert_allclose(np.asarray(both.disparities[b:]),
                               np.asarray(sep_trg.disparities),
                               rtol=2e-2, atol=2e-3)
    np.testing.assert_allclose(np.asarray(both.textures[:b]),
                               np.asarray(sep_src.textures),
                               rtol=2e-2, atol=2e-3)


def test_train_step_with_consistency_and_symmetric(rng):
    from lsi_tpu.data.pipeline import make_dataset
    from lsi_tpu.train.trainer import create_state, make_train_step

    cfg = _tiny_cfg(consistency_weight=0.5, symmetric=True)
    state = create_state(cfg, jax.random.key(0))
    step = make_train_step(cfg)
    batch = next(make_dataset(cfg.data, seed=0))
    state, metrics = step(state, batch)
    assert "depth_consistency" in metrics
    assert "photo_splat_rev" in metrics
    assert np.isfinite(float(metrics["total"]))
    assert float(metrics["grad_norm"]) > 0


def test_staged_layer0_training_switches(rng, tmp_path):
    """Stage A (layer-0-only loss) leaves the deep-texture head untouched;
    after the stage the full loss trains it."""
    from lsi_tpu.data.pipeline import make_dataset
    from lsi_tpu.train.trainer import create_state, make_train_step

    cfg = _tiny_cfg()
    state = create_state(cfg, jax.random.key(0))
    staged = make_train_step(cfg, stage_layer0=True)
    full = make_train_step(cfg)
    batch = next(make_dataset(cfg.data, seed=0))

    # Gradient structure: the staged loss must produce ZERO gradient on the
    # deep (channel >= 3) slices of the texture head kernel, the full loss a
    # non-zero one. (disp head channel 0 feeds layer 0 so it trains either
    # way.)
    import optax  # noqa: F401

    tex_kernel_before = np.asarray(state.params["tex_head"]["kernel"])
    # two staged steps: the first runs at warmup lr=0, the second at lr>0
    state1, m1 = staged(state, batch)
    state1, m1 = staged(state1, batch)
    tex_kernel_staged = np.asarray(state1.params["tex_head"]["kernel"])
    # deep-layer texture channels (3:6) unchanged by the staged step
    np.testing.assert_allclose(tex_kernel_staged[..., 3:6],
                               tex_kernel_before[..., 3:6])
    # layer-0 texture channels did move
    assert np.abs(tex_kernel_staged[..., :3]
                  - tex_kernel_before[..., :3]).max() > 0

    state2, m2 = full(state1, batch)
    tex_kernel_full = np.asarray(state2.params["tex_head"]["kernel"])
    assert np.abs(tex_kernel_full[..., 3:6]
                  - tex_kernel_staged[..., 3:6]).max() > 0
    assert np.isfinite(float(m1["total"]))
    assert np.isfinite(float(m2["total"]))


def test_trainer_runs_staged_schedule(tmp_path):
    from lsi_tpu.train.trainer import Trainer

    cfg = _tiny_cfg()
    cfg = cfg.replace(train=TrainConfig(
        max_steps=4, warmup_steps=1, log_every=2, checkpoint_every=1000,
        stage_layer0_steps=2, checkpoint_dir=str(tmp_path / "ckpt")))
    state, metrics = Trainer(cfg).train()
    assert np.isfinite(metrics["total"])


def test_depth_consistency_stop_target_blocks_target_grad(rng):
    """stop_target: no gradient reaches the pseudo-label side (the
    anti-collusion design from the r3 sweep)."""
    ldi_src = flat_ldi(rng, l=2, d=0.5)
    ldi_trg = flat_ldi(rng, l=2, d=0.6)
    pose = transforms.translation_pose(np.array([[-0.1, 0, 0]], np.float32))

    def f(ds, dt):
        a = LDI(textures=ldi_src.textures, disparities=ds,
                intrinsics=ldi_src.intrinsics)
        b = LDI(textures=ldi_trg.textures, disparities=dt,
                intrinsics=ldi_trg.intrinsics)
        return depth_consistency(a, b, pose, RenderConfig(),
                                 stop_target=True)

    gs, gt = jax.grad(f, argnums=(0, 1))(ldi_src.disparities,
                                         ldi_trg.disparities)
    assert float(jnp.max(jnp.abs(gs))) > 0
    np.testing.assert_array_equal(np.asarray(gt), 0.0)


def test_depth_consistency_disocc_only_masks_to_disocclusions(rng):
    """disocc_only: with a source LDI whose layer 0 covers the whole target
    (pure fronto-parallel translation, no holes), the masked term has an
    empty support -> exactly 0; the unmasked term is positive."""
    ldi_src = flat_ldi(rng, l=2, d=0.5)
    ldi_trg = flat_ldi(rng, l=2, d=0.8)
    pose = transforms.translation_pose(np.array([[-0.05, 0, 0]], np.float32))
    full = depth_consistency(ldi_src, ldi_trg, pose, RenderConfig())
    occ = depth_consistency(ldi_src, ldi_trg, pose, RenderConfig(),
                            disocc_only=True)
    assert float(full) > 0.1
    # layer-0 covers everything except the 1-px border the shift uncovered;
    # those border pixels still compare 0.5 vs 0.8 -> allow either empty
    # support (0) or the same magnitude as full on a tiny support
    assert float(occ) <= float(full) + 1e-6


def test_disocc_only_targets_hidden_surface(rng):
    """Construct a real disocclusion: a foreground strip over background in
    the source. Disoccluded target pixels exist, and the masked term sees
    ONLY them (loss reflects deep-layer vs pseudo-label disagreement)."""
    h, w = 16, 32
    # source: background plane d=0.2 everywhere (layer 1), foreground strip
    # d=0.5 in columns 10..16 (layer 0); elsewhere layer 0 == background.
    d0 = np.full((h, w, 1), 0.2, np.float32)
    d0[:, 10:16] = 0.5
    d1 = np.full((h, w, 1), 0.2, np.float32)
    disp = np.stack([d0, d1], 0)[None]
    tex = rng.uniform(size=(1, 2, h, w, 3)).astype(np.float32)
    ldi_src = LDI(textures=jnp.asarray(tex), disparities=jnp.asarray(disp),
                  intrinsics=jnp.asarray(make_K(w, h)[None]))
    # target prediction: layer-0 = true scene from the right camera; for
    # this test just use the true background disparity everywhere
    ldi_trg = flat_ldi(rng, h=h, w=w, l=2, d=0.2)
    # translate enough that the strip shifts ~7 px vs bg ~3 px: the ~4 px
    # disocclusion band survives the 1-px bilinear tent reach of each side
    pose = transforms.translation_pose(np.array([[-0.5, 0, 0]], np.float32))
    occ = depth_consistency(ldi_src, ldi_trg, pose, RenderConfig(),
                            stop_target=True, disocc_only=True)
    # deep layer (0.2) == pseudo-label (0.2) at disocclusions -> near zero
    assert float(occ) < 2e-3
    # now corrupt the hidden layer: term must light up
    bad = LDI(textures=ldi_src.textures,
              disparities=ldi_src.disparities.at[:, 1].set(0.45),
              intrinsics=ldi_src.intrinsics)
    occ_bad = depth_consistency(bad, ldi_trg, pose, RenderConfig(),
                                stop_target=True, disocc_only=True)
    assert float(occ_bad) > float(occ) + 0.05


def test_depth_consistency_deep_only_blocks_layer0_grad(rng):
    """deep_only: the term's gradient reaches ONLY the source's hidden
    layers — layer-0 geometry stays owned by the photometric losses (the
    r3c fix for layer-0 drifting the moment the disocc term enabled)."""
    ldi_src = flat_ldi(rng, l=2, d=0.5)
    ldi_trg = flat_ldi(rng, l=2, d=0.6)
    pose = transforms.translation_pose(np.array([[-0.1, 0, 0]], np.float32))

    def f(ds):
        a = LDI(textures=ldi_src.textures, disparities=ds,
                intrinsics=ldi_src.intrinsics)
        return depth_consistency(a, ldi_trg, pose, RenderConfig(),
                                 stop_target=True, deep_only=True)

    gs = jax.grad(f)(ldi_src.disparities)
    np.testing.assert_array_equal(np.asarray(gs[:, 0]), 0.0)
    assert float(jnp.max(jnp.abs(gs[:, 1]))) > 0


def test_depth_consistency_visible_only_complements_disocc(rng):
    """visible_only + disocc_only partition the rendered support: on the
    real-disocclusion scene their masked errors are disjoint, and the
    visible term sees the covered pixels (0.2-vs-0.2 background plus the
    0.5-vs-0.2 foreground disagreement -> positive)."""
    h, w = 16, 32
    d0 = np.full((h, w, 1), 0.2, np.float32)
    d0[:, 10:16] = 0.5
    d1 = np.full((h, w, 1), 0.2, np.float32)
    disp = np.stack([d0, d1], 0)[None]
    tex = rng.uniform(size=(1, 2, h, w, 3)).astype(np.float32)
    ldi_src = LDI(textures=jnp.asarray(tex), disparities=jnp.asarray(disp),
                  intrinsics=jnp.asarray(make_K(w, h)[None]))
    ldi_trg = flat_ldi(rng, h=h, w=w, l=2, d=0.2)
    pose = transforms.translation_pose(np.array([[-0.5, 0, 0]], np.float32))
    vis = depth_consistency(ldi_src, ldi_trg, pose, RenderConfig(),
                            visible_only=True)
    occ = depth_consistency(ldi_src, ldi_trg, pose, RenderConfig(),
                            stop_target=True, disocc_only=True)
    # visible support contains the foreground strip (0.5 vs label 0.2)
    assert float(vis) > 0.02
    # disocclusion support contains only agreeing background -> ~0
    assert float(occ) < 2e-3


def test_anchor_term_assembles_and_respects_warmup(tmp_path):
    """consistency_anchor_weight: depth_anchor is in the parts and stays
    active during the pseudo-label warm-up window."""
    import json

    from lsi_tpu.train.trainer import Trainer

    cfg = _tiny_cfg(consistency_weight=0.5, symmetric=True,
                    consistency_anchor_weight=0.5,
                    consistency_stop_target=True,
                    consistency_disocc_only=True,
                    consistency_deep_only=True,
                    consistency_start_step=2)
    cfg = cfg.replace(train=TrainConfig(
        max_steps=4, warmup_steps=1, log_every=1, checkpoint_every=1000,
        checkpoint_dir=str(tmp_path / "ckpt")))
    _, metrics = Trainer(cfg).train()
    assert np.isfinite(metrics["total"])
    recs = {}
    with open(tmp_path / "ckpt" / "train.jsonl") as f:
        for line in f:
            rec = json.loads(line)
            if "total" in rec:
                recs[rec["step"]] = rec
    # anchor active in BOTH phases; pseudo-label term only after the switch
    assert "depth_anchor" in recs[2]
    assert "depth_consistency" not in recs[2]
    assert "depth_anchor" in recs[4]
    assert "depth_consistency" in recs[4]


def test_ema_teacher_state_and_update(rng):
    """Teacher mode: ema_params exist, follow the e*d + p*(1-d) update, and
    the step trains (finite loss, nonzero grad)."""
    from lsi_tpu.data.pipeline import make_dataset
    from lsi_tpu.train.trainer import create_state, make_train_step

    cfg = _tiny_cfg(consistency_weight=0.5, symmetric=True,
                    consistency_anchor_weight=0.5,
                    consistency_ema_teacher=True,
                    consistency_ema_decay=0.9)
    state = create_state(cfg, jax.random.key(0))
    assert state.ema_params is not None
    # EMA starts as a copy of params
    # snapshot to host before the step: the train state is DONATED
    l0 = np.asarray(jax.tree_util.tree_leaves(state.params)[0])
    e0 = np.asarray(jax.tree_util.tree_leaves(state.ema_params)[0])
    np.testing.assert_array_equal(l0, e0)

    step = make_train_step(cfg)
    batch = next(make_dataset(cfg.data, seed=0))
    state1, m = step(state, batch)
    assert np.isfinite(float(m["total"]))
    assert "depth_anchor" in m and "depth_consistency" in m
    # Manual EMA of the first leaf matches, including the mean-teacher
    # decay ramp d_t = min(d_cfg, (t+1)/(t+10)): at t=0 the effective
    # decay is 0.1 (teacher tracks the student closely early), not the
    # configured 0.9.
    p1 = np.asarray(jax.tree_util.tree_leaves(state1.params)[0])
    e1 = np.asarray(jax.tree_util.tree_leaves(state1.ema_params)[0])
    d0 = min(0.9, 1.0 / 10.0)
    np.testing.assert_allclose(e1, e0 * d0 + p1 * (1 - d0),
                               rtol=1e-5, atol=1e-7)
    # Second step: t=1 -> d = min(0.9, 2/11).
    state2, _ = step(state1, next(make_dataset(cfg.data, seed=1)))
    p2 = np.asarray(jax.tree_util.tree_leaves(state2.params)[0])
    e2 = np.asarray(jax.tree_util.tree_leaves(state2.ema_params)[0])
    d1 = min(0.9, 2.0 / 11.0)
    np.testing.assert_allclose(e2, e1 * d1 + p2 * (1 - d1),
                               rtol=1e-5, atol=1e-7)


def test_ema_teacher_disabled_keeps_state_lean(rng):
    from lsi_tpu.train.trainer import create_state

    cfg = _tiny_cfg(consistency_weight=0.5, symmetric=True)
    assert create_state(cfg, jax.random.key(0)).ema_params is None


def test_trainer_teacher_warmup_gates_both_terms(tmp_path):
    """Teacher mode + start_step: NEITHER consistency term appears before
    the switch (an immature teacher is a poor target for both), both after,
    and the run trains end-to-end through the Trainer."""
    import json

    from lsi_tpu.train.trainer import Trainer

    cfg = _tiny_cfg(consistency_weight=0.5, symmetric=True,
                    consistency_anchor_weight=0.5,
                    consistency_ema_teacher=True,
                    consistency_start_step=2)
    cfg = cfg.replace(train=TrainConfig(
        max_steps=4, warmup_steps=1, log_every=1, checkpoint_every=1000,
        checkpoint_dir=str(tmp_path / "ckpt")))
    _, metrics = Trainer(cfg).train()
    assert np.isfinite(metrics["total"])
    recs = {}
    with open(tmp_path / "ckpt" / "train.jsonl") as f:
        for line in f:
            rec = json.loads(line)
            if "total" in rec:
                recs[rec["step"]] = rec
    assert "depth_consistency" not in recs[2]
    assert "depth_anchor" not in recs[2]
    assert "photo_splat_rev" in recs[2]
    assert "depth_consistency" in recs[4]
    assert "depth_anchor" in recs[4]


def test_trainer_consistency_warmup_switches(tmp_path):
    """consistency_start_step: the term is absent from the jsonl before the
    switch step and present after (two compiled steps, staged-training
    mechanism)."""
    import json

    from lsi_tpu.train.trainer import Trainer

    cfg = _tiny_cfg(consistency_weight=0.5, symmetric=True,
                    consistency_start_step=2)
    cfg = cfg.replace(train=TrainConfig(
        max_steps=4, warmup_steps=1, log_every=1, checkpoint_every=1000,
        checkpoint_dir=str(tmp_path / "ckpt")))
    _, metrics = Trainer(cfg).train()
    assert np.isfinite(metrics["total"])
    recs = {}
    with open(tmp_path / "ckpt" / "train.jsonl") as f:
        for line in f:
            rec = json.loads(line)
            if "total" in rec:
                recs[rec["step"]] = rec
    # steps 1-2 ran the warm-up step (no consistency term); symmetric
    # photometric is active throughout
    assert "depth_consistency" not in recs[2]
    assert "photo_splat_rev" in recs[2]
    assert "depth_consistency" in recs[4]


def test_trainer_consistency_stop_drops_pseudo_label(tmp_path):
    """consistency_stop_step: after the stop the disocc pseudo-label term
    (depth_consistency) disappears while the negotiated anchor
    (depth_anchor) stays — the toy-testbed composite that takes the
    hidden-layer boot without the late layer-0 drift (BASELINE.md r3)."""
    import json

    from lsi_tpu.train.trainer import Trainer

    cfg = _tiny_cfg(consistency_weight=0.5, symmetric=True,
                    consistency_anchor_weight=0.5,
                    consistency_stop_step=3)
    cfg = cfg.replace(train=TrainConfig(
        max_steps=5, warmup_steps=1, log_every=1, checkpoint_every=1000,
        checkpoint_dir=str(tmp_path / "ckpt")))
    _, metrics = Trainer(cfg).train()
    assert np.isfinite(metrics["total"])
    recs = {}
    with open(tmp_path / "ckpt" / "train.jsonl") as f:
        for line in f:
            rec = json.loads(line)
            if "total" in rec:
                recs[rec["step"]] = rec
    # steps 1-3 run the full recipe (selection is by 0-indexed step;
    # logged records are 1-indexed step+1)
    assert "depth_consistency" in recs[3]
    assert "depth_anchor" in recs[3]
    # from step 4 on the pseudo-label is dropped, the anchor kept
    assert "depth_consistency" not in recs[5]
    assert "depth_anchor" in recs[5]
