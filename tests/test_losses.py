"""Loss function behavior tests."""

import numpy as np
import jax
import jax.numpy as jnp

from lsi_tpu.config import LossConfig, RenderConfig
from lsi_tpu.geometry import transforms
from lsi_tpu.geometry.ldi import LDI
from lsi_tpu.losses import (
    total_loss, view_synthesis_inverse_warp, view_synthesis_splat,
    disparity_smoothness, depth_supervision)


def make_K(fx=40.0, cx=15.5, cy=7.5):
    return np.array([[fx, 0, cx], [0, fx, cy], [0, 0, 1]], np.float32)


def flat_ldi(rng, h=16, w=32, l=2, d=0.5):
    tex = rng.uniform(size=(1, l, h, w, 3)).astype(np.float32)
    disp = np.stack([np.full((1, h, w, 1), d / (i + 1), np.float32)
                     for i in range(l)], axis=1)
    return LDI(textures=jnp.asarray(tex), disparities=jnp.asarray(disp),
               intrinsics=jnp.asarray(make_K()[None]))


def test_identity_pose_zero_photometric(rng):
    """Target == layer-0 texture at identity pose => near-zero loss."""
    ldi = flat_ldi(rng, l=1)
    trg = jnp.asarray(np.asarray(ldi.textures)[:, 0])
    loss = view_synthesis_inverse_warp(ldi, trg,
                                       transforms.identity_pose((1,)))
    assert float(loss) < 2e-4  # charbonnier eps floor


def test_min_over_layers_ignores_bad_layer(rng):
    """With one perfect layer and one wrong layer, min-over-layers loss is
    ~0 while the mean variant is large."""
    h, w = 8, 16
    good = rng.uniform(size=(1, 1, h, w, 3)).astype(np.float32)
    bad = 1.0 - good
    tex = np.concatenate([good, bad], axis=1)
    disp = np.concatenate([np.full((1, 1, h, w, 1), 0.5, np.float32),
                           np.full((1, 1, h, w, 1), 0.25, np.float32)], 1)
    ldi = LDI(textures=jnp.asarray(tex), disparities=jnp.asarray(disp),
              intrinsics=jnp.asarray(make_K()[None]))
    trg = jnp.asarray(good[:, 0])
    pose = transforms.identity_pose((1,))
    l_min = view_synthesis_inverse_warp(ldi, trg, pose, min_over_layers=True)
    l_mean = view_synthesis_inverse_warp(ldi, trg, pose,
                                         min_over_layers=False)
    assert float(l_min) < 1e-3
    assert float(l_mean) > 0.1


def test_min_layer0_margin_routes_ties_to_layer0(rng):
    """With the margin, a deep layer that is merely EQUALLY good loses the
    per-pixel min to layer-0 (the photometric gradient stays on layer-0's
    texture/depth path), while a genuinely better deep layer still wins.
    See LossConfig.min_layer0_margin (anti-offloading lever)."""
    h, w = 8, 16
    good = rng.uniform(size=(1, 1, h, w, 3)).astype(np.float32)
    pose = transforms.identity_pose((1,))
    K = jnp.asarray(make_K()[None])
    trg = jnp.asarray(good[:, 0])

    def loss_of(tex_deep, margin):
        tex = jnp.asarray(np.concatenate([good, tex_deep], axis=1))
        disp = jnp.concatenate(
            [jnp.full((1, 1, h, w, 1), 0.5), jnp.full((1, 1, h, w, 1), 0.25)],
            axis=1)
        ldi = LDI(textures=tex, disparities=disp, intrinsics=K)
        grad = jax.grad(lambda t: view_synthesis_inverse_warp(
            LDI(textures=t, disparities=disp, intrinsics=K), trg, pose,
            min_over_layers=True, layer0_margin=margin))(tex)
        loss = view_synthesis_inverse_warp(ldi, trg, pose,
                                           min_over_layers=True,
                                           layer0_margin=margin)
        return float(loss), np.asarray(grad)

    # Tie case: deep layer == layer-0 texture (both perfect). Without the
    # margin jnp.min splits the subgradient across tied layers; with it the
    # deep layer is strictly worse, so ALL gradient mass rides layer-0.
    _, g = loss_of(good.copy(), margin=0.05)
    assert np.abs(g[:, 1]).sum() == 0.0, "tied deep layer must lose the min"
    # Layer-0 catastrophically wrong (occlusion analogue): the deep layer
    # still wins despite the handicap, and the margin shows up as a
    # constant offset on the loss value (gradient-neutral).
    bad0 = 1.0 - good
    tex = jnp.asarray(np.concatenate([bad0, good], axis=1))
    disp = jnp.concatenate(
        [jnp.full((1, 1, h, w, 1), 0.5), jnp.full((1, 1, h, w, 1), 0.25)],
        axis=1)
    ldi = LDI(textures=tex, disparities=disp, intrinsics=K)
    l_m = view_synthesis_inverse_warp(ldi, trg, pose, min_over_layers=True,
                                      layer0_margin=0.05)
    l_0 = view_synthesis_inverse_warp(ldi, trg, pose, min_over_layers=True,
                                      layer0_margin=0.0)
    assert abs(float(l_m) - float(l_0) - 0.05) < 1e-3


def test_splat_loss_zero_on_matching_render(rng):
    ldi = flat_ldi(rng, l=1)
    trg = jnp.asarray(np.asarray(ldi.textures)[:, 0])
    loss = view_synthesis_splat(ldi, trg, transforms.identity_pose((1,)),
                                RenderConfig())
    assert float(loss) < 2e-4


def test_smoothness_flat_zero_nonflat_positive(rng):
    ldi = flat_ldi(rng)
    assert float(disparity_smoothness(ldi, edge_aware=False)) < 1e-7
    bumpy = LDI(
        textures=ldi.textures,
        disparities=ldi.disparities + 0.1 * jnp.asarray(
            rng.uniform(size=ldi.disparities.shape), jnp.float32),
        intrinsics=ldi.intrinsics)
    assert float(disparity_smoothness(bumpy, edge_aware=False)) > 1e-3


def test_depth_supervision_masks_invalid(rng):
    ldi = flat_ldi(rng)
    gt = jnp.asarray(np.full((1, 16, 32, 1), 0.9, np.float32))
    valid = jnp.zeros((1, 16, 32, 1), jnp.float32)
    assert float(depth_supervision(ldi, gt, valid)) == 0.0
    valid_all = jnp.ones_like(valid)
    assert float(depth_supervision(ldi, gt, valid_all)) > 0.3


def test_total_loss_assembles_and_differentiates(rng):
    ldi = flat_ldi(rng)
    trg = jnp.asarray(rng.uniform(size=(1, 16, 32, 3)), jnp.float32)
    pose = transforms.translation_pose(np.array([[0.05, 0, 0]], np.float32))
    cfg = LossConfig(photo_mode="both")

    def f(disp):
        l2 = LDI(textures=ldi.textures, disparities=disp,
                 intrinsics=ldi.intrinsics)
        return total_loss(l2, trg, pose, cfg, RenderConfig())["total"]

    val, grad = jax.value_and_grad(f)(ldi.disparities)
    assert np.isfinite(float(val))
    assert np.isfinite(np.asarray(grad)).all()

    parts = total_loss(ldi, trg, pose, cfg, RenderConfig())
    assert {"photo_inverse_warp", "photo_splat", "smoothness",
            "total"} <= set(parts)


def test_ssim_mixed_splat_loss(rng):
    ldi = flat_ldi(rng, l=1)
    trg = jnp.asarray(np.asarray(ldi.textures)[:, 0])
    pose = transforms.identity_pose((1,))
    from lsi_tpu.losses.losses import view_synthesis_splat
    pure = view_synthesis_splat(ldi, trg, pose, RenderConfig())
    mixed = view_synthesis_splat(ldi, trg, pose, RenderConfig(),
                                 ssim_weight=0.85)
    # perfect reconstruction: both near zero
    assert float(pure) < 2e-4
    assert float(mixed) < 2e-3
    # wrong target: mixed must be finite and differentiable
    trg2 = 1.0 - trg
    val, g = jax.value_and_grad(
        lambda d: view_synthesis_splat(
            LDI(textures=ldi.textures, disparities=d,
                intrinsics=ldi.intrinsics), trg2, pose, RenderConfig(),
            ssim_weight=0.85))(ldi.disparities)
    assert np.isfinite(float(val)) and np.isfinite(np.asarray(g)).all()


def test_min_over_candidates_forgives_subpixel_offset(rng):
    """With a slightly wrong pose (sub-pixel correspondence error), the
    candidate-min variant must find a lower error than the exact-sample
    loss, and candidate_radius=0 must reproduce the original loss."""
    from lsi_tpu.data import synthetic
    from lsi_tpu.geometry.ldi import LDI

    s = synthetic.make_scene(rng, 24, 48, baseline=0.3)
    ldi = LDI(
        textures=jnp.asarray(s.src_image)[None, None],
        disparities=jnp.asarray(
            s.gt_visible_disparity)[None, None, ..., None],
        intrinsics=jnp.asarray(s.intrinsics)[None])
    trg = jnp.asarray(s.trg_image)[None]
    pose = jnp.asarray(s.pose_src2trg)[None]
    # perturb the pose: +0.6 px horizontal error at disparity ~0.3
    pose_bad = pose.at[0, 0, 3].add(0.6 / (0.95 * 48) / 0.3)

    base = float(view_synthesis_inverse_warp(ldi, trg, pose_bad))
    cand = float(view_synthesis_inverse_warp(ldi, trg, pose_bad,
                                             candidate_radius=1))
    assert cand < base * 0.8

    exact0 = float(view_synthesis_inverse_warp(ldi, trg, pose))
    # r=0 path == the default path exactly
    np.testing.assert_allclose(
        float(view_synthesis_inverse_warp(ldi, trg, pose,
                                          candidate_radius=0)), exact0)
    # with the TRUE pose, candidates cannot make a perfect loss worse
    cand0 = float(view_synthesis_inverse_warp(ldi, trg, pose,
                                              candidate_radius=1))
    assert cand0 <= exact0 + 1e-6


def test_min_over_candidates_avg_layers_grads(rng):
    """Candidate variant works with min_over_layers=False and is
    differentiable."""
    from lsi_tpu.data import synthetic
    from lsi_tpu.geometry.ldi import LDI

    s = synthetic.make_scene(rng, 16, 32)
    disp = jnp.asarray(s.gt_visible_disparity)[None, None, ..., None]
    ldi = LDI(
        textures=jnp.asarray(s.src_image)[None, None],
        disparities=disp,
        intrinsics=jnp.asarray(s.intrinsics)[None])
    trg = jnp.asarray(s.trg_image)[None]
    pose = jnp.asarray(s.pose_src2trg)[None]

    def loss_of_disp(d):
        l2 = LDI(textures=ldi.textures, disparities=d,
                 intrinsics=ldi.intrinsics)
        return view_synthesis_inverse_warp(
            l2, trg, pose, min_over_layers=False, candidate_radius=1)

    val = float(loss_of_disp(disp))
    g = jax.grad(loss_of_disp)(disp)
    assert np.isfinite(val)
    assert np.isfinite(np.asarray(g)).all()


def test_inverse_warp_loss_pallas_gather_matches_lax(rng, monkeypatch):
    """The tent-matmul gather kernel path of the inverse-warp loss matches
    the lax gather path (interpret mode off-TPU), gradients included."""
    monkeypatch.setenv("LSI_TPU_FORCE_PALLAS", "1")
    h, w, l = 16, 128, 2
    tex = rng.uniform(size=(1, l, h, w, 3)).astype(np.float32)
    disp = np.sort(rng.uniform(0.1, 0.5, (1, l, h, w, 1)).astype(np.float32),
                   axis=1)[:, ::-1].copy()
    K = np.array([[0.9 * w, 0, (w - 1) / 2], [0, 0.9 * w, (h - 1) / 2],
                  [0, 0, 1]], np.float32)
    ldi = LDI(textures=jnp.asarray(tex), disparities=jnp.asarray(disp),
              intrinsics=jnp.asarray(K[None]))
    trg = jnp.asarray(rng.uniform(size=(1, h, w, 3)), jnp.float32)
    pose = transforms.translation_pose(np.array([[-0.05, 0.0, 0.0]],
                                                np.float32))
    cfg_on = RenderConfig(use_pallas="on", pallas_max_dy=4)

    def loss_fn(d, cfg):
        ldi_d = LDI(textures=ldi.textures, disparities=d,
                    intrinsics=ldi.intrinsics)
        return view_synthesis_inverse_warp(ldi_d, trg, pose,
                                           render_cfg=cfg)

    l_lax, g_lax = jax.value_and_grad(loss_fn)(ldi.disparities,
                                               RenderConfig())
    l_pal, g_pal = jax.value_and_grad(loss_fn)(ldi.disparities, cfg_on)
    np.testing.assert_allclose(float(l_pal), float(l_lax),
                               rtol=1e-4, atol=1e-5)
    # Gradients agree except in snap_fraction dead bands (near-integer
    # fractions), where the kernel intentionally zeroes the fraction
    # gradient while the lax gather does not — allow <0.5% such pixels.
    close = np.isclose(np.asarray(g_pal), np.asarray(g_lax),
                       rtol=1e-3, atol=1e-4)
    assert close.mean() > 0.995, f"{(~close).sum()} grad mismatches"


def test_total_loss_reports_gather_window_diag(rng, monkeypatch):
    """inverse_warp-only mode surfaces window_dropped_frac when the Pallas
    gather is engaged (the kitti_ldi2 preset's safety signal)."""
    monkeypatch.setenv("LSI_TPU_FORCE_PALLAS", "1")
    ldi = flat_ldi(rng, h=16, w=128)
    trg = jnp.asarray(rng.uniform(size=(1, 16, 128, 3)), jnp.float32)
    pose = transforms.translation_pose(np.array([[-0.05, 0.0, 0.0]],
                                                np.float32))
    parts = total_loss(ldi, trg, pose,
                       LossConfig(photo_mode="inverse_warp"),
                       RenderConfig(use_pallas="on", pallas_max_dy=2))
    assert "window_dropped_frac" in parts
    assert float(parts["window_dropped_frac"]) == 0.0


def test_candidate_min_loss_pallas_matches_lax(rng, monkeypatch):
    """candidate_radius > 0 through the Pallas gather == lax path."""
    monkeypatch.setenv("LSI_TPU_FORCE_PALLAS", "1")
    h, w, l = 16, 128, 2
    tex = rng.uniform(size=(1, l, h, w, 3)).astype(np.float32)
    disp = np.sort(rng.uniform(0.1, 0.5, (1, l, h, w, 1)).astype(np.float32),
                   axis=1)[:, ::-1].copy()
    K = np.array([[0.9 * w, 0, (w - 1) / 2], [0, 0.9 * w, (h - 1) / 2],
                  [0, 0, 1]], np.float32)
    ldi = LDI(textures=jnp.asarray(tex), disparities=jnp.asarray(disp),
              intrinsics=jnp.asarray(K[None]))
    trg = jnp.asarray(rng.uniform(size=(1, h, w, 3)), jnp.float32)
    pose = transforms.translation_pose(np.array([[-0.05, 0.0, 0.0]],
                                                np.float32))
    l_lax = view_synthesis_inverse_warp(
        ldi, trg, pose, candidate_radius=1,
        render_cfg=RenderConfig(use_pallas="off"))
    l_pal = view_synthesis_inverse_warp(
        ldi, trg, pose, candidate_radius=1,
        render_cfg=RenderConfig(use_pallas="on", pallas_max_dy=2))
    np.testing.assert_allclose(float(l_pal), float(l_lax),
                               rtol=1e-4, atol=1e-5)


def test_photo_layer0_term(rng):
    """photo_layer0_weight adds an inverse-warp photometric on the
    layer-0-only truncation: present in parts, summed into total, and its
    gradient does NOT touch deeper layers (the whole point — layer 0 must
    carry the visible scene itself)."""
    from lsi_tpu.config import LossConfig, RenderConfig
    from lsi_tpu.geometry import transforms
    from lsi_tpu.geometry.ldi import LDI
    from lsi_tpu.losses.losses import total_loss

    h, w, l = 16, 32, 2
    K = np.array([[0.9 * w, 0, (w - 1) / 2], [0, 0.9 * w, (h - 1) / 2],
                  [0, 0, 1]], np.float32)
    tex = jnp.asarray(rng.uniform(size=(1, l, h, w, 3)), jnp.float32)
    disp = jnp.asarray(
        np.stack([np.full((1, h, w, 1), 0.5, np.float32),
                  np.full((1, h, w, 1), 0.2, np.float32)], axis=1))
    ldi = LDI(textures=tex, disparities=disp, intrinsics=jnp.asarray(K[None]))
    trg = jnp.asarray(rng.uniform(size=(1, h, w, 3)), jnp.float32)
    pose = transforms.translation_pose(np.array([[-0.05, 0, 0]], np.float32))

    cfg = LossConfig(photo_mode="inverse_warp", photo_layer0_weight=0.7,
                     smoothness_weight=0.0)
    parts = total_loss(ldi, trg, pose, cfg, RenderConfig())
    assert "photo_layer0" in parts
    assert np.isfinite(float(parts["photo_layer0"]))
    summed = sum(v for k, v in parts.items()
                 if k not in ("total", "window_dropped_frac"))
    np.testing.assert_allclose(float(parts["total"]), float(summed),
                               rtol=1e-6)

    def l0_only(d):
        x = LDI(textures=tex, disparities=d, intrinsics=ldi.intrinsics)
        p = total_loss(x, trg, pose, cfg, RenderConfig())
        return p["photo_layer0"]

    g = np.asarray(jax.grad(l0_only)(disp))
    assert np.abs(g[:, 0]).max() > 0        # layer 0 gets signal
    assert np.abs(g[:, 1]).max() == 0.0     # deep layer untouched

    # single-layer LDI: the extra term is skipped (identical to base loss)
    one = LDI(textures=tex[:, :1], disparities=disp[:, :1],
              intrinsics=ldi.intrinsics)
    p1 = total_loss(one, trg, pose, cfg, RenderConfig())
    assert "photo_layer0" not in p1
