"""Evaluation metrics + trajectory sweep tests."""

import numpy as np
import jax.numpy as jnp

from lsi_tpu.config import RenderConfig
from lsi_tpu.evaluation import psnr, ssim, depth_metrics, render_trajectory
from lsi_tpu.geometry.ldi import LDI


def test_psnr_known_values(rng):
    x = jnp.asarray(rng.uniform(size=(1, 8, 8, 3)), jnp.float32)
    assert float(psnr(x, x)) > 100.0
    noise = x + 0.1
    val = float(psnr(jnp.clip(noise, 0, 1), x))
    assert 15.0 < val < 25.0  # mse ~0.01 -> ~20 dB


def test_ssim_identity_and_noise(rng):
    x = jnp.asarray(rng.uniform(size=(1, 16, 16, 3)), jnp.float32)
    assert float(ssim(x, x)) > 0.999
    y = jnp.asarray(rng.uniform(size=(1, 16, 16, 3)), jnp.float32)
    assert float(ssim(x, y)) < 0.5


def test_depth_metrics_perfect_and_off(rng):
    gt = jnp.asarray(rng.uniform(0.1, 0.5, (1, 8, 8, 1)), jnp.float32)
    m = depth_metrics(gt, gt)
    assert float(m["abs_rel"]) < 1e-5
    assert float(m["delta_1.25"]) == 1.0
    m2 = depth_metrics(gt * 2.0, gt)  # half the depth
    assert float(m2["abs_rel"]) > 0.4
    assert float(m2["delta_1.25"]) == 0.0


def test_render_trajectory(rng):
    tex = jnp.asarray(rng.uniform(size=(1, 2, 8, 12, 3)), jnp.float32)
    disp = jnp.concatenate([
        jnp.full((1, 1, 8, 12, 1), 0.4),
        jnp.full((1, 1, 8, 12, 1), 0.1)], axis=1).astype(jnp.float32)
    K = jnp.asarray(
        np.array([[10.0, 0, 5.5], [0, 10.0, 3.5], [0, 0, 1]],
                 np.float32)[None])
    ldi = LDI(textures=tex, disparities=disp, intrinsics=K)
    frames = render_trajectory(ldi, num_views=6,
                               max_translation=(0.1, 0, 0),
                               render_cfg=RenderConfig())
    assert frames.shape == (6, 1, 8, 12, 3)
    assert np.isfinite(np.asarray(frames)).all()
    # identity pose (first frame) reproduces front layer closely
    np.testing.assert_allclose(np.asarray(frames[0]),
                               np.asarray(tex[:, 0]), atol=0.05)


def test_video_export(tmp_path, rng):
    from lsi_tpu.evaluation.video import save_frames, save_gif
    frames = rng.uniform(size=(4, 1, 8, 12, 3)).astype("float32")
    paths = save_frames(frames, str(tmp_path / "frames"))
    assert len(paths) == 4
    import os
    assert all(os.path.exists(p) for p in paths)
    gif = save_gif(frames, str(tmp_path / "sweep.gif"))
    assert os.path.getsize(gif) > 0


def test_masked_ssim_ignores_holes(rng):
    """Windowed stats must exclude masked-out pixels: garbage in the holes
    cannot change the score, and a full mask reproduces plain SSIM."""
    from lsi_tpu.evaluation.metrics import ssim

    img = jnp.asarray(rng.uniform(size=(1, 40, 40, 3)), jnp.float32)
    mask = np.ones((1, 40, 40, 1), np.float32)
    mask[:, 10:20, 10:25] = 0.0
    mask = jnp.asarray(mask)

    noise = jnp.asarray(rng.uniform(size=(1, 40, 40, 3)), jnp.float32)
    pred_garbage = jnp.where(mask > 0, img, noise)

    s = float(ssim(pred_garbage, img, mask=mask))
    assert s > 0.999  # identical wherever it counts

    # full mask == plain ssim
    a = jnp.asarray(rng.uniform(size=(1, 32, 32, 3)), jnp.float32)
    b = jnp.clip(a + 0.05 * rng.standard_normal((1, 32, 32, 3)).astype(
        np.float32), 0, 1)
    np.testing.assert_allclose(
        float(ssim(a, b, mask=jnp.ones((1, 32, 32, 1)))),
        float(ssim(a, b)), rtol=1e-5)

    # half-mask: the masked score tracks plain SSIM on the valid crop
    # (boundary windows are renormalized + down-weighted, not poisoned by
    # zeros as in the old rgb*mask formulation)
    half = jnp.asarray(
        np.concatenate([np.zeros((1, 32, 16, 1), np.float32),
                        np.ones((1, 32, 16, 1), np.float32)], axis=2))
    a_noisy = jnp.where(half > 0, a, 0.0)
    b_noisy = jnp.where(half > 0, b, 1.0)  # junk differs in the hole
    s_masked = float(ssim(a_noisy, b_noisy, mask=half))
    s_crop = float(ssim(a[:, :, 16:], b[:, :, 16:]))
    s_zero_fill = float(ssim(a * half, b_noisy * half))
    assert abs(s_masked - s_crop) < 0.02
    assert abs(s_masked - s_crop) < abs(s_zero_fill - s_crop)


def test_trajectory_fused_window_check_warns(rng):
    """The fused canonical-sweep program (r3: pose ramp + renders +
    extreme-pose check in ONE jitted program) must still surface the
    dy-window safety warning for over-displaced sweeps."""
    import warnings

    import jax.numpy as jnp

    from lsi_tpu.config import RenderConfig
    from lsi_tpu.geometry.ldi import LDI

    h, w = 32, 64
    tex = jnp.asarray(rng.uniform(size=(1, 2, h, w, 3)), jnp.float32)
    disp = jnp.asarray(
        np.sort(rng.uniform(0.1, 0.5, (1, 2, h, w, 1)), 1)[:, ::-1].copy(),
        jnp.float32)
    K = jnp.asarray(np.array(
        [[0.9 * w, 0, (w - 1) / 2], [0, 0.9 * w, (h - 1) / 2],
         [0, 0, 1]], np.float32)[None])
    ldi = LDI(textures=tex, disparities=disp, intrinsics=K)
    from lsi_tpu.evaluation.trajectory import flush_window_warnings

    cfg = RenderConfig(use_pallas="off", pallas_max_dy=1)
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        frames = render_trajectory(ldi, 6, max_translation=(0.0, -0.5, 0.0),
                                   render_cfg=cfg)
        # the check is asynchronous (sweeps pipeline; docstring): flush
        # inside the catch_warnings window for a deterministic assert
        flush_window_warnings()
        assert any("dy-window" in str(r.message) for r in rec)
    assert frames.shape == (6, 1, h, w, 3)
    # an in-window sweep stays silent
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        render_trajectory(ldi, 6, max_translation=(0.1, 0.0, 0.0),
                          render_cfg=cfg)
        flush_window_warnings()
        assert not any("dy-window" in str(r.message) for r in rec)
