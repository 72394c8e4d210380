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
