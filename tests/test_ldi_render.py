"""LDI render (forward splat + soft z-buffer) vs oracle and golden cases."""

import numpy as np
import jax
import jax.numpy as jnp

from lsi_tpu.geometry import transforms
from lsi_tpu.geometry.ldi import LDI, render_forward, gather_target_per_layer
import reference_np


def make_K(fx=60.0, fy=60.0, cx=15.5, cy=11.5):
    return np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1]], np.float32)


def two_layer_ldi(rng, h=24, w=32, b=1):
    tex = rng.uniform(size=(b, 2, h, w, 3)).astype(np.float32)
    d0 = rng.uniform(0.4, 0.6, (b, 1, h, w, 1)).astype(np.float32)
    d1 = rng.uniform(0.1, 0.2, (b, 1, h, w, 1)).astype(np.float32)
    disp = np.concatenate([d0, d1], axis=1)
    K = np.tile(make_K()[None], (b, 1, 1))
    return LDI(textures=jnp.asarray(tex), disparities=jnp.asarray(disp),
               intrinsics=jnp.asarray(K))


def test_identity_pose_renders_nearest_layer(rng):
    """At identity pose every layer splats exactly onto its own pixel; the
    soft z-buffer must make the (much nearer) layer-0 dominate."""
    ldi = two_layer_ldi(rng)
    out = render_forward(ldi, transforms.identity_pose((1,)),
                        zbuffer_scale=100.0)
    np.testing.assert_allclose(np.asarray(out["rgb"]),
                               np.asarray(ldi.textures[:, 0]),
                               atol=2e-3)
    np.testing.assert_allclose(np.asarray(out["disparity"]),
                               np.asarray(ldi.disparities[:, 0]), atol=1e-3)


def test_matches_np_oracle(rng):
    ldi = two_layer_ldi(rng, h=10, w=12)
    pose = transforms.pose_from_euler(
        np.array([0.01, -0.02, 0.005], np.float32),
        np.array([0.08, 0.02, -0.05], np.float32))[None]
    scale = 20.0
    out = render_forward(ldi, pose, zbuffer_scale=scale, max_disparity=1.0)
    ref = reference_np.render_ldi_np(
        np.asarray(ldi.textures)[0], np.asarray(ldi.disparities)[0, ..., 0],
        np.asarray(ldi.intrinsics)[0], np.asarray(pose)[0], scale)
    np.testing.assert_allclose(np.asarray(out["rgb"])[0], ref["rgb"],
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out["disparity"])[0, ..., 0],
                               ref["disparity"], rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out["coverage"])[0, ..., 0],
                               ref["coverage"], rtol=1e-3, atol=1e-4)


def test_high_scale_approaches_hard_zbuffer(rng):
    """sigma -> 0 (scale -> inf): front layer wins outright where it covers."""
    h, w = 16, 16
    tex = np.zeros((1, 2, h, w, 3), np.float32)
    tex[:, 0] = 1.0  # front layer white
    tex[:, 1] = 0.0  # back layer black
    disp = np.concatenate([
        np.full((1, 1, h, w, 1), 0.5, np.float32),
        np.full((1, 1, h, w, 1), 0.1, np.float32)], axis=1)
    ldi = LDI(textures=jnp.asarray(tex), disparities=jnp.asarray(disp),
              intrinsics=jnp.asarray(make_K(cx=7.5, cy=7.5)[None]))
    out = render_forward(ldi, transforms.identity_pose((1,)),
                        zbuffer_scale=200.0)
    np.testing.assert_allclose(np.asarray(out["rgb"]), 1.0, atol=1e-4)


def test_translation_moves_content():
    """A small x-translation shifts rendered content by fx*tx*disparity."""
    h, w = 16, 32
    tex = np.zeros((1, 1, h, w, 3), np.float32)
    tex[0, 0, :, 10] = 1.0  # vertical white stripe at x=10
    disp = np.full((1, 1, h, w, 1), 0.5, np.float32)
    K = make_K(fx=40.0, cx=15.5, cy=7.5)
    ldi = LDI(textures=jnp.asarray(tex), disparities=jnp.asarray(disp),
              intrinsics=jnp.asarray(K[None]))
    tx = -0.2
    pose = transforms.translation_pose(np.array([[tx, 0, 0]], np.float32))
    out = render_forward(ldi, pose)
    shift = 40.0 * tx * 0.5  # fx * tx * d = -4 px
    stripe = np.asarray(out["rgb"])[0, h // 2, :, 0]
    assert stripe[10 + int(shift)] > 0.9
    assert stripe[10] < 1e-3


def test_render_differentiable_no_nans(rng):
    ldi = two_layer_ldi(rng, h=8, w=8)
    pose = transforms.translation_pose(np.array([[0.1, 0, 0]], np.float32))

    def loss(disp):
        l2 = LDI(textures=ldi.textures, disparities=disp,
                 intrinsics=ldi.intrinsics)
        out = render_forward(l2, pose)
        return jnp.sum(out["rgb"] ** 2)

    g = jax.grad(loss)(ldi.disparities)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.max(jnp.abs(g))) > 0.0


def test_vmap_over_poses_trajectory(rng):
    """Render one LDI to many poses via vmap (video-synthesis path)."""
    ldi = two_layer_ldi(rng, h=8, w=8)
    poses = transforms.camera_trajectory(5, (0.05, 0.0, 0.0))  # (5, 4, 4)

    def render_one(pose):
        return render_forward(ldi, pose[None])["rgb"]

    frames = jax.vmap(render_one)(poses)
    assert frames.shape == (5, 1, 8, 8, 3)
    assert np.isfinite(np.asarray(frames)).all()


def test_gather_target_per_layer_identity(rng):
    """Identity pose: sampling the 'target' (= source layer-0 image) at each
    layer's projection returns exactly that image."""
    ldi = two_layer_ldi(rng, h=8, w=10)
    trg = jnp.asarray(np.asarray(ldi.textures)[:, 0])
    sampled, valid, tdisp = gather_target_per_layer(
        ldi, trg, transforms.identity_pose((1,)))
    assert sampled.shape == (1, 2, 8, 10, 3)
    np.testing.assert_allclose(np.asarray(sampled[:, 0]), np.asarray(trg),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(sampled[:, 1]), np.asarray(trg),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(valid), 1.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(tdisp), np.asarray(ldi.disparities),
                               rtol=1e-4)
