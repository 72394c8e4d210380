"""Bilinear gather sampling vs the numpy oracle + gradient checks."""

import numpy as np
import jax
import jax.numpy as jnp

from lsi_tpu.ops.gather import bilinear_sample
import reference_np


def test_identity_coords_identity_image(rng):
    img = jnp.asarray(rng.uniform(size=(2, 5, 6, 3)), jnp.float32)
    ys, xs = np.meshgrid(np.arange(5), np.arange(6), indexing="ij")
    coords = jnp.asarray(np.stack([xs, ys], -1), jnp.float32)[None]
    coords = jnp.broadcast_to(coords, (2, 5, 6, 2))
    out, valid = bilinear_sample(img, coords)
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-6)
    np.testing.assert_allclose(np.asarray(valid), 1.0)


def test_matches_np_oracle(rng):
    img = rng.uniform(size=(4, 5, 2)).astype(np.float32)
    coords = rng.uniform(-1.5, 6.0, (7, 8, 2)).astype(np.float32)
    out, valid = bilinear_sample(jnp.asarray(img)[None],
                                 jnp.asarray(coords)[None])
    out_np, valid_np = reference_np.bilinear_sample_np(img, coords)
    np.testing.assert_allclose(np.asarray(out)[0], out_np, rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(valid)[0, ..., 0], valid_np,
                               rtol=1e-4, atol=1e-5)


def test_half_pixel_average():
    img = jnp.asarray(np.array([[[0.0], [1.0]]], np.float32))[None]  # (1,1,2,1)
    coords = jnp.asarray(np.array([[[0.5, 0.0]]], np.float32))[None]
    out, _ = bilinear_sample(img, coords)
    assert abs(float(out[0, 0, 0, 0]) - 0.5) < 1e-6


def test_gradients_image_and_coords(rng):
    img = jnp.asarray(rng.uniform(size=(1, 6, 6, 2)), jnp.float32)
    coords = jnp.asarray(rng.uniform(0.6, 4.2, (1, 3, 3, 2)), jnp.float32)

    def f_img(im):
        return jnp.sum(bilinear_sample(im, coords)[0] ** 2)

    def f_coords(cc):
        return jnp.sum(bilinear_sample(img, cc)[0] ** 2)

    for f, x in ((f_img, img), (f_coords, coords)):
        g = jax.grad(f)(x)
        # Finite differences.
        eps = 1e-3
        flat = np.asarray(x).ravel()
        for k in (0, len(flat) // 2, len(flat) - 1):
            dx = np.zeros_like(flat)
            dx[k] = eps
            xp = jnp.asarray((flat + dx).reshape(x.shape))
            xm = jnp.asarray((flat - dx).reshape(x.shape))
            fd = (float(f(xp)) - float(f(xm))) / (2 * eps)
            assert abs(fd - float(np.asarray(g).ravel()[k])) < 1e-2


def test_out_of_bounds_zero():
    img = jnp.ones((1, 4, 4, 1), jnp.float32)
    coords = jnp.asarray([[[[-5.0, -5.0], [10.0, 1.0]]]], jnp.float32)
    out, valid = bilinear_sample(img, coords)
    np.testing.assert_allclose(np.asarray(out), 0.0)
    np.testing.assert_allclose(np.asarray(valid), 0.0)
