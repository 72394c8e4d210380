"""Forward splat vs numpy oracle, conservation, determinism, gradients."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lsi_tpu.ops.splat import splat_bilinear
import reference_np

METHODS = ["scatter", "sort"]


@pytest.mark.parametrize("method", METHODS)
def test_single_pixel_four_neighbors(method):
    vals = jnp.zeros((1, 1, 1, 1), jnp.float32) + 2.0
    coords = jnp.asarray([[[[1.25, 2.75]]]], jnp.float32)  # x=1.25, y=2.75
    w = jnp.ones((1, 1, 1, 1), jnp.float32)
    accum, wsum = splat_bilinear(vals, coords, w, (5, 4), method=method)
    a = np.asarray(wsum)[0, ..., 0]
    # corners: (y=2,x=1):.75*.25? — fx=.25, fy=.75
    np.testing.assert_allclose(a[2, 1], 0.75 * 0.25, atol=1e-6)
    np.testing.assert_allclose(a[2, 2], 0.25 * 0.25, atol=1e-6)
    np.testing.assert_allclose(a[3, 1], 0.75 * 0.75, atol=1e-6)
    np.testing.assert_allclose(a[3, 2], 0.25 * 0.75, atol=1e-6)
    assert abs(float(jnp.sum(wsum)) - 1.0) < 1e-6
    assert abs(float(jnp.sum(accum)) - 2.0) < 1e-6


@pytest.mark.parametrize("method", METHODS)
def test_matches_np_oracle(method, rng):
    vals = rng.uniform(size=(5, 6, 3)).astype(np.float32)
    coords = rng.uniform(-1.0, 7.0, (5, 6, 2)).astype(np.float32)
    w = rng.uniform(0.1, 2.0, (5, 6)).astype(np.float32)
    accum, wsum = splat_bilinear(
        jnp.asarray(vals)[None], jnp.asarray(coords)[None],
        jnp.asarray(w)[None, ..., None], (6, 7), method=method)
    accum_np, wsum_np = reference_np.splat_np(vals, coords, w, (6, 7))
    np.testing.assert_allclose(np.asarray(accum)[0], accum_np, rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(wsum)[0, ..., 0], wsum_np,
                               rtol=1e-4, atol=1e-5)


def test_scatter_equals_sort(rng):
    vals = jnp.asarray(rng.uniform(size=(2, 8, 9, 4)), jnp.float32)
    coords = jnp.asarray(rng.uniform(-2, 11, (2, 8, 9, 2)), jnp.float32)
    w = jnp.asarray(rng.uniform(0, 1, (2, 8, 9, 1)), jnp.float32)
    a1, w1 = splat_bilinear(vals, coords, w, (8, 9), method="scatter")
    a2, w2 = splat_bilinear(vals, coords, w, (8, 9), method="sort")
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a2), rtol=1e-5,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(w1), np.asarray(w2), rtol=1e-5,
                               atol=1e-5)


@pytest.mark.parametrize("method", METHODS)
def test_mass_conservation_interior(method, rng):
    """All weight mass lands in the target when coords are interior."""
    vals = jnp.asarray(rng.uniform(size=(1, 6, 6, 2)), jnp.float32)
    coords = jnp.asarray(rng.uniform(1.0, 4.0, (1, 6, 6, 2)), jnp.float32)
    w = jnp.asarray(rng.uniform(0.5, 1.5, (1, 6, 6, 1)), jnp.float32)
    _, wsum = splat_bilinear(vals, coords, w, (6, 6), method=method)
    assert abs(float(jnp.sum(wsum)) - float(jnp.sum(w))) < 1e-4


def test_determinism(rng):
    vals = jnp.asarray(rng.uniform(size=(1, 16, 16, 3)), jnp.float32)
    coords = jnp.asarray(rng.uniform(0, 15, (1, 16, 16, 2)), jnp.float32)
    w = jnp.ones((1, 16, 16, 1), jnp.float32)
    f = jax.jit(lambda: splat_bilinear(vals, coords, w, (16, 16)))
    a1, _ = f()
    a2, _ = f()
    assert np.array_equal(np.asarray(a1), np.asarray(a2))


@pytest.mark.parametrize("method", METHODS)
def test_grad_through_values_weights_coords(method, rng):
    vals = jnp.asarray(rng.uniform(size=(1, 4, 4, 2)), jnp.float32)
    coords = jnp.asarray(rng.uniform(0.3, 2.6, (1, 4, 4, 2)), jnp.float32)
    w = jnp.asarray(rng.uniform(0.5, 1.0, (1, 4, 4, 1)), jnp.float32)

    def loss(v, c, ww):
        a, s = splat_bilinear(v, c, ww, (4, 4), method=method)
        return jnp.sum(a ** 2) + jnp.sum(s ** 2)

    grads = jax.grad(loss, argnums=(0, 1, 2))(vals, coords, w)
    for arg_i, x in ((0, vals), (1, coords), (2, w)):
        g = np.asarray(grads[arg_i]).ravel()
        flat = np.asarray(x).ravel()
        eps = 1e-3
        for k in (0, len(flat) // 3, len(flat) - 1):
            d = np.zeros_like(flat)
            d[k] = eps
            args_p = [vals, coords, w]
            args_m = [vals, coords, w]
            args_p[arg_i] = jnp.asarray((flat + d).reshape(x.shape))
            args_m[arg_i] = jnp.asarray((flat - d).reshape(x.shape))
            fd = (float(loss(*args_p)) - float(loss(*args_m))) / (2 * eps)
            assert abs(fd - g[k]) < 5e-2, (method, arg_i, k, fd, g[k])


@pytest.mark.parametrize("method", METHODS)
def test_all_out_of_bounds(method):
    vals = jnp.ones((1, 3, 3, 1), jnp.float32)
    coords = jnp.full((1, 3, 3, 2), -10.0, jnp.float32)
    w = jnp.ones((1, 3, 3, 1), jnp.float32)
    accum, wsum = splat_bilinear(vals, coords, w, (3, 3), method=method)
    np.testing.assert_allclose(np.asarray(accum), 0.0)
    np.testing.assert_allclose(np.asarray(wsum), 0.0)
