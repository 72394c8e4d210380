"""Pallas tent-matmul gather kernel vs the lax oracle (interpret on CPU).

On a real TPU the same tests run compiled (LSI_TPU_TEST_TPU=1).
"""

import numpy as np
import jax
import jax.numpy as jnp

from lsi_tpu.kernels.gather_pallas import gather_pallas_diff
from lsi_tpu.ops.gather import bilinear_sample


def make_case(rng, n=1, layers=2, h=16, w=128, max_dx_shift=8, jitter_y=1.0,
              frac_range=None):
    """Folded-row gather case: coords (N, L*H, W, 2) into an (N, H, W, 3)
    image, vertical displacement within ``jitter_y`` of the base row."""
    hs = layers * h
    img = jnp.asarray(rng.uniform(size=(n, h, w, 3)), jnp.float32)
    base_x = np.broadcast_to(np.arange(w, dtype=np.float32), (n, hs, w))
    base_y = np.broadcast_to(
        (np.arange(hs, dtype=np.float32)[:, None] % h), (n, hs, w))
    if frac_range is None:
        dx = rng.uniform(-max_dx_shift, max_dx_shift, (n, hs, w))
        dy = rng.uniform(-jitter_y, jitter_y, (n, hs, w))
    else:  # integer shifts + fractions away from the snap zones
        lo, hi = frac_range
        dx = (rng.integers(-max_dx_shift, max_dx_shift, (n, hs, w))
              + rng.uniform(lo, hi, (n, hs, w)))
        dy = (rng.integers(-int(jitter_y), int(jitter_y) + 1, (n, hs, w))
              + rng.uniform(lo, hi, (n, hs, w)))
    coords = jnp.asarray(
        np.stack([base_x + dx, base_y + dy], -1), jnp.float32)
    return img, coords, (h, w)


def test_matches_lax_oracle(rng):
    img, coords, _ = make_case(rng)
    s_p, v_p = gather_pallas_diff(img, coords, 16, 4)
    s_l, v_l = bilinear_sample(img, coords)
    # atol 1e-4: snap_fraction zones (near-integer coords) differ by design.
    np.testing.assert_allclose(np.asarray(s_p), np.asarray(s_l),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(v_p), np.asarray(v_l),
                               rtol=1e-4, atol=1e-4)


def test_oob_zeros_semantics(rng):
    img, coords, _ = make_case(rng, max_dx_shift=40)  # pushes past borders
    s_p, v_p = gather_pallas_diff(img, coords, 64, 4)
    s_l, v_l = bilinear_sample(img, coords)
    np.testing.assert_allclose(np.asarray(s_p), np.asarray(s_l),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(v_p), np.asarray(v_l),
                               rtol=1e-4, atol=1e-4)
    assert float(jnp.min(v_l)) == 0.0  # the case actually exercised OOB


def test_window_drops_far_rows(rng):
    """Displacements beyond max_dy zero both value and valid (by design)."""
    img, coords, _ = make_case(rng, jitter_y=0.0)
    coords = coords.at[..., 1].add(6.3)  # 6 rows below base; window is 2
    s_p, v_p = gather_pallas_diff(img, coords, 16, 2)
    np.testing.assert_array_equal(np.asarray(s_p), 0.0)
    np.testing.assert_array_equal(np.asarray(v_p), 0.0)


def test_coordinate_gradients_match_fd(rng):
    img, coords, _ = make_case(rng, h=8, w=128, layers=1,
                               max_dx_shift=4, jitter_y=1,
                               frac_range=(0.25, 0.75))
    ct_s = jnp.asarray(rng.normal(size=(1, 8, 128, 3)), jnp.float32)
    ct_v = jnp.asarray(rng.normal(size=(1, 8, 128, 1)), jnp.float32)

    def f(c):
        s, v = gather_pallas_diff(img, c, 16, 4)
        return jnp.sum(s * ct_s) + jnp.sum(v * ct_v)

    g = jax.grad(f)(coords)
    eps = 1e-3
    idxs = [(0, 3, 17), (0, 5, 64), (0, 0, 100)]
    for (b, r, cc) in idxs:
        for axis in (0, 1):
            d = np.zeros(coords.shape, np.float32)
            d[b, r, cc, axis] = eps
            fd = (float(f(coords + d)) - float(f(coords - d))) / (2 * eps)
            np.testing.assert_allclose(
                float(g[b, r, cc, axis]), fd, rtol=5e-2, atol=5e-3)


def test_image_gradient_is_transposed_gather(rng):
    """d_image from the kernel VJP == autodiff of the lax oracle."""
    img, coords, _ = make_case(rng, h=8, w=128, layers=2, max_dx_shift=4,
                               jitter_y=1, frac_range=(0.25, 0.75))
    ct = jnp.asarray(rng.normal(size=(1, 16, 128, 3)), jnp.float32)

    g_pallas = jax.grad(
        lambda im: jnp.sum(gather_pallas_diff(im, coords, 16, 4)[0] * ct)
    )(img)
    g_lax = jax.grad(
        lambda im: jnp.sum(bilinear_sample(im, coords)[0] * ct))(img)
    np.testing.assert_allclose(np.asarray(g_pallas), np.asarray(g_lax),
                               rtol=1e-4, atol=1e-4)


def test_deterministic(rng):
    img, coords, _ = make_case(rng)
    a1, v1 = gather_pallas_diff(img, coords, 16, 4)
    a2, v2 = gather_pallas_diff(img, coords, 16, 4)
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
