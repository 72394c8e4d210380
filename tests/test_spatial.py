"""Spatially-sharded render (H shards + halo exchange) on the CPU mesh.

The windowed single-device render is the semantic reference; off-TPU the
spatial path's local splat is the windowed lax oracle, so equality is
exact (identical accumulate-then-normalize, f32).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lsi_tpu.geometry.ldi import LDI, render_forward
from lsi_tpu.geometry.transforms import translation_pose
from lsi_tpu.ops.splat import splat_bilinear
from lsi_tpu.parallel.spatial import make_spatial_mesh, render_forward_spatial

# The mesh-composition tests need the virtual 8-device CPU mesh (conftest)
# AND the lax local-splat path their exactness contract is stated against;
# on the 1-chip TPU suite neither holds (no 8-way mesh; the local splat is
# the Pallas kernel, a different accumulation order). The kernel-contract
# tests below (fold_offset / two_shard manual composition) are
# device-agnostic and DO run on the chip suite.
needs_mesh8 = pytest.mark.skipif(
    len(jax.devices()) < 8,
    reason="spatial composition is an 8-device virtual-CPU-mesh protocol; "
           "the chip-side kernel contract is covered by "
           "test_kernel_fold_offset_matches_windowed_lax and "
           "test_two_shard_pallas_halo_composition_manual")


def make_ldi(rng, b=1, l=2, h=32, w=128):
    tex = jnp.asarray(rng.uniform(size=(b, l, h, w, 3)), jnp.float32)
    disp = jnp.asarray(
        np.sort(rng.uniform(0.05, 0.5, (b, l, h, w, 1)), axis=1)[:, ::-1]
        .copy(), jnp.float32)
    K = np.array([[0.9 * w, 0, (w - 1) / 2], [0, 0.9 * w, (h - 1) / 2],
                  [0, 0, 1]], np.float32)
    return LDI(textures=tex, disparities=disp,
               intrinsics=jnp.broadcast_to(jnp.asarray(K), (b, 3, 3)))


@needs_mesh8
def test_spatial_equals_global_pure_translation(rng):
    """Horizontal stereo (dy == 0 everywhere): spatial == global exactly."""
    ldi = make_ldi(rng)
    pose = translation_pose(np.array([[-0.3, 0.0, 0.0]], np.float32))
    mesh = make_spatial_mesh()
    out_s = render_forward_spatial(ldi, pose, mesh, zbuffer_scale=30.0,
                                   pallas_max_dy=1)
    out_g = render_forward(ldi, pose, zbuffer_scale=30.0, use_pallas="off")
    for k in ("rgb", "disparity", "coverage"):
        np.testing.assert_array_equal(np.asarray(out_s[k]),
                                      np.asarray(out_g[k]))
    # outputs are H-sharded over the full mesh
    assert len(out_s["rgb"].sharding.device_set) == 8


@needs_mesh8
def test_spatial_equals_global_with_vertical_motion(rng):
    """Vertical camera motion crosses shard boundaries: the halo exchange
    must reconstruct the global render exactly (displacement kept within
    the static window so the windowed reference is the plain render)."""
    ldi = make_ldi(rng)
    # ty=0.02 at fy=115, max disparity 0.5 -> |dy| <= ~1.2 rows < window 2.
    pose = translation_pose(np.array([[-0.2, 0.02, 0.0]], np.float32))
    mesh = make_spatial_mesh()
    out_s = render_forward_spatial(ldi, pose, mesh, zbuffer_scale=30.0,
                                   pallas_max_dy=2)
    out_g = render_forward(ldi, pose, zbuffer_scale=30.0, use_pallas="off")
    for k in ("rgb", "disparity", "coverage"):
        np.testing.assert_allclose(np.asarray(out_s[k]),
                                   np.asarray(out_g[k]),
                                   rtol=1e-5, atol=1e-5, err_msg=k)


@needs_mesh8
def test_spatial_window_matches_windowed_global(rng):
    """Motion EXCEEDING the window: spatial must equal the windowed global
    reference (splat_bilinear max_dy_window), not the unwindowed one."""
    from lsi_tpu.geometry import projection
    from lsi_tpu.utils.helpers import divide_safe

    ldi = make_ldi(rng)
    b, l, h, w, _ = ldi.textures.shape
    pose = translation_pose(np.array([[-0.1, 0.15, 0.0]], np.float32))
    max_dy = 2

    mesh = make_spatial_mesh()
    out_s = render_forward_spatial(ldi, pose, mesh, zbuffer_scale=30.0,
                                   pallas_max_dy=max_dy)

    # Global windowed reference, assembled exactly like render_forward.
    disp_bl = ldi.disparities.reshape(b * l, h, w, 1)
    rep = lambda m: jnp.repeat(m, l, axis=0)
    tc, td, valid = projection.forward_project(
        disp_bl, rep(ldi.intrinsics), rep(ldi.intrinsics), rep(pose))
    tc = tc.reshape(b, l * h, w, 2)
    td = td.reshape(b, l * h, w, 1)
    valid = valid.reshape(b, l * h, w, 1)
    d_shift = jnp.maximum(jnp.max(jnp.where(valid > 0, td, -jnp.inf),
                                  axis=(1, 2, 3), keepdims=True), 0.0)
    weights = jnp.exp(30.0 * (td - d_shift)) * valid
    payload = jnp.concatenate(
        [ldi.textures.astype(jnp.float32).reshape(b, l * h, w, 3), td], -1)
    accum, wsum = splat_bilinear(payload, tc, weights, (h, w),
                                 max_dy_window=max_dy)
    ref = divide_safe(accum, wsum, eps=0.0)

    np.testing.assert_allclose(np.asarray(out_s["rgb"]),
                               np.asarray(ref[..., :3]),
                               rtol=1e-5, atol=1e-5)
    # ... and it must DIFFER from the unwindowed render (the motion really
    # exceeded the window, otherwise this test is vacuous).
    out_unwin = render_forward(ldi, pose, zbuffer_scale=30.0,
                               use_pallas="off")
    assert np.abs(np.asarray(out_unwin["rgb"])
                  - np.asarray(out_s["rgb"])).max() > 1e-3


@needs_mesh8
def test_spatial_composes_with_data_axis(rng):
    """2-D ('data', 'space') mesh: batch and height shard independently."""
    ldi = make_ldi(rng, b=2)
    pose = translation_pose(
        np.tile(np.array([[-0.3, 0.0, 0.0]], np.float32), (2, 1)))
    devices = np.asarray(jax.devices()[:8]).reshape(2, 4)
    from jax.sharding import Mesh
    mesh = Mesh(devices, ("data", "space"))
    out_s = render_forward_spatial(ldi, pose, mesh, zbuffer_scale=30.0,
                                   pallas_max_dy=1)
    out_g = render_forward(ldi, pose, zbuffer_scale=30.0, use_pallas="off")
    np.testing.assert_allclose(np.asarray(out_s["rgb"]),
                               np.asarray(out_g["rgb"]),
                               rtol=1e-5, atol=1e-5)
    assert len(out_s["rgb"].sharding.device_set) == 8


@needs_mesh8
def test_spatial_rejects_thin_shards(rng):
    ldi = make_ldi(rng, h=16)  # 8 shards x 2 rows < pad
    pose = translation_pose(np.array([[-0.3, 0.0, 0.0]], np.float32))
    with pytest.raises(ValueError, match="halo pad"):
        render_forward_spatial(ldi, pose, make_spatial_mesh(),
                               pallas_max_dy=2)


@needs_mesh8
def test_spatial_render_is_differentiable(rng):
    """Gradients flow through the halo exchange into the LDI shards and
    match the global windowed render's gradients (lax local splat path)."""
    ldi = make_ldi(rng)
    pose = translation_pose(np.array([[-0.3, 0.0, 0.0]], np.float32))
    mesh = make_spatial_mesh()
    trg = jnp.asarray(rng.uniform(size=(1, 32, 128, 3)), jnp.float32)

    def loss_spatial(disp):
        l2 = LDI(textures=ldi.textures, disparities=disp,
                 intrinsics=ldi.intrinsics)
        out = render_forward_spatial(l2, pose, mesh, zbuffer_scale=30.0,
                                     pallas_max_dy=1)
        return jnp.mean((out["rgb"] - trg) ** 2)

    def loss_global(disp):
        l2 = LDI(textures=ldi.textures, disparities=disp,
                 intrinsics=ldi.intrinsics)
        out = render_forward(l2, pose, zbuffer_scale=30.0, use_pallas="off")
        return jnp.mean((out["rgb"] - trg) ** 2)

    vs, gs = jax.value_and_grad(loss_spatial)(ldi.disparities)
    vg, gg = jax.value_and_grad(loss_global)(ldi.disparities)
    np.testing.assert_allclose(float(vs), float(vg), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(gs), np.asarray(gg),
                               rtol=1e-4, atol=1e-6)


def _maybe_interpret():
    """Real Mosaic kernel on the chip, interpret mode elsewhere.

    Off-TPU the kernel only exists in interpret mode. On the chip the
    real kernel is both the stronger check (it is what production runs)
    and the only viable one: force_tpu_interpret_mode lowers the kernel
    body to a huge graph of per-element TPU ops whose remote compile
    exceeds the tunnel deadline (r4 suite: both tests died UNAVAILABLE
    mid-compile after ~25 min each; the Mosaic path compiles in seconds).
    """
    import contextlib
    from jax.experimental.pallas import tpu as pltpu
    if jax.default_backend() == "tpu":
        return contextlib.nullcontext()
    return pltpu.force_tpu_interpret_mode()


def test_kernel_fold_offset_matches_windowed_lax(rng):
    """The shard-local kernel contract (fold_h + base_offset, used by the
    TPU branch of the spatial render) matches the windowed lax oracle with
    the same base rows — forward and VJP. Interpret mode off-TPU (no
    shard_map: pallas interpret inside shard_map stalls on CPU); the real
    Mosaic kernel on the chip."""
    from lsi_tpu.kernels.splat_pallas import splat_pallas_diff

    b, l, hd, w, pad = 1, 2, 8, 128, 3
    out_h_local = hd + 2 * pad
    hs = l * hd
    vals = jnp.asarray(rng.uniform(size=(b, hs, w, 4)), jnp.float32)
    wts = jnp.asarray(rng.uniform(0.1, 1.0, (b, hs, w, 1)), jnp.float32)
    base = np.arange(hs) % hd + pad
    bx = np.broadcast_to(np.arange(w, dtype=np.float32), (b, hs, w))
    by = base[None, :, None] + rng.uniform(-2, 2, (b, hs, w))
    coords = jnp.asarray(
        np.stack([bx + rng.uniform(-9, 9, (b, hs, w)), by], -1), jnp.float32)

    def f_pallas(v):
        with _maybe_interpret():
            a, ws_ = splat_pallas_diff(v, coords, wts, (out_h_local, w),
                                       16, 1, 8, hd, pad)
        return a, ws_

    def f_lax(v):
        return splat_bilinear(v, coords, wts, (out_h_local, w),
                              max_dy_window=1,
                              base_rows=jnp.asarray(base, jnp.int32))

    a_p, w_p = f_pallas(vals)
    a_l, w_l = f_lax(vals)
    np.testing.assert_allclose(np.asarray(a_p), np.asarray(a_l),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(w_p), np.asarray(w_l),
                               rtol=1e-5, atol=1e-5)

    # VJP through the values: the custom backward honors the same base rows
    g_p = jax.grad(lambda v: jnp.sum(f_pallas(v)[0] ** 2))(vals)
    g_l = jax.grad(lambda v: jnp.sum(f_lax(v)[0] ** 2))(vals)
    np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_l),
                               rtol=1e-4, atol=1e-5)


def test_two_shard_pallas_halo_composition_manual(rng):
    """End-to-end proxy for the production multi-shard Pallas composition
    (VERDICT r2 weak #5): simulate render_forward_spatial's TPU branch —
    per-shard Pallas kernel (fold_h + base_offset contract; interpret mode
    off-TPU, real Mosaic kernel on the chip) + manual halo exchange +
    post-exchange normalize — over TWO shards without shard_map
    (interpret-mode pallas stalls inside shard_map on CPU), and require
    equality with the global windowed lax render. This exercises exactly
    the code path `use_pallas + shard_map + ndev>1` takes on a real pod,
    minus only the ppermute transport (replaced by the same strip adds it
    performs).
    """
    from lsi_tpu.geometry import projection
    from lsi_tpu.kernels.splat_pallas import splat_pallas_diff
    from lsi_tpu.utils.helpers import divide_safe

    b, l, h, w = 1, 2, 32, 128
    ndev, max_dy = 2, 2
    hd, pad = h // ndev, max_dy + 2
    ldi = make_ldi(rng, b=b, l=l, h=h, w=w)
    # vertical + horizontal motion so splats genuinely cross the boundary
    pose = translation_pose(np.array([[-0.2, 0.03, 0.0]], np.float32))

    # ---- global windowed reference (the Pallas kernel's semantic contract)
    disp_bl = ldi.disparities.reshape(b * l, h, w, 1)
    rep = lambda m: jnp.repeat(m, l, axis=0)
    tc_g, td_g, valid_g = projection.forward_project(
        disp_bl, rep(ldi.intrinsics), rep(ldi.intrinsics), rep(pose))
    tc_g = tc_g.reshape(b, l * h, w, 2)
    td_g = td_g.reshape(b, l * h, w, 1)
    valid_g = valid_g.reshape(b, l * h, w, 1)
    d_shift = jnp.maximum(jnp.max(jnp.where(valid_g > 0, td_g, -jnp.inf),
                                  axis=(1, 2, 3), keepdims=True), 0.0)
    weights_g = jnp.exp(30.0 * (td_g - d_shift)) * valid_g
    payload_g = jnp.concatenate(
        [ldi.textures.astype(jnp.float32).reshape(b, l * h, w, 3), td_g], -1)
    accum, wsum = splat_bilinear(payload_g, tc_g, weights_g, (h, w),
                                 max_dy_window=max_dy)
    ref = divide_safe(accum, wsum, eps=0.0)

    # ---- per-shard Pallas kernel + manual halo exchange
    shard_out = []
    for k in range(ndev):
        row0 = k * hd
        tex_k = ldi.textures[:, :, row0:row0 + hd]
        disp_k = ldi.disparities[:, :, row0:row0 + hd]
        disp_bl = disp_k.reshape(b * l, hd, w, 1)
        tc, td, valid = projection.forward_project(
            disp_bl, rep(ldi.intrinsics), rep(ldi.intrinsics), rep(pose),
            row_offset=row0)
        tc = tc.reshape(b, l * hd, w, 2)
        td = td.reshape(b, l * hd, w, 1)
        valid = valid.reshape(b, l * hd, w, 1)
        weights = jnp.exp(30.0 * (td - d_shift)) * valid  # global d_shift
        payload = jnp.concatenate(
            [tex_k.astype(jnp.float32).reshape(b, l * hd, w, 3), td], -1)
        local_coords = tc - jnp.asarray([0.0, 1.0], jnp.float32) * (
            row0 - pad)
        with _maybe_interpret():
            a_k, w_k = splat_pallas_diff(
                payload, local_coords, weights, (hd + 2 * pad, w),
                16, max_dy, 8, hd, pad)
        shard_out.append(jnp.concatenate([a_k, w_k], axis=-1))

    # halo exchange (what the two ppermutes add): bottom strip of shard k
    # -> top rows of shard k+1; top strip of shard k+1 -> bottom of shard k
    mids = []
    for k in range(ndev):
        out = shard_out[k]
        mid = out[:, pad:pad + hd]
        if k > 0:
            mid = mid.at[:, :pad].add(shard_out[k - 1][:, pad + hd:])
        if k < ndev - 1:
            mid = mid.at[:, hd - pad:].add(shard_out[k + 1][:, :pad])
        mids.append(mid)
    full = jnp.concatenate(mids, axis=1)  # (B, H, W, 5)
    composite = divide_safe(full[..., :4], full[..., 4:], eps=0.0)

    np.testing.assert_allclose(np.asarray(composite[..., :3]),
                               np.asarray(ref[..., :3]),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(full[..., 4:]),
                               np.asarray(wsum), rtol=1e-4, atol=1e-5)
