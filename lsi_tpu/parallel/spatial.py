"""Spatially-sharded LDI rendering: H-axis shards + halo exchange over ICI.

SURVEY.md §5 names image resolution as this framework's sequence-length
analogue; this module is the corresponding context-parallelism: the LDI (and
the rendered output) are sharded along the image HEIGHT across a device
mesh, each device splats only its own source rows, and the splat
contributions that cross shard boundaries — bounded by the render's static
vertical window — ride two neighbor `ppermute`s (XLA collectives over ICI),
exactly like a halo exchange in a stencil code.

Why this is exact: the windowed splat semantics (the production Pallas
kernel's contract, kernels/splat_pallas.py) bound every source pixel's
vertical reach to [-max_dy, max_dy + 2] rows of its base row, so a shard's
out-of-range contributions live entirely in a `pad = max_dy + 2`-row halo.
Each device splats into a locally padded target, the halo strips are
shipped to the neighbors and added, and the normalization (divide-safe)
happens after the exchange — bitwise the same accumulate-then-normalize as
the single-device render. The per-image soft z-buffer shift is a `pmax`
over the space axis, so weights also match the global render exactly.

When to use: resolutions whose full-image render (activations + padded
accumulators) pressures one chip's HBM, or latency-critical single-image
rendering — the data-parallel mesh (parallel/mesh.py) remains the right
axis for throughput training. Both compose: a 2-D ('data', 'space') mesh
shards batch and height independently (see tests/test_spatial.py).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from lsi_tpu.geometry import projection
from lsi_tpu.geometry.ldi import LDI, resolve_use_pallas
from lsi_tpu.ops.splat import splat_bilinear
from lsi_tpu.utils.helpers import divide_safe

SPACE_AXIS = "space"


def make_spatial_mesh(devices=None) -> Mesh:
    """1-D mesh over the image-height axis."""
    if devices is None:
        devices = jax.local_devices()
    return Mesh(np.asarray(devices), (SPACE_AXIS,))


def render_forward_spatial(ldi: LDI,
                           pose_src2trg: jnp.ndarray,
                           mesh: Mesh,
                           K_trg: Optional[jnp.ndarray] = None,
                           zbuffer_scale: float = 50.0,
                           pallas_max_dy: int = 2,
                           use_pallas="auto",
                           splat_method: str = "scatter"):
    """Height-sharded `render_forward` with halo exchange (same outputs).

    The LDI must live (or will be placed) H-sharded on ``mesh``; the
    returned rgb/disparity/coverage are H-sharded the same way. Semantics
    equal the windowed single-device render (the Pallas kernel's contract);
    off-TPU the local splat is the windowed lax oracle, so the equality is
    testable on a virtual CPU mesh.
    """
    b, l, h, w, _ = ldi.textures.shape
    ndev = mesh.shape[SPACE_AXIS]
    if h % ndev:
        raise ValueError(f"image height {h} not divisible by {ndev} shards")
    hd = h // ndev
    pad = pallas_max_dy + 2          # max vertical splat reach (+1 corner)
    if pad > hd:
        raise ValueError(
            f"halo pad {pad} exceeds shard height {hd}; use fewer shards "
            f"or a smaller pallas_max_dy")
    if K_trg is None:
        K_trg = ldi.intrinsics
    use_pal = resolve_use_pallas(use_pallas)

    def local_render(tex, disp, K_src, K_t, pose):
        # Local shapes: tex (Bl, L, Hd, W, 3) — Bl is the LOCAL batch (the
        # data axis, when present in the mesh, shards it independently).
        b = tex.shape[0]
        k = jax.lax.axis_index(SPACE_AXIS)
        row0 = k * hd

        disp_bl = disp.reshape(b * l, hd, w, 1)
        rep = lambda m: jnp.repeat(m, l, axis=0)
        # Projection in GLOBAL pixel coordinates (grid offset by the shard).
        tc, td, valid = projection.forward_project(
            disp_bl, rep(K_src), rep(K_t), rep(pose), row_offset=row0)
        tc = tc.reshape(b, l * hd, w, 2)
        td = td.reshape(b, l * hd, w, 1)
        valid = valid.reshape(b, l * hd, w, 1)

        # Soft z-buffer shift: the per-image max target disparity is a
        # GLOBAL statistic -> pmax over the space axis (it cancels in the
        # composite; the pmax only pins the weight scale, exactly like the
        # single-device render's per-image max).
        local_max = jnp.max(jnp.where(valid > 0, td, -jnp.inf),
                            axis=(1, 2, 3), keepdims=True)
        # all_gather+max instead of pmax: pmax has no differentiation rule
        # and this path must be trainable (the shift is a per-image scalar;
        # its gradient is cut — it cancels in the composite regardless).
        gathered = jax.lax.all_gather(local_max, SPACE_AXIS)
        d_shift = jax.lax.stop_gradient(
            jnp.maximum(jnp.max(gathered, axis=0), 0.0))
        zweight = jnp.exp(jnp.float32(zbuffer_scale)
                          * (td.astype(jnp.float32) - d_shift))
        weights = zweight * valid

        payload = jnp.concatenate(
            [tex.astype(jnp.float32).reshape(b, l * hd, w, 3), td], axis=-1)

        # Splat into the LOCAL padded target: rows [row0 - pad, row0+hd+pad)
        # in global coordinates; base row of source row r is r % hd + pad.
        shift = (jnp.asarray([0.0, 1.0], jnp.float32)
                 * (row0 - pad).astype(jnp.float32))
        local_coords = tc - shift
        out_h_local = hd + 2 * pad
        if use_pal:
            # Differentiable wrapper: gradients flow into the LDI shards
            # through the shard-local Pallas splat and back across the halo
            # exchange (ppermute transposes to the reverse permutation).
            from lsi_tpu.kernels.splat_pallas import (DEFAULT_MAX_DX,
                                                      splat_pallas_diff)
            accum, wsum = splat_pallas_diff(
                payload, local_coords, weights, (out_h_local, w),
                DEFAULT_MAX_DX, pallas_max_dy, 32, hd, pad)
        else:
            base = jnp.arange(l * hd, dtype=jnp.int32) % hd + pad
            accum, wsum = splat_bilinear(
                payload, local_coords, weights, (out_h_local, w),
                method=splat_method, max_dy_window=pallas_max_dy,
                base_rows=base)

        out = jnp.concatenate([accum, wsum], axis=-1)  # (B, Hd+2pad, W, 5)
        top = out[:, :pad]           # global rows [row0 - pad, row0)
        mid = out[:, pad:pad + hd]   # this shard's own rows
        bot = out[:, pad + hd:]      # global rows [row0 + hd, row0+hd+pad)

        # Halo exchange: neighbor contributions ride ICI ppermutes. The
        # non-circular perms drop the edge strips — exactly the rows the
        # global render crops (outside the image).
        fwd = [(i, i + 1) for i in range(ndev - 1)]
        bwd = [(i + 1, i) for i in range(ndev - 1)]
        from_prev = jax.lax.ppermute(bot, SPACE_AXIS, fwd)
        from_next = jax.lax.ppermute(top, SPACE_AXIS, bwd)
        mid = mid.at[:, :pad].add(from_prev)
        mid = mid.at[:, hd - pad:].add(from_next)

        # Normalize AFTER the exchange (same accumulate-then-divide as the
        # single-device render).
        composite = divide_safe(mid[..., :4], mid[..., 4:], eps=0.0)
        return composite[..., :3], composite[..., 3:4], mid[..., 4:]

    # Compose with data parallelism: if the mesh also has a 'data' axis
    # (2-D ('data', 'space') mesh), shard the batch over it independently.
    from lsi_tpu.parallel.mesh import DATA_AXIS
    batch_axis = DATA_AXIS if DATA_AXIS in mesh.axis_names else None
    if batch_axis is not None and b % mesh.shape[DATA_AXIS]:
        raise ValueError(
            f"batch {b} not divisible by data axis {mesh.shape[DATA_AXIS]}")
    spec_ldi = P(batch_axis, None, SPACE_AXIS, None, None)
    spec_cam = P(batch_axis)
    out_spec = P(batch_axis, SPACE_AXIS)
    # check_vma=False: pallas_call inside shard_map does not annotate its
    # outputs' varying-mesh-axes metadata; shardings are explicit here.
    fn = jax.shard_map(
        local_render, mesh=mesh,
        in_specs=(spec_ldi, spec_ldi, spec_cam, spec_cam, spec_cam),
        out_specs=(out_spec, out_spec, out_spec), check_vma=False)
    rgb, disparity, coverage = fn(ldi.textures, ldi.disparities,
                                  ldi.intrinsics, K_trg, pose_src2trg)
    return {"rgb": rgb, "disparity": disparity, "coverage": coverage}
