"""Pallas TPU bilinear gather (inverse warp) via tent-matmuls on the MXU.

Why this exists: the inverse-warp photometric loss's hot op is a 4-corner
``take_along_axis`` gather (``ops/gather.py``), and XLA TPU gathers on this
platform serialize much like its scatters (docs/perf.md §1/§7) — after the
splat VJP was fixed, the gather direction dominated the flagship
``photo_mode="both"`` train step.

The kernel work is already built: ``splat_pallas_bwd_sums`` computes, for a
resident padded image column tile and folded source-row coordinates,

    S0[ch, i] = sum_dy rw(dy)  * sum_c tent(c - x_i)  * img[r+dy, ch, c]
    SX[ch, i] = sum_dy rw(dy)  * sum_c tent'(c - x_i) * img[r+dy, ch, c]
    SY[ch, i] = sum_dy rw'(dy) * sum_c tent(c - x_i)  * img[r+dy, ch, c]

— and S0 *is* the bilinear gather of the image at the coordinates, with SX
and SY the coordinate-gradient factors, all from one MXU contraction per
source row. Appending a ones channel to the image makes its S0 the gathered
in-bounds weight mass — exactly the ``valid`` output of the lax oracle
(``ops/gather.bilinear_sample`` zeros-out-of-bounds semantics).

The VJP: d_coords is elementwise from (SX, SY); d_image is the transposed
gather — i.e. the forward splat — so it reuses ``splat_pallas``. When the
image is not differentiated (the usual case: it is the observed target
view), XLA dead-code-eliminates that splat from the jitted program.

Semantics vs the lax oracle (both asserted in tests/test_gather_pallas.py):
  * identical zeros-OOB values/valid within the vertical window;
  * contributions whose displacement from the source row's base row
    (``row % image_height``; layers folded into rows) exceeds the static
    ``max_dy`` window are DROPPED (value and valid) — same windowing, same
    ``window_dropped_frac`` diagnostic applicability as the splat;
  * coordinate fractions are snapped near integers (``snap_fraction``), so
    values differ by <=1e-4-scale there and fraction gradients have the
    same dead zones as the Pallas splat path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from lsi_tpu.kernels.splat_pallas import (DEFAULT_MAX_DX, DEFAULT_MAX_DY,
                                          splat_pallas,
                                          splat_pallas_bwd_sums)


def _interpret_off_tpu(fn, *args, **kw):
    """Run a kernel wrapper in interpret mode when no TPU is attached —
    custom_vjp forward/backward are traced outside any caller-side
    force_tpu_interpret_mode context (same pattern as splat_pallas._bwd)."""
    if jax.default_backend() != "tpu":
        with pltpu.force_tpu_interpret_mode():
            return fn(*args, **kw)
    return fn(*args, **kw)


def _fwd_impl(image, coords, max_dx, max_dy, block_rows):
    n, ho, wo, c = image.shape
    ones = jnp.ones((n, ho, wo, 1), jnp.float32)
    payload = jnp.concatenate([image.astype(jnp.float32), ones], axis=-1)
    s = _interpret_off_tpu(
        splat_pallas_bwd_sums, payload, coords, (ho, wo),
        max_dx=max_dx, max_dy=max_dy,
        block_rows=block_rows)                    # (N, Hs, 3, C+1, Ws)
    s0, sx, sy = s[:, :, 0], s[:, :, 1], s[:, :, 2]   # (N, Hs, C1, Ws)
    sampled = jnp.moveaxis(s0[:, :, :c], -2, -1).astype(image.dtype)
    valid = jnp.moveaxis(s0[:, :, c:], -2, -1)        # (N, Hs, Ws, 1) f32
    return sampled, valid, sx, sy


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def gather_pallas_diff(image, coords,
                       max_dx: int = DEFAULT_MAX_DX,
                       max_dy: int = DEFAULT_MAX_DY,
                       block_rows: int = 32):
    """Bilinear-gather ``image`` at folded-row ``coords`` (MXU kernel).

    Args:
      image:  (N, Ho, Wo, C) values to sample (e.g. the target view).
      coords: (N, Hs, Ws, 2) pixel [x, y] into the image; Hs must be a
        multiple of Ho (layers folded into rows: source row r samples
        within ``max_dy`` rows of base row ``r % Ho``).
      max_dx / max_dy: static horizontal margin / vertical window
        (see kernels/splat_pallas.py — same contract).
    Returns:
      sampled: (N, Hs, Ws, C) interpolated values; 0 outside image/window.
      valid:   (N, Hs, Ws, 1) f32 in-bounds-and-in-window weight mass.
    """
    sampled, valid, _, _ = _fwd_impl(image, coords, max_dx, max_dy,
                                     block_rows)
    return sampled, valid


def _fwd(image, coords, max_dx, max_dy, block_rows):
    sampled, valid, sx, sy = _fwd_impl(image, coords, max_dx, max_dy,
                                       block_rows)
    return (sampled, valid), (image, coords, sx, sy)


def _bwd(max_dx, max_dy, block_rows, res, cot):
    image, coords, sx, sy = res
    g_sampled, g_valid = cot              # (N,Hs,Ws,C), (N,Hs,Ws,1)
    n, ho, wo, c = image.shape

    # Coordinate gradients: elementwise contraction of the cotangents with
    # the tent-derivative factors, in the kernel's channel-minor layout.
    gm = jnp.concatenate(
        [jnp.moveaxis(g_sampled.astype(jnp.float32), -1, -2),
         jnp.moveaxis(g_valid.astype(jnp.float32), -1, -2)],
        axis=2)                           # (N, Hs, C1, Ws)
    gx = jnp.sum(gm * sx, axis=2)
    gy = jnp.sum(gm * sy, axis=2)
    d_coords = jnp.stack([gx, gy], axis=-1).astype(coords.dtype)

    # d_image = transposed gather = forward splat of the value cotangent.
    # (The valid output does not depend on image values — no term from it.)
    # Dead-code-eliminated by XLA whenever the image is not differentiated.
    ones_w = jnp.ones(g_sampled.shape[:-1] + (1,), jnp.float32)
    accum, _ = _interpret_off_tpu(
        splat_pallas, g_sampled.astype(jnp.float32), coords, ones_w,
        (ho, wo), max_dx=max_dx, max_dy=max_dy, block_rows=block_rows)
    d_image = accum.astype(image.dtype)
    return d_image, d_coords


gather_pallas_diff.defvjp(_fwd, _bwd)
