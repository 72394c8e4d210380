"""Differentiable forward splatting (scatter-add) — lax reference path.

Capability parity with the reference's forward splat
(``lsi/geometry/sampling.py`` + ``lsi/geometry/ldi.py``: per-source-pixel
4-neighbor bilinear ``tf.scatter_nd`` accumulation, then divide-safe
normalization).

TPU-first design notes:
  * All four corner contributions are emitted as ONE flattened 1-D
    scatter-add over linearized (batch, y, x) target indices — XLA lowers a
    single deterministic scatter instead of 4 2-D scatter_nd ops; invalid or
    out-of-bounds contributions use index -1 with ``mode="drop"`` so there is
    no branching and no dynamic shape.
  * Values and weights are accumulated in float32 regardless of input dtype
    (bf16-safe), weight channel fused into the same scatter (C+1 channels).
  * An alternative sort + segment-sum path (`method="sort"`) gives XLA a
    sorted-indices segment reduction; benchmarked against the scatter path,
    and both serve as oracles for the Pallas kernel in
    ``lsi_tpu/kernels/splat_pallas.py``.
  * Gradients: linear in values/weights; flows into ``coords`` through the
    bilinear fractions (the integer floor carries none) — this is the main
    gradient path into predicted depth, verified against finite differences
    in tests/test_splat.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Bilinear fractions within MIN_FRACTION of an integer are snapped to it
# (see snap_fraction).
MIN_FRACTION = 1e-4


def snap_fraction(f: jnp.ndarray) -> jnp.ndarray:
    """Snap bilinear fractions within MIN_FRACTION of 0/1 to exactly 0/1.

    Op semantic (docs/parity.md): f32 rounding of near-integer projected
    coordinates yields ~1e-5 phantom fractions that soft z-buffer
    exp-weights can amplify above a neighboring pixel's own (much smaller)
    z-weight, bleeding color across depth edges. Snapping the *fraction*
    per axis (rather than clamping per-corner products) keeps the lax,
    numpy-oracle and Pallas implementations bit-identical in semantics.
    """
    f = jnp.where(f < MIN_FRACTION, 0.0, f)
    return jnp.where(f > 1.0 - MIN_FRACTION, 1.0, f)


def _corner_terms(coords: jnp.ndarray, out_h: int, out_w: int,
                  max_dy_window=None, base_rows=None):
    """Shared corner index/weight computation.

    Returns flat linear indices (4, N, P) into an (N*out_h*out_w) target and
    matching bilinear weights (4, N, P), with -1 indices for out-of-bounds
    corners (to be dropped by the scatter / segment sum).

    With ``max_dy_window`` set, corners whose target row lies outside
    [base - max_dy, base + max_dy + 1] of the source pixel's base row are
    dropped PER CORNER — the exact semantics of the Pallas kernel's static
    vertical window (kernels/splat_pallas.py), making this path its
    same-semantics oracle. ``base_rows`` overrides the base row per source
    row (defaults to the folded-row contract ``row % out_h``); the spatial
    halo-sharded render passes shard-local bases.
    """
    n, hs = coords.shape[0], coords.shape[1]
    x = coords[..., 0].astype(jnp.float32).reshape(n, -1)
    y = coords[..., 1].astype(jnp.float32).reshape(n, -1)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = snap_fraction(x - x0)
    fy = snap_fraction(y - y0)
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    if max_dy_window is not None:
        if base_rows is None:
            base_rows = jnp.arange(hs, dtype=jnp.int32) % out_h
        ws = coords.shape[2]
        base = jnp.broadcast_to(base_rows[None, :, None],
                                (n, hs, ws)).reshape(n, -1)

    batch_off = (jnp.arange(n, dtype=jnp.int32) * (out_h * out_w))[:, None]

    idxs = []
    wts = []
    for dy, dx, wgt in (
        (0, 0, (1.0 - fx) * (1.0 - fy)),
        (0, 1, fx * (1.0 - fy)),
        (1, 0, (1.0 - fx) * fy),
        (1, 1, fx * fy),
    ):
        yi = y0i + dy
        xi = x0i + dx
        inb = (xi >= 0) & (xi <= out_w - 1) & (yi >= 0) & (yi <= out_h - 1)
        if max_dy_window is not None:
            ky = yi - base
            inb &= (ky >= -max_dy_window) & (ky <= max_dy_window + 1)
        lin = batch_off + yi * out_w + xi
        idxs.append(jnp.where(inb, lin, -1))
        wts.append(wgt * inb)
    return jnp.stack(idxs), jnp.stack(wts)


def splat_bilinear(values: jnp.ndarray, coords: jnp.ndarray,
                   weights: jnp.ndarray, out_hw, method: str = "scatter",
                   max_dy_window=None, base_rows=None):
    """Forward-splat per-pixel values into a target image.

    Args:
      values:  (N, H, W, C) source values (e.g. RGB).
      coords:  (N, H, W, 2) target pixel [x, y] for each source pixel.
      weights: (N, H, W, 1) per-source-pixel weight (e.g. soft z-buffer
        weight x validity); contributions are ``w * bilinear_frac``.
      out_hw:  (out_h, out_w) target size.
      method:  "scatter" (single fused scatter-add) or "sort"
        (sort-by-target-index + segment_sum; fully deterministic layout).
      max_dy_window / base_rows: optional per-corner vertical window with
        the Pallas kernel's exact semantics (see ``_corner_terms``).
    Returns:
      accum:  (N, out_h, out_w, C) float32 sum of weighted values.
      w_sum:  (N, out_h, out_w, 1) float32 sum of weights.
    Normalize with ``divide_safe(accum, w_sum)``.
    """
    out_h, out_w = out_hw
    n, h, w, c = values.shape
    p = h * w

    vals32 = values.astype(jnp.float32).reshape(n, p, c)
    w32 = weights.astype(jnp.float32).reshape(n, p, 1)
    # Fuse the weight channel: scatter (w*v, w) together.
    payload = jnp.concatenate([vals32 * w32, w32], axis=-1)  # (N, P, C+1)

    idx4, wt4 = _corner_terms(coords, out_h, out_w,
                              max_dy_window=max_dy_window,
                              base_rows=base_rows)  # (4, N, P)

    flat_idx = idx4.reshape(-1)  # (4*N*P,)
    flat_payload = (payload[None] * wt4[..., None]).reshape(-1, c + 1)

    if method == "scatter":
        out = jnp.zeros((n * out_h * out_w, c + 1), jnp.float32)
        out = out.at[flat_idx].add(flat_payload, mode="drop")
    elif method == "sort":
        # Deterministic segment reduction: sort contributions by target index
        # (stable), then segment-sum with sorted indices. Index -1 (dropped)
        # sorts first into segment 0 of a shifted id space and is sliced off.
        order = jnp.argsort(flat_idx, stable=True)
        sidx = flat_idx[order] + 1  # -1 -> 0 (trash segment)
        spay = flat_payload[order]
        summed = jax.ops.segment_sum(
            spay, sidx, num_segments=n * out_h * out_w + 1,
            indices_are_sorted=True)
        out = summed[1:]
    else:
        raise ValueError(f"unknown splat method: {method!r}")

    out = out.reshape(n, out_h, out_w, c + 1)
    return out[..., :c], out[..., c:]
