"""Bilinear gather sampling (inverse warping).

Capability parity with the reference's ``lsi/geometry/sampling.py``
(`tf.gather_nd`-based 4-neighbor bilinear interpolation with out-of-bounds
masking). TPU-first design notes:

  * One fused gather of the 4 neighbors via a single advanced-index lookup on
    a (N, H*W, C) flattened image — XLA lowers this to one gather op per
    corner that tiles well on TPU; no dynamic shapes anywhere.
  * Out-of-bounds handling is "zeros" semantics: coordinates are clamped for
    the memory access, and the bilinear weight of any corner that fell
    outside the image is zeroed, so out-of-image samples contribute 0 and a
    validity mask is returned (matches the reference's border semantics —
    see docs/parity.md).
  * Differentiable in both the image (linear) and the coordinates (through
    the bilinear fractions); the floor() itself carries no gradient.
"""

from __future__ import annotations

import jax.numpy as jnp


def bilinear_sample(image: jnp.ndarray, coords: jnp.ndarray):
    """Sample ``image`` at real-valued pixel coordinates.

    Args:
      image:  (N, H, W, C).
      coords: (N, Ho, Wo, 2) pixel [x, y] in the image's coordinate frame
        (pixel centers at integers).
    Returns:
      sampled: (N, Ho, Wo, C) bilinearly interpolated values; 0 outside.
      valid:   (N, Ho, Wo, 1) float32 — fraction of bilinear weight that fell
        inside the image (1 fully inside, 0 fully outside).
    """
    n, h, w, c = image.shape
    compute_dtype = image.dtype
    x = coords[..., 0].astype(jnp.float32)
    y = coords[..., 1].astype(jnp.float32)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0

    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    x1i = x0i + 1
    y1i = y0i + 1

    def inb(xi, yi):
        return ((xi >= 0) & (xi <= w - 1) & (yi >= 0) & (yi <= h - 1))

    # Corner weights, zeroed where the corner is outside the image.
    w00 = (1.0 - fx) * (1.0 - fy) * inb(x0i, y0i)
    w01 = fx * (1.0 - fy) * inb(x1i, y0i)
    w10 = (1.0 - fx) * fy * inb(x0i, y1i)
    w11 = fx * fy * inb(x1i, y1i)

    x0c = jnp.clip(x0i, 0, w - 1)
    x1c = jnp.clip(x1i, 0, w - 1)
    y0c = jnp.clip(y0i, 0, h - 1)
    y1c = jnp.clip(y1i, 0, h - 1)

    flat = image.reshape(n, h * w, c)

    def take(yi, xi):
        lin = yi * w + xi  # (N, Ho, Wo)
        out_shape = lin.shape
        lin2 = lin.reshape(n, -1)
        g = jnp.take_along_axis(flat, lin2[..., None], axis=1)
        return g.reshape(out_shape + (c,))

    sampled = (
        take(y0c, x0c) * w00[..., None].astype(compute_dtype)
        + take(y0c, x1c) * w01[..., None].astype(compute_dtype)
        + take(y1c, x0c) * w10[..., None].astype(compute_dtype)
        + take(y1c, x1c) * w11[..., None].astype(compute_dtype)
    )
    valid = (w00 + w01 + w10 + w11)[..., None]
    return sampled, valid


def resample(image: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """Convenience wrapper returning only the sampled values."""
    sampled, _ = bilinear_sample(image, coords)
    return sampled
