"""Small numeric helpers shared across the geometry / render stack.

Capability parity with the reference's ``lsi/nnutils/helpers.py`` (safe
division guarding the splat-weight normalization, soft z-buffer weight
helpers) — re-expressed for JAX. Everything here is pure, jit-safe, and
shape-polymorphic.
"""

from __future__ import annotations

import jax.numpy as jnp

# Epsilon used when normalizing splat accumulators by accumulated weight.
# f32-safe: weights are accumulated in f32 even under bf16 compute.
DEFAULT_EPS = 1e-8


def divide_safe(num: jnp.ndarray, den: jnp.ndarray, eps: float = DEFAULT_EPS):
    """``num / den`` that returns 0 where ``den`` is (near-)zero.

    Mirrors the reference's divide-safe idiom used to normalize scatter-add
    accumulators: pixels that received no splat weight produce 0, not inf/nan,
    and the gradient through those pixels is 0 as well.
    """
    den_ok = jnp.abs(den) > eps
    safe_den = jnp.where(den_ok, den, jnp.ones_like(den))
    return jnp.where(den_ok, num / safe_den, jnp.zeros_like(num))


def flatten_layers(x: jnp.ndarray) -> jnp.ndarray:
    """(B, L, H, W, C) -> (B*L, H, W, C): fold the layer axis into batch.

    The render core is written for (N, H, W, C) tensors; per-layer LDI work
    folds L into the batch so one vectorized pass handles all layers — this
    is the TPU-friendly replacement for the reference's per-layer Python
    loops.
    """
    b, l = x.shape[0], x.shape[1]
    return x.reshape((b * l,) + x.shape[2:])


def unflatten_layers(x: jnp.ndarray, num_layers: int) -> jnp.ndarray:
    """(B*L, ...) -> (B, L, ...): inverse of :func:`flatten_layers`."""
    bl = x.shape[0]
    b = bl // num_layers
    return x.reshape((b, num_layers) + x.shape[1:])


def log_stable_exp_weight(disparity: jnp.ndarray, scale: float,
                          d_ref: float = 1.0) -> jnp.ndarray:
    """Soft z-buffer weight ``exp(scale * (d - d_ref))`` computed in f32.

    ``d`` is disparity (inverse depth), so larger d == nearer == larger
    weight; dividing accumulated (w*c) by accumulated w realizes the
    soft z-buffer softmax of the paper (weights decaying with depth,
    temperature 1/scale). Subtracting the static reference disparity
    ``d_ref`` (the config's max disparity) keeps the argument <= 0 so the
    weight lives in (exp(-scale), 1] — no overflow at any scale, and with
    f32 accumulation no destructive underflow for scale <~ 80.

    Capability parity: the z-buffer weighting inside the reference's
    ``lsi/geometry/ldi.py`` soft compositing.
    """
    d32 = disparity.astype(jnp.float32)
    return jnp.exp(scale * (d32 - d_ref))
