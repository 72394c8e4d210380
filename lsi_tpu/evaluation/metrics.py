"""Evaluation metrics: image quality (PSNR/SSIM) + depth accuracy.

Capability parity with the reference's eval scripts (view-synthesis error on
held-out pairs; depth accuracy of layer 0 vs GT on SYNTHIA — SURVEY.md §3.4).
Pure jax.numpy, jit/vmap-friendly.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax.numpy as jnp


def psnr(pred: jnp.ndarray, target: jnp.ndarray,
         mask: Optional[jnp.ndarray] = None, max_val: float = 1.0):
    """Peak signal-to-noise ratio over the batch (scalar, dB)."""
    err = (pred.astype(jnp.float32) - target.astype(jnp.float32)) ** 2
    if mask is not None:
        mse = jnp.sum(err * mask) / jnp.maximum(
            jnp.sum(mask) * err.shape[-1] / mask.shape[-1], 1e-8)
    else:
        mse = jnp.mean(err)
    return 10.0 * jnp.log10(max_val ** 2 / jnp.maximum(mse, 1e-12))


def _gaussian_kernel(size: int = 11, sigma: float = 1.5) -> jnp.ndarray:
    xs = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
    g = jnp.exp(-(xs ** 2) / (2 * sigma ** 2))
    g = g / jnp.sum(g)
    return g


def _filter2d(img: jnp.ndarray, k1d: jnp.ndarray) -> jnp.ndarray:
    """Separable 'valid' Gaussian filter on (B, H, W, C)."""
    size = k1d.shape[0]
    b, h, w, c = img.shape
    # horizontal then vertical 1-D convolutions via dot over sliding windows
    def conv_axis(x, axis):
        n = x.shape[axis]
        slices = [jnp.take(x, jnp.arange(i, n - size + 1 + i), axis=axis)
                  for i in range(size)]
        return sum(k1d[i] * slices[i] for i in range(size))
    return conv_axis(conv_axis(img, 1), 2)


def ssim(pred: jnp.ndarray, target: jnp.ndarray, max_val: float = 1.0,
         mask: Optional[jnp.ndarray] = None):
    """Mean SSIM over the batch, 11x11 Gaussian windows (standard constants).

    Inputs (B, H, W, C) in [0, max_val]; returns scalar.

    With ``mask`` (B, H, W, 1), window statistics are computed over valid
    pixels only (mask-renormalized means/variances, partial-convolution
    style) and each window's score is weighted by its valid mass — zeroed
    holes no longer depress local statistics, which made masked-image SSIM
    statistically wrong at hole boundaries.
    """
    c1 = (0.01 * max_val) ** 2
    c2 = (0.03 * max_val) ** 2
    k = _gaussian_kernel()
    x = pred.astype(jnp.float32)
    y = target.astype(jnp.float32)
    if mask is None:
        fmean = lambda z: _filter2d(z, k)
        weight = None
    else:
        m = mask.astype(jnp.float32)
        x = x * m
        y = y * m
        msum = _filter2d(m, k)  # (B, H', W', 1), in (0, 1]
        eps = 1e-8
        fmean = lambda z: _filter2d(z, k) / jnp.maximum(msum, eps)
        weight = msum
    mu_x = fmean(x)
    mu_y = fmean(y)
    mu_x2, mu_y2, mu_xy = mu_x ** 2, mu_y ** 2, mu_x * mu_y
    sigma_x = fmean(x * x) - mu_x2
    sigma_y = fmean(y * y) - mu_y2
    sigma_xy = fmean(x * y) - mu_xy
    score = ((2 * mu_xy + c1) * (2 * sigma_xy + c2)
             / ((mu_x2 + mu_y2 + c1) * (sigma_x + sigma_y + c2)))
    if weight is None:
        return jnp.mean(score)
    w = jnp.broadcast_to(weight, score.shape)
    return jnp.sum(score * w) / jnp.maximum(jnp.sum(w), 1e-8)


def depth_metrics(pred_disparity: jnp.ndarray, gt_disparity: jnp.ndarray,
                  valid: Optional[jnp.ndarray] = None
                  ) -> Dict[str, jnp.ndarray]:
    """Standard monocular-depth metrics on disparity maps (B, H, W, 1).

    abs_rel / rmse are computed in depth space; delta thresholds on the
    max-ratio. Pixels with invalid GT are masked.
    """
    if valid is None:
        valid = (gt_disparity > 1e-6).astype(jnp.float32)
    eps = 1e-6
    pred_d = 1.0 / jnp.maximum(pred_disparity, eps)
    gt_d = 1.0 / jnp.maximum(gt_disparity, eps)
    n = jnp.maximum(jnp.sum(valid), 1.0)

    abs_rel = jnp.sum(jnp.abs(pred_d - gt_d) / gt_d * valid) / n
    rmse = jnp.sqrt(jnp.sum((pred_d - gt_d) ** 2 * valid) / n)
    ratio = jnp.maximum(pred_d / gt_d, gt_d / pred_d)
    ratio = jnp.where(valid > 0, ratio, jnp.inf)

    def delta(t):
        return jnp.sum((ratio < t).astype(jnp.float32)) / n

    return {
        "abs_rel": abs_rel,
        "rmse": rmse,
        "delta_1.25": delta(1.25),
        "delta_1.25^2": delta(1.25 ** 2),
        "delta_1.25^3": delta(1.25 ** 3),
    }
