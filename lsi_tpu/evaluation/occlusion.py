"""Occluded-region evaluation: does the LDI's hidden content hold up?

Capability parity with the reference's SYNTHIA occluded-layer evaluation
(SURVEY.md §3.4): measure rendered-depth accuracy specifically on target
pixels that are DISOCCLUDED — visible in the target view but hidden behind
foreground in the source view — i.e. the content that can only come from
the LDI's deeper layers. This isolates the "layered" part of layered scene
inference from plain monocular depth.

Disoccluded pixels are found geometrically: forward-splat the LDI's
*layer-0 surface only*; target pixels with (near-)zero layer-0 coverage
that the full render does cover were filled by deeper layers.
"""

from __future__ import annotations

from typing import Dict, Optional

import flax.struct  # noqa: F401  (LDI is a flax.struct pytree)
import jax.numpy as jnp

from lsi_tpu.evaluation.metrics import depth_metrics, psnr
from lsi_tpu.geometry.ldi import LDI, render_forward


def disocclusion_mask(ldi: LDI, pose_src2trg: jnp.ndarray,
                      out_hw=None, zbuffer_scale: float = 50.0,
                      use_pallas="auto",
                      pallas_max_dy: int = 2) -> jnp.ndarray:
    """(B, Ho, Wo, 1) float mask of target pixels NOT covered by layer 0."""
    layer0 = LDI(textures=ldi.textures[:, :1],
                 disparities=ldi.disparities[:, :1],
                 intrinsics=ldi.intrinsics)
    cov0 = render_forward(layer0, pose_src2trg, out_hw=out_hw,
                          zbuffer_scale=zbuffer_scale,
                          use_pallas=use_pallas,
                          pallas_max_dy=pallas_max_dy,
                          check_window=False)["coverage"]
    return (cov0 <= 0).astype(jnp.float32)


def occlusion_metrics(ldi: LDI, pose_src2trg: jnp.ndarray,
                      trg_gt_disparity: jnp.ndarray,
                      trg_gt_valid: Optional[jnp.ndarray] = None,
                      trg_image: Optional[jnp.ndarray] = None,
                      zbuffer_scale: float = 50.0,
                      use_pallas="auto",
                      pallas_max_dy: int = 2) -> Dict[str, jnp.ndarray]:
    """Depth (and optionally photometric) accuracy on disoccluded pixels.

    Args:
      ldi: predicted source-frame LDI.
      pose_src2trg: (B, 4, 4).
      trg_gt_disparity: (B, Ho, Wo, 1) target-view GT inverse depth
        (SYNTHIA provides depth for both stereo cameras).
      trg_gt_valid: optional GT validity mask.
      trg_image: optional (B, Ho, Wo, 3) target RGB for disoccluded PSNR.
    Returns dict with ``occ_*`` depth metrics over disoccluded+covered
    pixels, the disoccluded fraction, and ``occ_psnr`` when trg_image given.
    """
    out_hw = trg_gt_disparity.shape[1:3]
    out = render_forward(ldi, pose_src2trg, out_hw=out_hw,
                         zbuffer_scale=zbuffer_scale,
                         use_pallas=use_pallas,
                         pallas_max_dy=pallas_max_dy,
                         check_window=False)
    disocc = disocclusion_mask(ldi, pose_src2trg, out_hw=out_hw,
                               zbuffer_scale=zbuffer_scale,
                               use_pallas=use_pallas,
                               pallas_max_dy=pallas_max_dy)
    covered = (out["coverage"] > 0).astype(jnp.float32)
    mask = disocc * covered
    if trg_gt_valid is not None:
        mask = mask * trg_gt_valid

    dm = depth_metrics(out["disparity"], trg_gt_disparity, valid=mask)
    result = {f"occ_{k}": v for k, v in dm.items()}
    result["occ_fraction"] = jnp.mean(disocc)
    if trg_image is not None:
        result["occ_psnr"] = psnr(out["rgb"], trg_image, mask=mask)
    return result
