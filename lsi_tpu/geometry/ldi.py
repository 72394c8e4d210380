"""The LDI container and the differentiable LDI render core.

Capability parity with the reference's ``lsi/geometry/ldi.py``: the full
``render(ldi, pose)`` path — per-layer unproject -> rigid transform ->
project -> bilinear forward splat with soft z-buffer weights -> divide-safe
composite — plus the inverse-warp (gather) variant used by the view-synthesis
losses.

TPU-first design notes:
  * Layers are folded into the source *height* axis, so one (B, L*H, W)
    splat accumulates every layer of every batch element into its (B, Ho, Wo)
    target in a single fused scatter — the soft z-buffer blend happens
    implicitly through the exp(scale * disparity) weights sharing one
    normalization (single-pass formulation, SURVEY.md §3.3).
  * Rendering runs in float32 (weights span ~exp(-scale)); model compute may
    be bf16 upstream, the render boundary casts.
  * ``render_forward`` is vmap-able over poses (trajectory sweep) and fully
    differentiable end-to-end, including the depth -> projected-coordinate ->
    bilinear-fraction gradient path.
"""

from __future__ import annotations

import os
import warnings
from typing import Optional

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from lsi_tpu.geometry import projection
from lsi_tpu.ops.gather import bilinear_sample
from lsi_tpu.ops.splat import snap_fraction, splat_bilinear
from lsi_tpu.utils.helpers import divide_safe


def resolve_use_pallas(flag) -> bool:
    """Resolve a use_pallas config value ("auto" | "on" | "off" | bool).

    "auto" (the default) selects the fused Pallas splat kernel whenever the
    backend is TPU — it is the production path there (the XLA scatter this
    replaces executes serialized at ~16M updates/s on v5e, 70x slower; see
    docs/perf.md) — and the exact lax path elsewhere. An explicit "on"/True
    off-TPU additionally honors LSI_TPU_FORCE_PALLAS=1, which tests use to
    exercise the kernel on CPU in interpret mode.
    """
    if flag in (False, "off"):
        return False
    if flag == "auto":
        return jax.default_backend() == "tpu"
    if flag not in (True, "on"):
        raise ValueError(
            f"use_pallas must be 'auto'|'on'|'off'|bool, got {flag!r}")
    return (jax.default_backend() == "tpu"
            or bool(os.environ.get("LSI_TPU_FORCE_PALLAS")))


def _window_dropped_fraction(trg_coords: jnp.ndarray, valid: jnp.ndarray,
                             out_hw, max_dy: int) -> jnp.ndarray:
    """Fraction of valid, in-image splat contributions the Pallas kernel's
    static dy window would drop (scalar, f32, jit-safe).

    Counts the vertical-tent mass falling outside [-max_dy, max_dy + 1] rows
    of each source pixel's base row, over pixels that are valid and land
    horizontally inside the (padding-tracked) image.
    """
    out_h, out_w = out_hw
    hs = trg_coords.shape[1]
    x = trg_coords[..., 0].astype(jnp.float32)
    y = trg_coords[..., 1].astype(jnp.float32)
    y0 = jnp.floor(y)
    fy = snap_fraction(y - y0)
    base_row = (jnp.arange(hs, dtype=jnp.float32) % out_h)[None, :, None]
    ky = y0 - base_row
    kept = ((1.0 - fy) * ((ky >= -max_dy) & (ky <= max_dy + 1))
            + fy * ((ky + 1 >= -max_dy) & (ky + 1 <= max_dy + 1)))
    relevant = (valid[..., 0] > 0) & (x > -1.0) & (x < out_w)
    rel = relevant.astype(jnp.float32)
    total = jnp.maximum(jnp.sum(rel), 1.0)
    return jnp.sum(rel * (1.0 - kept)) / total


WINDOW_DROP_TOL = 1e-4


def warn_window_drop(frac, max_dy=None, tol: float = WINDOW_DROP_TOL) -> bool:
    """Host-side guard: warn loudly when the dy window truncated content.

    ``frac`` must be a CONCRETE value (the ``window_dropped_frac`` output of
    :func:`render_forward`, materialized). This is deliberately NOT a
    ``jax.debug.callback`` — the axon PJRT backend does not support host
    callbacks, so the diagnostic rides the render outputs as a regular
    on-device scalar and callers warn after pulling it to the host (the
    eager API, the Trainer's log step, the eval runner).

    Returns True iff a warning was emitted.
    """
    frac = float(np.max(np.asarray(frac)))
    if frac > tol:
        extra = f" (pallas_max_dy={max_dy})" if max_dy is not None else ""
        warnings.warn(
            f"Pallas splat dy-window{extra} dropped {frac:.4%} of valid "
            "splat contributions — the render is missing content. Raise "
            "render.pallas_max_dy (size it with "
            "kernels.splat_pallas.required_window) or set "
            "render.use_pallas='off'.", RuntimeWarning)
        return True
    return False


@flax.struct.dataclass
class LDI:
    """Layered Depth Image (layouts normative per BASELINE.json).

    Attributes:
      textures:    (B, L, H, W, 3) per-layer RGB in [0, 1].
      disparities: (B, L, H, W, 1) per-layer inverse depth, non-increasing
        across the layer axis (layer 0 = nearest, visible surface).
      intrinsics:  (B, 3, 3) pinhole K of the camera the LDI lives in.
    """
    textures: jnp.ndarray
    disparities: jnp.ndarray
    intrinsics: jnp.ndarray

    @property
    def batch(self) -> int:
        return self.textures.shape[0]

    @property
    def num_layers(self) -> int:
        return self.textures.shape[1]

    @property
    def height(self) -> int:
        return self.textures.shape[2]

    @property
    def width(self) -> int:
        return self.textures.shape[3]


def render_forward(ldi: LDI,
                   pose_src2trg: jnp.ndarray,
                   K_trg: Optional[jnp.ndarray] = None,
                   out_hw=None,
                   zbuffer_scale: float = 50.0,
                   max_disparity: float = 1.0,
                   splat_method: str = "scatter",
                   use_pallas="auto",
                   pallas_max_dy: int = 2,
                   check_window: bool = True):
    """Render an LDI into a novel view by forward splatting.

    Args:
      ldi: source-frame LDI.
      pose_src2trg: (B, 4, 4) rigid transform source cam -> target cam.
      K_trg: (B, 3, 3) target intrinsics; defaults to the LDI's.
      out_hw: (Ho, Wo) target size; defaults to the LDI's (H, W).
      zbuffer_scale: soft z-buffer sharpness (weight = exp(scale * (d - d_ref));
        larger -> harder visibility; gradients flow to all layers).
      max_disparity: unused legacy knob (weight stability is handled by a
        dynamic per-image shift that cancels in the composite); kept for
        signature stability.
      splat_method: "scatter" | "sort" (see ops/splat.py).
      use_pallas: "auto" (Pallas on TPU, lax elsewhere — the default),
        "on"/True, or "off"/False; see :func:`resolve_use_pallas`.
      pallas_max_dy: static vertical splat window of the Pallas kernel.
      check_window: when the Pallas path is taken, also compute the
        fraction of valid content the dy window drops and return it as
        ``window_dropped_frac`` — over-rotated poses become observable
        instead of silently truncating (callers warn via
        :func:`warn_window_drop`; host callbacks are unsupported on axon).
    Returns dict with:
      rgb:       (B, Ho, Wo, 3) composited target image (f32).
      disparity: (B, Ho, Wo, 1) composited target inverse depth.
      coverage:  (B, Ho, Wo, 1) accumulated splat weight (0 = hole).
      window_dropped_frac: () f32 — fraction of valid in-image splat
        contributions dropped by the Pallas dy window (always 0.0 on the
        exact lax path).
    """
    b, l, h, w, _ = ldi.textures.shape
    if K_trg is None:
        K_trg = ldi.intrinsics
    if out_hw is None:
        out_hw = (h, w)

    # Per-layer correspondences: fold L into batch for the projective math,
    # then immediately into the source-height axis for everything else —
    # the whole pipeline below runs on 4-D (B, L*H, W, C) tensors (5-D
    # intermediates provoke pathological layouts on TPU).
    disp_bl = ldi.disparities.reshape(b * l, h, w, 1)
    rep = lambda m: jnp.repeat(m, l, axis=0)
    trg_coords, trg_disp, valid = projection.forward_project(
        disp_bl, rep(ldi.intrinsics), rep(K_trg), rep(pose_src2trg))

    trg_coords = trg_coords.reshape(b, l * h, w, 2)
    trg_disp = trg_disp.reshape(b, l * h, w, 1)
    valid = valid.reshape(b, l * h, w, 1)

    # Soft z-buffer weight in the *target* frame (nearer => heavier), fused
    # with the validity mask; single normalization realizes the blend. The
    # exp argument is shifted by the per-image max target disparity — the
    # shift cancels exactly in accum/wsum (numerator and denominator share
    # the factor), so it changes nothing mathematically but keeps the
    # largest weight at exactly 1.0, preventing f32 underflow of the whole
    # accumulator for any zbuffer_scale.
    d_shift = jax.lax.stop_gradient(
        jnp.max(jnp.where(valid > 0, trg_disp, -jnp.inf),
                axis=(1, 2, 3), keepdims=True))
    d_shift = jnp.maximum(d_shift, 0.0)  # guard: image with no valid pixels
    zweight = jnp.exp(
        jnp.float32(zbuffer_scale) * (trg_disp.astype(jnp.float32) - d_shift))
    weights = zweight * valid

    # One splat for all layers (source row r of layer l maps to target row
    # r % h; indices come from trg_coords, so source layout is free).
    payload = jnp.concatenate(
        [ldi.textures.astype(jnp.float32).reshape(b, l * h, w, 3),
         trg_disp], axis=-1)  # (B, L*H, W, 4)
    use_pallas = resolve_use_pallas(use_pallas)
    if use_pallas and tuple(out_hw) != (h, w):
        # The kernel's folded-row contract (source row r belongs to target
        # base row r % out_h, dy window measured from there) only holds when
        # the output grid matches the LDI's; resampling renders take the
        # exact lax path instead of silently windowing against wrong rows.
        use_pallas = False
    dropped = jnp.zeros((), jnp.float32)
    if use_pallas:
        from lsi_tpu.kernels.splat_pallas import (DEFAULT_MAX_DX,
                                                  splat_pallas_diff)
        if check_window:
            dropped = _window_dropped_fraction(
                jax.lax.stop_gradient(trg_coords),
                jax.lax.stop_gradient(valid), out_hw, pallas_max_dy)
        accum, wsum = splat_pallas_diff(
            payload, trg_coords, weights,
            out_hw, DEFAULT_MAX_DX, pallas_max_dy, 32)
    else:
        accum, wsum = splat_bilinear(
            payload, trg_coords, weights, out_hw, method=splat_method)

    # Exact >0 test: shifted weights can be astronomically small for
    # heavily-occluded layers yet still meaningful after normalization.
    out = divide_safe(accum, wsum, eps=0.0)
    return {
        "rgb": out[..., :3],
        "disparity": out[..., 3:4],
        "coverage": wsum,
        "window_dropped_frac": dropped,
    }


def project_layers_folded(ldi: LDI, pose_src2trg: jnp.ndarray,
                          K_trg: Optional[jnp.ndarray] = None):
    """Per-layer target correspondences on folded (B*L, H, W, ·) tensors.

    Returns (trg_coords (B*L,H,W,2), trg_disp (B*L,H,W,1),
    in_front (B*L,H,W,1)).
    """
    b, l, h, w, _ = ldi.textures.shape
    if K_trg is None:
        K_trg = ldi.intrinsics
    disp_bl = ldi.disparities.reshape(b * l, h, w, 1)
    rep = lambda m: jnp.repeat(m, l, axis=0)
    return projection.forward_project(
        disp_bl, rep(ldi.intrinsics), rep(K_trg), rep(pose_src2trg))


def gather_target_per_layer_folded(ldi: LDI,
                                   target_image: jnp.ndarray,
                                   pose_src2trg: jnp.ndarray,
                                   K_trg: Optional[jnp.ndarray] = None,
                                   use_pallas="off",
                                   pallas_max_dy: int = 2):
    """Folded (B*L, H, W, C) variant of :func:`gather_target_per_layer`.

    The loss hot path uses this form: all elementwise work stays on 4-D
    tensors (5-D intermediates provoke pathological TPU layouts); callers
    reshape only the (small) reduction input back to (B, L, ...).

    With ``use_pallas`` resolved on (TPU), the 4-corner XLA gather is
    replaced by the tent-matmul MXU kernel (kernels/gather_pallas.py):
    one kernel produces the samples, the valid mass AND the coordinate
    gradient factors, and the target image is never repeated per layer.
    Samples whose vertical displacement exceeds ``pallas_max_dy`` rows are
    dropped (value and valid) — same static window + same
    ``window_dropped_frac`` diagnostic as the splat direction.
    """
    b, l, h, w = ldi.textures.shape[:4]
    trg_coords, trg_disp, in_front = project_layers_folded(
        ldi, pose_src2trg, K_trg)
    if (resolve_use_pallas(use_pallas)
            and target_image.shape[1:3] == (h, w)):
        from lsi_tpu.kernels.gather_pallas import gather_pallas_diff
        from lsi_tpu.kernels.splat_pallas import DEFAULT_MAX_DX
        coords_f = trg_coords.reshape(b, l * h, w, 2)
        sampled, in_bounds = gather_pallas_diff(
            target_image.astype(jnp.float32), coords_f,
            DEFAULT_MAX_DX, pallas_max_dy, 64)
        sampled = sampled.reshape(b * l, h, w, -1)
        in_bounds = in_bounds.reshape(b * l, h, w, 1)
    else:
        trg_rep = jnp.repeat(target_image, l, axis=0)  # (B*L, Ht, Wt, 3)
        sampled, in_bounds = bilinear_sample(trg_rep, trg_coords)
    return sampled, in_front * in_bounds, trg_disp


def gather_target_per_layer(ldi: LDI,
                            target_image: jnp.ndarray,
                            pose_src2trg: jnp.ndarray,
                            K_trg: Optional[jnp.ndarray] = None):
    """Inverse-warp path: sample the target image at each layer's projection.

    For every source pixel and layer, computes where that layer's surface
    lands in the target view and bilinearly gathers the target color there.
    This is the reference's gather-based view-synthesis direction (loss is
    evaluated in the source frame, per layer — enabling the min-over-layers
    photometric loss without any scatter).

    Returns:
      sampled: (B, L, H, W, 3) target colors at each layer's correspondence.
      valid:   (B, L, H, W, 1) in-bounds & in-front mask (float32).
      trg_disp:(B, L, H, W, 1) per-layer disparity in the target frame.
    """
    b, l, h, w, _ = ldi.textures.shape
    sampled, valid, trg_disp = gather_target_per_layer_folded(
        ldi, target_image, pose_src2trg, K_trg)

    sampled = sampled.reshape(b, l, h, w, 3)
    valid = valid.reshape(b, l, h, w, 1)
    return sampled, valid, trg_disp.reshape(b, l, h, w, 1)
