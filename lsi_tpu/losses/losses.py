"""Training losses: view synthesis, smoothness, depth supervision.

Capability parity with the reference's ``lsi/loss/loss.py``:
  * view-synthesis photometric L1 with the paper's per-pixel **min over
    layers** (so layers specialize: every source pixel must be photometrically
    explained by at least one layer, and occluded layers are not penalized
    for disagreeing) — evaluated in the gather (inverse-warp) direction;
  * photometric L1 on the forward-splat composite against the target image
    (the scatter direction, masked by splat coverage);
  * (edge-aware) disparity smoothness regularization;
  * optional direct depth supervision for datasets with GT depth (SYNTHIA).

All losses are plain jit-differentiable functions fused into the same XLA
program as the render — there is no loss/render graph boundary.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp

from lsi_tpu.config import LossConfig, RenderConfig
from lsi_tpu.geometry.ldi import (LDI, gather_target_per_layer_folded,
                                  render_forward)
from lsi_tpu.utils.helpers import divide_safe


def _charbonnier(x: jnp.ndarray, eps: float = 1e-4) -> jnp.ndarray:
    """Smooth L1; gradient-stable at 0 (used instead of |x| for training)."""
    return jnp.sqrt(x * x + eps * eps)


def view_synthesis_inverse_warp(ldi: LDI, target_image: jnp.ndarray,
                                pose_src2trg: jnp.ndarray,
                                K_trg=None,
                                min_over_layers: bool = True,
                                candidate_radius: int = 0,
                                layer0_margin: float = 0.0,
                                render_cfg: RenderConfig = RenderConfig(),
                                return_diag: bool = False):
    """Gather-direction photometric loss, per-pixel min over layers.

    For each source pixel and each layer, samples the target image at that
    layer's projected location and compares with the layer's texture. Invalid
    samples (out of view) get a large error so the min ignores them, and
    pixels invalid in every layer are masked out entirely.

    With ``candidate_radius`` r > 0, the error is additionally the min over
    the (2r+1)^2 integer-offset CANDIDATE samples around each projected
    location — the reference's "min over candidate source pixels" variant
    (SURVEY.md §2 Losses row), which forgives sub-pixel correspondence /
    calibration error at the cost of (2r+1)^2 gathers.
    """
    from lsi_tpu.geometry.ldi import project_layers_folded
    from lsi_tpu.ops.gather import bilinear_sample

    b, l, h, w, _ = ldi.textures.shape
    # Elementwise work stays on folded 4-D tensors (TPU layouts); only the
    # tiny per-pixel error map is reshaped to 5-D for the layer reduction.
    tex = ldi.textures.astype(jnp.float32).reshape(b * l, h, w, 3)
    big = jnp.asarray(1e3, jnp.float32)
    if candidate_radius > 0:
        from lsi_tpu.geometry.ldi import resolve_use_pallas
        trg_coords, _, in_front = project_layers_folded(
            ldi, pose_src2trg, K_trg)
        r = candidate_radius
        # Candidate gathers via the tent-matmul kernel on TPU (each offset
        # is one kernel call; the window must absorb the vertical offsets)
        # or the lax 4-corner gather elsewhere.
        pallas_ok = (resolve_use_pallas(render_cfg.use_pallas)
                     and target_image.shape[1:3] == (h, w))
        if pallas_ok:
            from lsi_tpu.kernels.gather_pallas import gather_pallas_diff
            from lsi_tpu.kernels.splat_pallas import DEFAULT_MAX_DX
            coords_f = trg_coords.reshape(b, l * h, w, 2)
            trg32 = target_image.astype(jnp.float32)

            def sample(off):
                s, v = gather_pallas_diff(
                    trg32, coords_f + off, DEFAULT_MAX_DX,
                    render_cfg.pallas_max_dy + r, 32)
                return (s.reshape(b * l, h, w, 3),
                        v.reshape(b * l, h, w, 1))
        else:
            trg_rep = jnp.repeat(target_image, l, axis=0)

            def sample(off):
                return bilinear_sample(trg_rep, trg_coords + off)

        err_masked = None
        valid = None
        for dy in range(-r, r + 1):
            for dx in range(-r, r + 1):
                off = jnp.asarray([dx, dy], jnp.float32)
                sampled, inb = sample(off)
                v = in_front * inb
                e = jnp.mean(_charbonnier(sampled - tex), -1, keepdims=True)
                e = jnp.where(v > 0.5, e, big)
                err_masked = e if err_masked is None else \
                    jnp.minimum(err_masked, e)
                valid = v if valid is None else jnp.maximum(valid, v)
        err_masked = err_masked.reshape(b, l, h, w, 1)
    else:
        sampled, valid, _ = gather_target_per_layer_folded(
            ldi, target_image, pose_src2trg, K_trg,
            use_pallas=render_cfg.use_pallas,
            pallas_max_dy=render_cfg.pallas_max_dy)
        err = jnp.mean(_charbonnier(sampled - tex),
                       axis=-1, keepdims=True)  # (B*L, H, W, 1)
        err_masked = jnp.where(valid > 0.5, err, big).reshape(b, l, h, w, 1)
    valid = valid.reshape(b, l, h, w, 1)
    if min_over_layers:
        if layer0_margin > 0.0 and l > 1:
            # Handicap deep layers by +margin so they win the min only when
            # they beat layer-0 by more than the margin (see
            # LossConfig.min_layer0_margin): pixels where a hidden layer is
            # merely EQUALLY photometric stay layer-0's job, keeping its
            # depth constrained there. The margin is constant w.r.t. params,
            # so gradients are untouched except for the argmin routing.
            is_deep = (jnp.arange(l) > 0)[None, :, None, None, None]
            err_masked = jnp.where(is_deep, err_masked + layer0_margin,
                                   err_masked)
        per_pixel = jnp.min(err_masked, axis=1)  # (B, H, W, 1)
    else:
        per_pixel = divide_safe(
            jnp.sum(jnp.where(valid > 0.5, err_masked, 0.0), axis=1),
            jnp.sum(valid, axis=1))
    any_valid = jnp.max(valid, axis=1)
    per_pixel = jnp.where(any_valid > 0.5, per_pixel, 0.0)
    loss = divide_safe(jnp.sum(per_pixel), jnp.sum(any_valid))
    if not return_diag:
        return loss
    # Gather-direction dy-window diagnostic (only meaningful when the
    # Pallas gather is engaged — the lax path has no window). Same signal
    # as the splat direction's; XLA CSEs the shared projection.
    diag = {}
    from lsi_tpu.geometry.ldi import (_window_dropped_fraction,
                                      resolve_use_pallas)
    if (render_cfg.window_check and candidate_radius == 0
            and resolve_use_pallas(render_cfg.use_pallas)
            and target_image.shape[1:3] == (h, w)):
        import jax

        from lsi_tpu.geometry.ldi import project_layers_folded
        trg_coords, _, in_front = jax.lax.stop_gradient(
            project_layers_folded(ldi, pose_src2trg, K_trg))
        diag["window_dropped_frac"] = _window_dropped_fraction(
            trg_coords.reshape(b, l * h, w, 2),
            in_front.reshape(b, l * h, w, 1),
            (h, w), render_cfg.pallas_max_dy)
    return loss, diag


def view_synthesis_splat(ldi: LDI, target_image: jnp.ndarray,
                         pose_src2trg: jnp.ndarray,
                         render_cfg: RenderConfig,
                         K_trg=None, ssim_weight: float = 0.0,
                         return_diag: bool = False):
    """Scatter-direction photometric loss on the soft-z composite render.

    With ``ssim_weight`` alpha > 0, uses the monodepth-style mix
    alpha * (1 - SSIM)/2 + (1 - alpha) * charbonnier (structure-aware term
    on top of the reference's plain photometric loss).

    With ``return_diag``, returns (loss, diagnostics) where diagnostics
    carries the render's ``window_dropped_frac`` (Pallas dy-window safety
    signal, surfaced in the Trainer's metrics).
    """
    out = render_forward(
        ldi, pose_src2trg, K_trg=K_trg,
        out_hw=target_image.shape[1:3],
        zbuffer_scale=render_cfg.zbuffer_scale,
        splat_method=render_cfg.splat_method,
        use_pallas=render_cfg.use_pallas,
        pallas_max_dy=render_cfg.pallas_max_dy,
        check_window=render_cfg.window_check)
    covered = (out["coverage"] > 0).astype(jnp.float32)
    trg32 = target_image.astype(jnp.float32)
    err = jnp.mean(_charbonnier(out["rgb"] - trg32), axis=-1, keepdims=True)
    photo = divide_safe(jnp.sum(err * covered), jnp.sum(covered))
    if ssim_weight > 0.0:
        from lsi_tpu.evaluation.metrics import ssim
        structural = (1.0 - ssim(out["rgb"], trg32, mask=covered)) / 2.0
        photo = ssim_weight * structural + (1.0 - ssim_weight) * photo
    if return_diag:
        return photo, {"window_dropped_frac": out["window_dropped_frac"]}
    return photo


def disparity_smoothness(ldi: LDI, edge_aware: bool = True,
                         edge_gate_deep: bool = True) -> jnp.ndarray:
    """First-order disparity smoothness, optionally edge-aware.

    Edge-aware variant downweights the penalty across image edges of the
    layer-0 texture (exp(-|∇I|)), the standard monodepth idiom matching the
    reference's smoothness regularizer in spirit.

    With ``edge_gate_deep=False``, the edge gate applies to layer 0 ONLY and
    hidden layers (>= 1) keep the plain penalty: a hidden surface has no
    observed texture edges, and the occluder boundary — exactly where the
    visible image has a strong edge — is where hidden-layer disparity must
    stay smooth to continue the background behind the occluder. Gating deep
    layers by visible edges licenses depth cliffs there (measured against
    disoccluded-depth abs_rel; BASELINE.md round-3 experiments).
    """
    d = ldi.disparities[..., 0]  # (B, L, H, W)
    dx = jnp.abs(d[..., :, 1:] - d[..., :, :-1])
    dy = jnp.abs(d[..., 1:, :] - d[..., :-1, :])
    if edge_aware:
        img = ldi.textures[:, 0].astype(jnp.float32)  # (B, H, W, 3)
        gx = jnp.mean(jnp.abs(img[:, :, 1:] - img[:, :, :-1]), -1)
        gy = jnp.mean(jnp.abs(img[:, 1:, :] - img[:, :-1, :]), -1)
        wx = jnp.exp(-10.0 * gx)[:, None]
        wy = jnp.exp(-10.0 * gy)[:, None]
        if not edge_gate_deep and d.shape[1] > 1:
            # Broadcast the gate onto layer 0 only; deep layers get 1.0.
            l = d.shape[1]
            layer_is_0 = (jnp.arange(l) == 0)[None, :, None, None]
            wx = jnp.where(layer_is_0, wx, 1.0)
            wy = jnp.where(layer_is_0, wy, 1.0)
        dx = dx * wx
        dy = dy * wy
    return jnp.mean(dx) + jnp.mean(dy)


def depth_consistency(ldi_src: LDI, ldi_trg: LDI,
                      pose_src2trg: jnp.ndarray,
                      render_cfg: RenderConfig,
                      K_trg=None,
                      stop_target: bool = False,
                      disocc_only: bool = False,
                      visible_only: bool = False,
                      deep_only: bool = False) -> jnp.ndarray:
    """Cross-view depth consistency (one direction): the SURVEY §2 term.

    Forward-splats the SOURCE LDI's disparity into the target frame and
    penalizes disagreement with the TARGET prediction's layer-0 disparity,
    masked to rendered coverage. This ties the two views' geometry together:

      * visible surfaces: the photometrically-preferred target geometry
        anchors the source layer-0 against drift (abs_rel degrading while
        PSNR improves — BASELINE.md r2 drift table);
      * disoccluded surfaces: content hidden in the source is layer-0
        *observed* in the target, so the target prediction transfers a real
        photometric constraint onto the source's DEEP layers — the only
        direct supervision hidden-surface geometry gets from two views.

    Args:
      stop_target: treat the target prediction as a stop-gradient
        pseudo-label. Without it the term is minimized by ANY mutual
        agreement, and the r3 sweep measured exactly that collusion: both
        predictions drift to an agreed-on wrong geometry (BASELINE.md r3
        experiments — plain `cons` wins occ_psnr but loses abs_rel).
      disocc_only: restrict the penalty to target pixels NOT covered by
        the source layer-0 (the disoccluded set) — aims the term at the one
        signal only cross-prediction provides (hidden-surface geometry) and
        leaves visible-surface depth to the photometric losses.
      deep_only: stop-gradient the SOURCE layer-0 disparity before the
        splat, so the term's gradient reaches only the deep (hidden)
        layers. Even with ``disocc_only`` the r3 sweep measured layer-0
        drift (abs_rel 0.23→0.29 the moment the term enabled): layer-0's
        splat footprint and per-pixel soft-z normalization appear in every
        rendered-disparity value, so masking the *error* does not mask the
        *gradient path*. Hidden-surface supervision should not renegotiate
        the visible surface.

    Both directions are applied by :func:`total_loss_bidirectional`.
    """
    if deep_only:
        import jax
        d = ldi_src.disparities
        d = jnp.concatenate(
            [jax.lax.stop_gradient(d[:, :1]), d[:, 1:]], axis=1)
        ldi_src = ldi_src.replace(disparities=d)
    out = render_forward(
        ldi_src, pose_src2trg, K_trg=K_trg,
        out_hw=ldi_trg.disparities.shape[2:4],
        zbuffer_scale=render_cfg.zbuffer_scale,
        splat_method=render_cfg.splat_method,
        use_pallas=render_cfg.use_pallas,
        pallas_max_dy=render_cfg.pallas_max_dy,
        check_window=False)
    # Numerics: disoccluded pixels carry ONLY deep-layer weight, which after
    # the per-image soft-z shift is ~exp(-scale) (1e-11 at scale 30). The
    # composite ratio is well-defined, but the VJP's (payload - out)/wsum
    # intermediate explodes when wsum underflows toward f32-denormal — the
    # r3 sym_occ arm NaN'd at step ~2300 exactly this way. Re-normalize the
    # disparity with a denormal floor (drops only wsum <= 1e-30 pixels,
    # keeping every real contribution while bounding 1/wsum at 1e30, inside
    # f32 range for the whole chain).
    wsum = out["coverage"]
    disp_num = out["disparity"] * wsum  # recover accumulated disparity mass
    rendered_disp = divide_safe(disp_num, wsum, eps=1e-30)
    mask = (wsum > 1e-30).astype(jnp.float32)
    if disocc_only or visible_only:
        import jax

        from lsi_tpu.evaluation.occlusion import disocclusion_mask
        disocc = disocclusion_mask(
            ldi_src, pose_src2trg,
            out_hw=ldi_trg.disparities.shape[2:4],
            zbuffer_scale=render_cfg.zbuffer_scale,
            use_pallas=render_cfg.use_pallas,
            pallas_max_dy=render_cfg.pallas_max_dy)
        disocc = jax.lax.stop_gradient(disocc)
        # visible_only is the complement: pixels layer-0 DOES cover — the
        # anchor term's support (r3c: cons_sym anchors layer-0 against
        # drift; restricting it off the disocclusions keeps it from
        # negotiating hidden-surface geometry the pseudo-label term owns).
        mask = mask * (disocc if disocc_only else (1.0 - disocc))
    target = ldi_trg.disparities[:, 0]
    if stop_target:
        import jax
        target = jax.lax.stop_gradient(target)
    err = _charbonnier(rendered_disp - target)
    return divide_safe(jnp.sum(err * mask), jnp.sum(mask))


def depth_supervision(ldi: LDI, gt_disparity: jnp.ndarray,
                      valid: jnp.ndarray) -> jnp.ndarray:
    """Direct L1 on layer-0 disparity where GT exists (SYNTHIA)."""
    pred = ldi.disparities[:, 0]  # (B, H, W, 1)
    err = _charbonnier(pred - gt_disparity) * valid
    return divide_safe(jnp.sum(err), jnp.sum(valid))


def total_loss(ldi: LDI, target_image: jnp.ndarray,
               pose_src2trg: jnp.ndarray,
               loss_cfg: LossConfig, render_cfg: RenderConfig,
               K_trg=None, gt_disparity=None,
               gt_valid=None) -> Dict[str, jnp.ndarray]:
    """Assemble the configured training loss; returns {"total", parts...}.

    Diagnostics (e.g. ``window_dropped_frac``) ride along in the returned
    dict but are NOT summed into "total".
    """
    parts = {}
    diags = {}
    if loss_cfg.photo_mode in ("inverse_warp", "both"):
        inv_loss, inv_diag = view_synthesis_inverse_warp(
            ldi, target_image, pose_src2trg, K_trg,
            min_over_layers=loss_cfg.min_over_layers,
            candidate_radius=loss_cfg.candidate_radius,
            layer0_margin=loss_cfg.min_layer0_margin,
            render_cfg=render_cfg, return_diag=True)
        parts["photo_inverse_warp"] = (
            loss_cfg.inverse_warp_weight * inv_loss)
        diags.update(inv_diag)
    if loss_cfg.photo_mode in ("splat", "both"):
        splat_loss, diag = view_synthesis_splat(
            ldi, target_image, pose_src2trg, render_cfg, K_trg,
            ssim_weight=loss_cfg.ssim_weight, return_diag=True)
        parts["photo_splat"] = loss_cfg.splat_weight * splat_loss
        diags.update(diag)
    if loss_cfg.photo_layer0_weight > 0 and ldi.textures.shape[1] > 1:
        # Anti-drift tether (see LossConfig.photo_layer0_weight): layer 0
        # alone must explain the visible scene — min-over-layers cannot
        # route its photometric job to the (trained) deeper layers.
        layer0 = LDI(textures=ldi.textures[:, :1],
                     disparities=ldi.disparities[:, :1],
                     intrinsics=ldi.intrinsics)
        l0_loss = view_synthesis_inverse_warp(
            layer0, target_image, pose_src2trg, K_trg,
            min_over_layers=False, render_cfg=render_cfg)
        parts["photo_layer0"] = loss_cfg.photo_layer0_weight * l0_loss
    if loss_cfg.smoothness_weight > 0:
        parts["smoothness"] = (
            loss_cfg.smoothness_weight
            * disparity_smoothness(ldi, loss_cfg.edge_aware_smoothness,
                                   loss_cfg.smoothness_edge_gate_deep))
    if loss_cfg.depth_supervision_weight > 0 and gt_disparity is not None:
        if gt_valid is None:
            gt_valid = jnp.ones_like(gt_disparity)
        parts["depth_supervision"] = (
            loss_cfg.depth_supervision_weight
            * depth_supervision(ldi, gt_disparity, gt_valid))
    parts["total"] = sum(parts.values())
    parts.update(diags)
    return parts


def total_loss_bidirectional(ldi_src: LDI, ldi_trg: LDI,
                             src_image: jnp.ndarray,
                             trg_image: jnp.ndarray,
                             pose_src2trg: jnp.ndarray,
                             loss_cfg: LossConfig,
                             render_cfg: RenderConfig,
                             gt_disparity=None,
                             gt_valid=None,
                             ldi_src_teacher=None,
                             ldi_trg_teacher=None) -> Dict[str, jnp.ndarray]:
    """Two-prediction training loss: photometric + cross-view consistency.

    Used when ``loss_cfg.consistency_weight > 0`` or ``loss_cfg.symmetric``
    — the trainer predicts an LDI from the target image as well, and this
    assembles:

      * the standard src->trg photometric/smoothness/supervision loss
        (:func:`total_loss` on ``ldi_src``);
      * with ``symmetric``: the mirrored trg->src photometric loss on
        ``ldi_trg`` (smoothness included; depth supervision is src-frame
        GT and is not mirrored);
      * with ``consistency_weight``: :func:`depth_consistency` in BOTH
        directions (src rendered into trg vs trg layer-0, and vice versa).

    With ``ldi_src_teacher``/``ldi_trg_teacher`` (EMA mean-teacher
    predictions, constant w.r.t. the differentiated params), the
    consistency/anchor TARGETS come from the teacher instead of the live
    second prediction — see ``LossConfig.consistency_ema_teacher``. The
    rendered (student) side and the photometric losses are unaffected.

    Diagnostics ride along un-summed, as in :func:`total_loss`.
    """
    from lsi_tpu.geometry.transforms import invert_pose

    parts = total_loss(ldi_src, trg_image, pose_src2trg, loss_cfg,
                       render_cfg, gt_disparity=gt_disparity,
                       gt_valid=gt_valid)
    total = parts.pop("total")
    pose_trg2src = invert_pose(pose_src2trg)
    trg_label = ldi_trg_teacher if ldi_trg_teacher is not None else ldi_trg
    src_label = ldi_src_teacher if ldi_src_teacher is not None else ldi_src
    if loss_cfg.symmetric:
        rev = total_loss(ldi_trg, src_image, pose_trg2src, loss_cfg,
                         render_cfg)
        rev_total = rev.pop("total")
        for k, v in rev.items():
            if k == "window_dropped_frac":
                parts["window_dropped_frac_rev"] = v
            else:
                parts[f"{k}_rev"] = v
        total = total + rev_total
    if loss_cfg.consistency_weight > 0:
        kw = dict(stop_target=loss_cfg.consistency_stop_target,
                  disocc_only=loss_cfg.consistency_disocc_only,
                  deep_only=loss_cfg.consistency_deep_only)
        cons = (depth_consistency(ldi_src, trg_label, pose_src2trg,
                                  render_cfg, **kw)
                + depth_consistency(ldi_trg, src_label, pose_trg2src,
                                    render_cfg, **kw))
        parts["depth_consistency"] = loss_cfg.consistency_weight * cons
        total = total + parts["depth_consistency"]
    if loss_cfg.consistency_anchor_weight > 0:
        # Visible-support negotiated anchor (see LossConfig) — masked to
        # the complement of the pseudo-label term's disocclusion support.
        akw = dict(visible_only=True)
        anchor = (depth_consistency(ldi_src, trg_label, pose_src2trg,
                                    render_cfg, **akw)
                  + depth_consistency(ldi_trg, src_label, pose_trg2src,
                                      render_cfg, **akw))
        parts["depth_anchor"] = (
            loss_cfg.consistency_anchor_weight * anchor)
        total = total + parts["depth_anchor"]
    parts["total"] = total
    return parts


def mpi_smoothness(disp: jnp.ndarray, image: jnp.ndarray,
                   edge_aware: bool = True) -> jnp.ndarray:
    """First-order smoothness on the MPI's expected source disparity,
    edge-aware against the input image (same idiom as the LDI term)."""
    d = disp[..., 0]  # (B, H, W)
    dx = jnp.abs(d[:, :, 1:] - d[:, :, :-1])
    dy = jnp.abs(d[:, 1:, :] - d[:, :-1, :])
    if edge_aware:
        img = image.astype(jnp.float32)
        gx = jnp.mean(jnp.abs(img[:, :, 1:] - img[:, :, :-1]), -1)
        gy = jnp.mean(jnp.abs(img[:, 1:, :] - img[:, :-1, :]), -1)
        dx = dx * jnp.exp(-10.0 * gx)
        dy = dy * jnp.exp(-10.0 * gy)
    return jnp.mean(dx) + jnp.mean(dy)


def mpi_total_loss(mpi, src_image: jnp.ndarray, target_image: jnp.ndarray,
                   pose_src2trg: jnp.ndarray,
                   loss_cfg: LossConfig, K_trg=None,
                   gt_disparity=None, gt_valid=None,
                   alpha_coverage_weight: float = 1.0,
                   render_cfg: RenderConfig = RenderConfig(use_pallas="off")
                   ) -> Dict[str, jnp.ndarray]:
    """Training loss for the layered-planes (MPI) baseline experiment.

    Capability parity with the reference's plane-based baseline experiments
    (SURVEY.md §2 Experiments row): photometric view synthesis on the
    homography-warped over-composite, plus an opacity-coverage term (the
    composite must explain the whole target; without it the trivial
    all-transparent MPI zeroes the photometric gradient) and edge-aware
    smoothness on the expected source disparity. Gather-only — no scatter
    anywhere; on TPU the D per-plane warps ride the tent-matmul gather
    kernel (``render_cfg.use_pallas``), since XLA's gathers serialize
    there too (docs/perf.md §8).
    """
    from lsi_tpu.models.mpi import mpi_source_disparity, render_mpi

    out = render_mpi(mpi, pose_src2trg, K_trg=K_trg,
                     out_hw=target_image.shape[1:3],
                     use_pallas=render_cfg.use_pallas,
                     pallas_max_dy=render_cfg.pallas_max_dy)
    trg32 = target_image.astype(jnp.float32)
    err = jnp.mean(_charbonnier(out["rgb"] - trg32), axis=-1, keepdims=True)

    parts = {}
    parts["photo_mpi"] = loss_cfg.splat_weight * jnp.mean(err)
    # Opacity backstop: accumulated alpha ~ 1 where the target is observed.
    parts["alpha_coverage"] = alpha_coverage_weight * jnp.mean(
        (1.0 - out["alpha"]) ** 2)
    src_disp = mpi_source_disparity(mpi)
    if loss_cfg.smoothness_weight > 0:
        parts["smoothness"] = loss_cfg.smoothness_weight * mpi_smoothness(
            src_disp, src_image, loss_cfg.edge_aware_smoothness)
    if loss_cfg.depth_supervision_weight > 0 and gt_disparity is not None:
        if gt_valid is None:
            gt_valid = jnp.ones_like(gt_disparity)
        err_d = _charbonnier(src_disp - gt_disparity) * gt_valid
        parts["depth_supervision"] = (
            loss_cfg.depth_supervision_weight
            * divide_safe(jnp.sum(err_d), jnp.sum(gt_valid)))
    parts["total"] = sum(parts.values())
    return parts
