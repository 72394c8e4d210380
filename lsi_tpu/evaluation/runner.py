"""Evaluation runner: view-synthesis + depth metrics over a dataset split.

Capability parity with the reference's eval scripts (SURVEY.md §3.4):
restore a checkpoint, loop held-out pairs, predict LDI -> render to the
paired view -> PSNR/SSIM vs ground truth (masked to rendered coverage),
plus layer-0 depth metrics where GT depth exists (SYNTHIA / synthetic),
aggregate, and optionally export image grids
(src | trg | render | disparity) as PNGs.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

# An explicit JAX_PLATFORMS env choice must win over a sitecustomize
# backend force (see lsi_tpu/train/__main__.py).
_plat = os.environ.get("JAX_PLATFORMS")
if _plat:
    import jax
    jax.config.update("jax_platforms", _plat)

import jax
import jax.numpy as jnp
import numpy as np

from lsi_tpu.config import Config
from lsi_tpu.data.pipeline import make_dataset
from lsi_tpu.evaluation.metrics import depth_metrics, psnr, ssim
from lsi_tpu.geometry.ldi import render_forward


def build_eval_step(cfg: Config):
    from lsi_tpu.train.trainer import build_model
    model = build_model(cfg.model)

    if cfg.model.family == "mpi":
        from lsi_tpu.models.mpi import mpi_source_disparity, render_mpi

        @jax.jit
        def eval_step_mpi(params, batch):
            from lsi_tpu.data.pipeline import decode_batch
            batch = decode_batch(batch)
            mpi = model.apply({"params": params}, batch.src_image,
                              batch.intrinsics)
            out = render_mpi(mpi, batch.pose_src2trg,
                             out_hw=batch.trg_image.shape[1:3],
                             use_pallas=cfg.render.use_pallas,
                             pallas_max_dy=cfg.render.pallas_max_dy)
            covered = (out["alpha"] > 0.5).astype(jnp.float32)
            metrics = {
                "psnr": psnr(out["rgb"], batch.trg_image, mask=covered),
                "psnr_full": psnr(out["rgb"], batch.trg_image),
                "ssim": ssim(out["rgb"], batch.trg_image, mask=covered),
                "coverage": jnp.mean(out["alpha"]),
            }
            if batch.gt_disparity is not None and batch.gt_valid is not None:
                metrics.update(depth_metrics(
                    mpi_source_disparity(mpi), batch.gt_disparity,
                    batch.gt_valid))
            return metrics, out["rgb"], mpi

        return eval_step_mpi

    @jax.jit
    def eval_step(params, batch):
        from lsi_tpu.data.pipeline import decode_batch
        batch = decode_batch(batch)
        ldi = model.apply({"params": params}, batch.src_image,
                          batch.intrinsics)
        out = render_forward(
            ldi, batch.pose_src2trg,
            out_hw=batch.trg_image.shape[1:3],
            zbuffer_scale=cfg.render.zbuffer_scale,
            splat_method=cfg.render.splat_method,
            use_pallas=cfg.render.use_pallas,
            pallas_max_dy=cfg.render.pallas_max_dy,
            check_window=cfg.render.window_check)
        covered = (out["coverage"] > 0).astype(jnp.float32)
        metrics = {
            "psnr": psnr(out["rgb"], batch.trg_image, mask=covered),
            "psnr_full": psnr(out["rgb"], batch.trg_image),
            "ssim": ssim(out["rgb"], batch.trg_image, mask=covered),
            "coverage": jnp.mean(covered),
            "window_dropped_frac": out["window_dropped_frac"],
        }
        if batch.gt_disparity is not None and batch.gt_valid is not None:
            metrics.update(depth_metrics(
                ldi.disparities[:, 0], batch.gt_disparity, batch.gt_valid))
        if batch.trg_gt_disparity is not None:
            # Occluded-region eval (the test of the *layered* part):
            # rendered-depth / photometric accuracy on target pixels only
            # the deeper layers can explain (SURVEY.md §3.4).
            from lsi_tpu.evaluation.occlusion import occlusion_metrics
            metrics.update(occlusion_metrics(
                ldi, batch.pose_src2trg, batch.trg_gt_disparity,
                trg_gt_valid=batch.trg_gt_valid,
                trg_image=batch.trg_image,
                zbuffer_scale=cfg.render.zbuffer_scale,
                use_pallas=cfg.render.use_pallas,
                pallas_max_dy=cfg.render.pallas_max_dy))
        return metrics, out["rgb"], ldi

    return eval_step


def eval_data_config(data_cfg):
    """The held-out evaluation view of a training data config.

    Evaluation must see unaugmented, held-out data: photometric jitter and
    left/right swaps would corrupt the reported PSNR/SSIM, and measuring on
    the training split would not test generalization (the reference
    evaluated on held-out pairs — SURVEY.md §3.4).
    """
    import dataclasses
    return dataclasses.replace(data_cfg, augment=False, split="val")


def evaluate(cfg: Config, params, num_batches: int = 16,
             image_dir: Optional[str] = None,
             seed: int = 1234) -> Dict[str, float]:
    """Run evaluation on the held-out split; returns averaged metrics."""
    eval_step = build_eval_step(cfg)
    it = make_dataset(eval_data_config(cfg.data), seed=seed, repeat=True)
    sums: Dict[str, float] = {}
    for i in range(num_batches):
        batch = next(it)
        metrics, rendered, ldi = eval_step(params, batch)
        for k, v in metrics.items():
            sums[k] = sums.get(k, 0.0) + float(v)
        if image_dir is not None and i == 0:
            export_image_grid(batch, rendered, ldi, image_dir)
    results = {k: v / num_batches for k, v in sums.items()}
    if "window_dropped_frac" in results:
        from lsi_tpu.geometry.ldi import warn_window_drop
        warn_window_drop(results["window_dropped_frac"],
                         cfg.render.pallas_max_dy)
    return results


def _pred_disparity(pred) -> np.ndarray:
    """(B, H, W) display disparity for either model family."""
    if hasattr(pred, "disparities"):          # LDI: layer 0
        return np.asarray(pred.disparities[:, 0, ..., 0])
    from lsi_tpu.models.mpi import mpi_source_disparity
    return np.asarray(mpi_source_disparity(pred)[..., 0])


def export_image_grid(batch, rendered, pred, out_dir: str,
                      max_rows: int = 4) -> None:
    """PNG grid: src | trg | render | disparity (viridis-free gray)."""
    from PIL import Image

    os.makedirs(out_dir, exist_ok=True)

    def dec(x):
        x = np.asarray(x)
        return x.astype(np.float32) / 255.0 if x.dtype == np.uint8 else x

    src = dec(batch.src_image)
    trg = dec(batch.trg_image)
    ren = np.clip(np.asarray(rendered), 0, 1)
    disp = _pred_disparity(pred)
    disp = disp / max(disp.max(), 1e-6)
    rows = []
    for i in range(min(max_rows, src.shape[0])):
        row = np.concatenate(
            [src[i], trg[i], ren[i],
             np.repeat(disp[i][..., None], 3, axis=-1)], axis=1)
        rows.append(row)
    grid = (np.concatenate(rows, axis=0) * 255).astype(np.uint8)
    Image.fromarray(grid).save(os.path.join(out_dir, "eval_grid.png"))


def main(argv=None):
    import argparse

    from lsi_tpu.config import PRESETS, get_config
    from lsi_tpu.train.__main__ import apply_override
    from lsi_tpu.train.checkpoint import CheckpointManager
    from lsi_tpu.train.trainer import create_state

    ap = argparse.ArgumentParser(prog="python -m lsi_tpu.evaluation.runner")
    ap.add_argument("--config", default="kitti_ldi2",
                    help=f"preset: {sorted(PRESETS)}")
    ap.add_argument("--set", nargs="*", default=[], metavar="KEY=VALUE")
    ap.add_argument("--num_batches", type=int, default=16)
    ap.add_argument("--image_dir", default="")
    ap.add_argument("--trajectory_gif", default="",
                    help="also render a 60-view sweep of the first eval "
                         "image to this GIF path")
    args = ap.parse_args(argv)
    cfg = get_config(args.config)
    for ov in args.set:
        cfg = apply_override(cfg, ov)

    mgr = CheckpointManager(cfg.train.checkpoint_dir, cfg.train.max_to_keep)
    # Raw (template-free) restore: eval needs only params + step, and a
    # template built from THIS config would fail orbax's strict structure
    # match against checkpoints whose train state carries extra fields
    # (e.g. ema_params from a loss.consistency_ema_teacher run).
    raw = mgr.restore_raw()
    if raw is None:
        print("no checkpoint found; evaluating fresh-initialized params")
        params = create_state(cfg, jax.random.key(0)).params
        step = 0
    else:
        params, step = raw["params"], int(raw["step"])
    print(f"evaluating checkpoint step {step}")
    results = evaluate(cfg, params, args.num_batches,
                       args.image_dir or None)
    for k, v in sorted(results.items()):
        print(f"{k}: {v:.4f}")

    if args.trajectory_gif and cfg.model.family != "ldi":
        print("trajectory gif: LDI-family only; skipping")
    elif args.trajectory_gif:
        from lsi_tpu.data.pipeline import make_dataset
        from lsi_tpu.evaluation.trajectory import render_trajectory
        from lsi_tpu.evaluation.video import save_gif
        from lsi_tpu.models.ldi_predictor import LDIPredictor

        batch = next(make_dataset(cfg.data, seed=1, repeat=True))
        model = LDIPredictor(cfg.model)
        ldi = jax.jit(lambda p, im, k: model.apply({"params": p}, im, k))(
            params, batch.src_image[:1], batch.intrinsics[:1])
        frames = render_trajectory(
            ldi, 60, max_translation=(0.15, 0.0, 0.0),
            max_rotation=(0.0, 0.0, 0.01), render_cfg=cfg.render)
        print(f"trajectory gif: {save_gif(frames, args.trajectory_gif)}")


if __name__ == "__main__":
    main()
