"""LDI-vs-layered-planes (MPI) comparison on identical eval batches.

The reference framed its contribution against plane-based baselines
(SURVEY.md §2 Experiments); this script reproduces that comparison: train
the flagship LDI model and the MPI baseline for the same number of steps on
the same synthetic scene family, then evaluate both on the SAME held-out
batches (same seeds) and print a side-by-side table.

Usage: python scripts/compare_ldi_mpi.py [steps] [scene]
  steps: train steps per model (default 2000)
  scene: two_plane | multi (default two_plane)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(steps: int = 2000, scene: str = "two_plane"):
    import dataclasses

    from lsi_tpu.config import get_config
    from lsi_tpu.evaluation.runner import evaluate
    from lsi_tpu.train.trainer import Trainer

    results = {}
    for name in ("synthetic_sanity", "mpi_baseline"):
        cfg = get_config(name)
        cfg = cfg.replace(
            data=dataclasses.replace(cfg.data, synthetic_scene=scene),
            train=dataclasses.replace(
                cfg.train, max_steps=steps, log_every=max(50, steps // 10),
                eval_every=0, checkpoint_every=steps,
                checkpoint_dir=f"/tmp/lsi_cmp_{name}_{scene}"))
        if scene == "multi":
            # SE(3) pose jitter incl. rotation: widen the static vertical
            # splat window (the synthetic_multi preset uses 8).
            cfg = cfg.replace(render=dataclasses.replace(
                cfg.render, pallas_max_dy=8))
        print(f"=== training {name} ({cfg.model.family}) for {steps} steps "
              f"on {scene} scenes ===", flush=True)
        trainer = Trainer(cfg)
        state, _ = trainer.train()
        import jax
        params = jax.device_get(state).params
        # Identical eval stream for both models: same seed, same val split.
        metrics = evaluate(cfg, params, num_batches=8, seed=4242)
        results[name] = metrics
        print({k: round(v, 4) for k, v in sorted(metrics.items())},
              flush=True)

    keys = sorted(set(results["synthetic_sanity"])
                  & set(results["mpi_baseline"]))
    print(f"\n{'metric':24s} {'LDI (2-layer)':>14s} {'MPI (planes)':>14s}")
    for k in keys:
        print(f"{k:24s} {results['synthetic_sanity'][k]:14.4f} "
              f"{results['mpi_baseline'][k]:14.4f}")


if __name__ == "__main__":
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    scene = sys.argv[2] if len(sys.argv) > 2 else "two_plane"
    main(steps, scene)
