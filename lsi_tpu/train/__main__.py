"""Training CLI: ``python -m lsi_tpu.train --config=kitti_ldi2 [overrides]``.

Capability parity with the reference's flag-driven experiment entry points
(``python -m lsi.experiments.<dataset>.ldi --flags``): named config presets
(the five BASELINE.json setups) plus dotted-path overrides, e.g.::

    python -m lsi_tpu.train --config=kitti_ldi2 \
        --set data.root=/data/kitti train.max_steps=20000 \
        --set model.num_layers=3
"""

from __future__ import annotations

import argparse
import dataclasses
import os

# An explicit JAX_PLATFORMS env choice must win: runtime images may
# force-register an accelerator backend from sitecustomize via jax.config,
# which silently overrides the env var — breaking CPU-mesh runs of this
# CLI (tests, scripts/train_chunked.py smokes, CI boxes without a chip).
_plat = os.environ.get("JAX_PLATFORMS")
if _plat:
    import jax
    jax.config.update("jax_platforms", _plat)

from lsi_tpu.config import PRESETS, Config, get_config


def apply_override(cfg, dotted: str):
    """Apply one 'a.b=value' override to a frozen dataclass tree."""
    path, value = dotted.split("=", 1)
    keys = path.split(".")

    def convert(old, s: str):
        if isinstance(old, bool):
            return s.lower() in ("1", "true", "yes")
        if isinstance(old, int):
            return int(s)
        if isinstance(old, float):
            return float(s)
        return s

    def rec(node, keys):
        if len(keys) == 1:
            old = getattr(node, keys[0])
            return dataclasses.replace(node, **{keys[0]: convert(old, value)})
        sub = getattr(node, keys[0])
        return dataclasses.replace(node, **{keys[0]: rec(sub, keys[1:])})

    return rec(cfg, keys)


def parse_args(argv=None) -> Config:
    ap = argparse.ArgumentParser(prog="python -m lsi_tpu.train")
    ap.add_argument("--config", default="kitti_ldi2",
                    help=f"preset: {sorted(PRESETS)}")
    ap.add_argument("--set", nargs="*", default=[], metavar="KEY=VALUE",
                    help="dotted config overrides, e.g. train.max_steps=100")
    args = ap.parse_args(argv)
    cfg = get_config(args.config)
    for ov in args.set:
        cfg = apply_override(cfg, ov)
    return cfg


def main(argv=None):
    cfg = parse_args(argv)
    print(f"config: {cfg}")
    from lsi_tpu.train.trainer import Trainer
    trainer = Trainer(cfg)
    state, metrics = trainer.train()
    print(f"done at step {int(state.step)}: {metrics}")


if __name__ == "__main__":
    main()
