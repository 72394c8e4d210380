"""Config preset / CLI override / eval runner tests."""

import numpy as np
import jax
import pytest

from lsi_tpu.config import get_config, PRESETS
from lsi_tpu.train.__main__ import apply_override, parse_args


def test_presets_exist():
    assert set(PRESETS) == {"kitti_ldi2", "synthia_ldi2_splat",
                            "kitti_ldi3_b16", "kitti_ldi3_quality",
                            "highres_b64", "trajectory_sweep",
                            "synthetic_sanity", "mpi_baseline",
                            "synthetic_multi"}
    # the r3 quality preset ships the anchor_occ winner recipe
    q = get_config("kitti_ldi3_quality")
    assert q.loss.symmetric and q.loss.consistency_anchor_weight > 0
    assert q.loss.consistency_deep_only and q.loss.consistency_disocc_only
    # ... plus the r4 margin_freeze winner (BASELINE.md r4 synthesis)
    assert q.loss.min_layer0_margin > 0
    assert q.train.freeze_layer0_step == q.train.max_steps // 2
    # ... with the freeze splicing the run's best export (r4 flagship
    # finding: a fixed-step freeze can pin a transient collapse), which
    # needs in-training evals to select from
    assert q.train.freeze_layer0_from_best and q.train.save_best_params
    assert q.train.eval_every > 0
    assert get_config("synthetic_multi").loss.min_layer0_margin > 0
    assert get_config("mpi_baseline").model.family == "mpi"
    assert get_config("synthetic_multi").data.synthetic_scene == "multi"
    cfg = get_config("kitti_ldi3_b16")
    assert cfg.model.num_layers == 3
    assert cfg.data.batch_size == 16
    assert not cfg.model.layer0_texture_from_input
    assert get_config("highres_b64").train.remat_decoder


def test_overrides():
    cfg = get_config("kitti_ldi2")
    cfg = apply_override(cfg, "train.max_steps=42")
    cfg = apply_override(cfg, "model.num_layers=3")
    cfg = apply_override(cfg, "data.root=/some/path")
    cfg = apply_override(cfg, "loss.min_over_layers=false")
    assert cfg.train.max_steps == 42
    assert cfg.model.num_layers == 3
    assert cfg.data.root == "/some/path"
    assert cfg.loss.min_over_layers is False


def test_parse_args():
    cfg = parse_args(["--config", "trajectory_sweep",
                      "--set", "train.seed=7", "data.batch_size=2"])
    assert cfg.train.seed == 7
    assert cfg.data.batch_size == 2


def test_eval_runner_on_synthetic(tmp_path):
    from lsi_tpu.config import (Config, DataConfig, ModelConfig)
    from lsi_tpu.evaluation.runner import evaluate
    from lsi_tpu.train.trainer import create_state

    cfg = Config(
        model=ModelConfig(num_layers=2, base_filters=8, num_scales=3,
                          compute_dtype="float32"),
        data=DataConfig(dataset="synthetic", height=32, width=64,
                        batch_size=2, prefetch=1))
    state = create_state(cfg, jax.random.key(0))
    results = evaluate(cfg, state.params, num_batches=2,
                       image_dir=str(tmp_path))
    assert {"psnr", "psnr_full", "ssim", "coverage",
            "abs_rel"} <= set(results)
    assert np.isfinite(results["psnr"])
    assert (tmp_path / "eval_grid.png").exists()


def test_quality_sweep_summarize(tmp_path):
    """The r3 sweep tool's jsonl summarizer extracts quality trajectories."""
    import json
    import sys

    sys.path.insert(0, "scripts")
    d = tmp_path / "variantx"
    d.mkdir()
    rows = [
        {"step": 100, "total": 0.1},
        {"step": 250, "eval_psnr": 25.0, "eval_abs_rel": 0.25,
         "eval_occ_abs_rel": 4.0, "eval_occ_psnr": 21.0},
        {"step": 500, "eval_psnr": 26.0, "eval_abs_rel": 0.30,
         "eval_occ_abs_rel": 3.5, "eval_occ_psnr": 22.0},
        {"step": 750, "eval_psnr": 26.5, "eval_abs_rel": 0.28,
         "eval_occ_abs_rel": 3.2, "eval_occ_psnr": 22.5},
        {"step": 1000, "eval_psnr": 27.0, "eval_abs_rel": 0.32,
         "eval_occ_abs_rel": 3.0, "eval_occ_psnr": 23.0},
    ]
    with open(d / "train.jsonl", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    import quality_sweep
    out = quality_sweep.summarize(str(tmp_path))
    assert len(out) == 1
    r = out[0]
    assert r["variant"] == "variantx"
    assert r["psnr_first"] == 25.0 and r["psnr_last"] == 27.0
    # drift = mean(last two abs_rel) - min(settled abs_rel, step >= 500)
    #       = (0.28 + 0.32)/2 - 0.28 = 0.02
    assert abs(r["drift"] - 0.02) < 1e-9
    assert r["absrel_best"] == 0.25
    # occ columns average the last 3 evals (summarizer rounds to 3 places)
    assert abs(r["occ_absrel_last"] - (3.5 + 3.2 + 3.0) / 3) < 1e-3
    assert abs(r["occ_psnr_last"] - (22.0 + 22.5 + 23.0) / 3) < 1e-2


@pytest.mark.slow
def test_cli_subprocess_honors_cpu_platform_env(tmp_path):
    """The bare CLI (`python -m lsi_tpu.train`) must run on CPU when
    JAX_PLATFORMS=cpu is set, even on images whose sitecustomize
    force-registers an accelerator backend via jax.config (which silently
    overrides the env var). Regression: before the re-assert in
    train/__main__.py, CPU-env subprocess runs initialized the forced
    backend instead — and hung forever when the chip was wedged."""
    import os
    import subprocess
    import sys

    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("XLA_FLAGS", None)
    out = subprocess.run(
        [sys.executable, "-m", "lsi_tpu.train",
         "--config=synthetic_sanity", "--set",
         "data.height=16", "data.width=32", "data.batch_size=1",
         "train.max_steps=1", "train.warmup_steps=1", "train.log_every=1",
         f"train.checkpoint_dir={tmp_path}", "train.checkpoint_every=1"],
        env=env, capture_output=True, text=True, timeout=600)
    assert out.returncode == 0, out.stderr[-2000:]
    assert "done at step 1" in out.stdout
