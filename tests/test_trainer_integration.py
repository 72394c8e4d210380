"""Trainer class end-to-end: loop, metrics, checkpoint, auto-resume."""

import glob
import json
import os

import numpy as np

from lsi_tpu.config import (Config, DataConfig, LossConfig, ModelConfig,
                            RenderConfig, TrainConfig)
from lsi_tpu.train.trainer import Trainer


def tiny_config(ckpt_dir):
    return Config(
        model=ModelConfig(num_layers=2, base_filters=8, num_scales=2,
                          compute_dtype="float32"),
        render=RenderConfig(zbuffer_scale=20.0),
        loss=LossConfig(photo_mode="inverse_warp", smoothness_weight=0.01),
        data=DataConfig(dataset="synthetic", height=16, width=32,
                        batch_size=8, prefetch=1),
        train=TrainConfig(learning_rate=1e-3, warmup_steps=2,
                          max_steps=6, checkpoint_dir=str(ckpt_dir),
                          log_every=2, checkpoint_every=3, seed=0),
    )


def test_trainer_runs_checkpoints_resumes(tmp_path):
    ckpt = tmp_path / "ckpt"
    cfg = tiny_config(ckpt)

    t1 = Trainer(cfg)
    state, metrics = t1.train()
    assert int(state.step) == 6
    assert np.isfinite(metrics["total"])
    assert metrics["steps_per_sec"] > 0

    # metrics jsonl written
    logs = glob.glob(str(ckpt / "train.jsonl"))
    assert logs
    recs = [json.loads(line) for line in open(logs[0])]
    assert recs[-1]["step"] == 6
    assert "total" in recs[-1]

    # checkpoints kept
    t1.ckpt.wait()
    assert t1.ckpt.latest_step() == 6

    # resume: extending max_steps continues from step 6 (not from scratch)
    cfg2 = tiny_config(ckpt).replace(
        train=TrainConfig(learning_rate=1e-3, warmup_steps=2,
                          max_steps=9, checkpoint_dir=str(ckpt),
                          log_every=2, checkpoint_every=3, seed=0))
    t2 = Trainer(cfg2)
    state2, _ = t2.train()
    assert int(state2.step) == 9
    recs2 = [json.loads(line) for line in open(logs[0])]
    steps = [r["step"] for r in recs2]
    # resumed run logged steps beyond 6 only
    assert 8 in steps or 9 in steps


def test_profiler_trace_written(tmp_path):
    cfg = tiny_config(tmp_path / "ckpt2")
    cfg = cfg.replace(train=TrainConfig(
        learning_rate=1e-3, warmup_steps=1, max_steps=2,
        checkpoint_dir=str(tmp_path / "ckpt2"), log_every=1,
        checkpoint_every=10, profile_dir=str(tmp_path / "trace")))
    t = Trainer(cfg)
    t.train()
    import glob
    assert glob.glob(str(tmp_path / "trace" / "**" / "*"), recursive=True)
