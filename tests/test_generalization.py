"""Multi-object generalization protocol — slow, real-TPU quality gate.

A scaled-down version of the BASELINE.md learning-evidence protocol
(VERDICT r1 #5): train a 3-layer LDI on the multi-object scene family
(2-4 textured boxes over a slanted background, SE(3) pose jitter incl.
rotation) with fresh scenes every batch, then require held-out view
synthesis and layer-0 depth quality bounds. Gated behind LSI_TPU_TEST_TPU
because it needs real-chip throughput (the CPU path would take hours);
the fast CPU coverage of the same family lives in
tests/test_train.py::test_train_step_multi_object_scene.

Run: LSI_TPU_TEST_TPU=1 python -m pytest tests/test_generalization.py -m slow
"""

import os

import numpy as np
import pytest

requires_tpu = pytest.mark.skipif(
    not os.environ.get("LSI_TPU_TEST_TPU"),
    reason="real-TPU generalization protocol (set LSI_TPU_TEST_TPU=1)")


@requires_tpu
@pytest.mark.slow
def test_multi_object_generalization(tmp_path):
    from lsi_tpu.config import DataConfig, TrainConfig, get_config
    from lsi_tpu.train.trainer import Trainer

    cfg = get_config("synthetic_multi")
    cfg = cfg.replace(
        data=DataConfig(dataset="synthetic", synthetic_scene="multi",
                        height=64, width=128, batch_size=8),
        train=TrainConfig(learning_rate=5e-4, warmup_steps=50,
                          max_steps=1000, log_every=100,
                          checkpoint_dir=str(tmp_path / "ckpt"),
                          checkpoint_every=1000, eval_every=1000,
                          eval_batches=4, seed=0))
    trainer = Trainer(cfg)
    state, metrics = trainer.train()

    # Quality regression bounds — intentionally loose versions of the
    # 5k-step BASELINE.md numbers (this runs 1k steps at half resolution).
    # The r3 winner recipe sums ~2x the parts of the r2 loss (symmetric
    # photometric doubles the photo terms; two consistency terms ride on
    # top), so the total-loss bound is scaled accordingly (sweep arms at
    # 1k steps, full res: total ~= 0.10).
    assert np.isfinite(metrics["total"])
    assert metrics["total"] < 0.14, metrics
    assert metrics["eval_psnr"] > 21.0, metrics
    assert metrics["eval_abs_rel"] < 0.45, metrics
    assert metrics["eval_coverage"] > 0.95, metrics


requires_drift10k = pytest.mark.skipif(
    not os.environ.get("LSI_TPU_TEST_DRIFT10K"),
    reason="~1 h CPU drift protocol (set LSI_TPU_TEST_DRIFT10K=1)")


@requires_drift10k
@pytest.mark.slow
def test_depth_drift_bounded(tmp_path, monkeypatch):
    """VERDICT r2 item 1 done-criterion: depth accuracy must not degrade as
    view synthesis improves.

    Re-targeted in r4 (VERDICT r3 weak #6): the measured drift STARTS after
    ~5k steps (BASELINE.md 10k toy table: flat to 5k, +0.18 by 10k), so the
    r3 version of this test — 2k steps — certified nothing. This runs the
    full 10k CPU toy-testbed protocol (32x64 b4, ~1 h on one host core; the
    exact reproducible setup of scripts/quality_sweep.py --toy) under the
    SHIPPED anti-drift recipe and bounds the drift statistic:

        drift = mean(last two evals' abs_rel) - min(post-warmup abs_rel)

    The bound fails on the r3 control (+0.18 measured) and passes on the
    shipped recipe (r4 sweep winner; BASELINE.md r4 synthesis table).
    Env-gated separately from the chip suite because it needs neither a
    chip nor <1 h: LSI_TPU_TEST_DRIFT10K=1.
    """
    import dataclasses
    import json

    from lsi_tpu.config import get_config
    from lsi_tpu.train.trainer import Trainer

    import jax

    from lsi_tpu.parallel import mesh as mesh_mod
    from lsi_tpu.train import trainer as trainer_mod

    # The documented testbed is batch 4 on ONE device (the sweep arms this
    # test's bound was derived from ran outside pytest, without the
    # conftest's 8-device virtual mesh — b4 doesn't shard 8 ways). Pin the
    # trainer to a single device so the protocol matches the measurements
    # exactly.
    monkeypatch.setattr(
        trainer_mod, "make_mesh_plan",
        lambda: mesh_mod.make_mesh_plan(devices=jax.devices()[:1]))

    cfg = get_config("synthetic_multi")
    # The CPU toy testbed scale (quality_sweep.TOY) + the shipped recipe at
    # the 10k horizon: the preset carries the margin; the late freeze
    # scales with the horizon (50% — the measured `margin_freeze` arm).
    cfg = cfg.replace(
        data=dataclasses.replace(cfg.data, height=32, width=64,
                                 batch_size=4),
        train=dataclasses.replace(
            cfg.train, max_steps=10_000, warmup_steps=50, log_every=500,
            freeze_layer0_step=5_000,
            checkpoint_dir=str(tmp_path / "ckpt"),
            checkpoint_every=10_000, eval_every=500,
            eval_batches=8, seed=0))
    Trainer(cfg).train()

    evals = []
    with open(tmp_path / "ckpt" / "train.jsonl") as f:
        for line in f:
            rec = json.loads(line)
            if "eval_abs_rel" in rec:
                evals.append((rec["step"], rec["eval_abs_rel"]))
    assert len(evals) >= 15
    settled = [v for s, v in evals if s >= 500]
    late = np.mean([v for _, v in evals[-2:]])
    drift = late - min(settled)
    # r3 control measured +0.18 at this horizon; the shipped margin_freeze
    # recipe measured +0.028 (= the +-0.03 single-eval noise band — layer-0
    # is bitwise frozen from 5k). Bound = measured + noise, far below the
    # control (BASELINE.md r4 toy synthesis).
    assert drift <= 0.08, (
        f"layer-0 abs_rel drifted {drift:+.3f} from its post-warmup minimum "
        f"{min(settled):.3f}; trajectory: {evals}")
