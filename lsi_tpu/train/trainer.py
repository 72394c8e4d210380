"""Training harness: jitted sharded train step + loop.

Capability parity with the reference's ``Trainer`` base class
(``lsi/nnutils/train_utils.py``: flags, graph assembly of
data -> net -> render -> loss, Adam, session loop, summaries, Saver) —
re-designed for TPU:

  * ONE jitted train step containing model forward, differentiable render,
    losses, backward, and the optimizer update — XLA fuses the whole
    program; there is no loss/render/optimizer boundary and no per-step
    Python in the hot path beyond the data iterator.
  * Data parallelism by sharding annotation: the batch is sharded over the
    ``data`` mesh axis, parameters/optimizer state are replicated, and XLA
    emits the gradient all-reduce (ICI) automatically — no pmap, no
    hand-written collectives (SURVEY.md §5 communication backend).
  * orbax auto-resume, NaN guard, steps/sec + frames/sec metrics, optional
    jax.profiler traces.
"""

from __future__ import annotations

import dataclasses
import os
import time
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax.training import train_state

from lsi_tpu.config import Config, ModelConfig
from lsi_tpu.data.pipeline import Batch, make_dataset
from lsi_tpu.losses import total_loss
from lsi_tpu.models.ldi_predictor import LDIPredictor


def build_model(model_cfg: ModelConfig):
    """Model-family dispatch: the LDI predictor (flagship) or the
    layered-planes MPI baseline (the reference's plane-based experiments)."""
    if model_cfg.family == "mpi":
        from lsi_tpu.models.mpi import build_mpi_predictor
        return build_mpi_predictor(model_cfg)
    if model_cfg.family != "ldi":
        raise ValueError(
            f"unknown model family {model_cfg.family!r}; use ldi|mpi")
    return LDIPredictor(model_cfg)
from lsi_tpu.parallel.mesh import MeshPlan, assert_divisible, make_mesh_plan
from lsi_tpu.train.checkpoint import (CheckpointManager, export_params_npz,
                                      import_params_npz)
from lsi_tpu.train.metrics import MetricWriter


class TrainState(train_state.TrainState):
    """flax TrainState (params + optax state + step).

    ``ema_params`` (mean-teacher; ``loss.consistency_ema_teacher``) is an
    exponential moving average of ``params`` updated every step; it is the
    frozen reference the consistency terms target. ``None`` when the
    teacher is disabled (no memory cost).
    """
    ema_params: Any = None


def _best_abs_rel_from_jsonl(path: str):
    """Min eval_abs_rel recorded in a train.jsonl, or None.

    Seeds the drift monitor after a process restart: a chunked run
    (scripts/train_chunked.py) must compare against the best of the WHOLE
    run, not of the current segment, or every segment would reset the
    drift baseline."""
    import json
    best = None
    try:
        with open(path) as f:
            for line in f:
                try:
                    v = json.loads(line).get("eval_abs_rel")
                except json.JSONDecodeError:
                    continue
                if v is not None and (best is None or v < best):
                    best = float(v)
    except OSError:
        return None
    return best


def make_lr_schedule(cfg: Config) -> optax.Schedule:
    # The decay horizon is the TRUE run length, not the (possibly clamped)
    # max_steps: segmented runs (scripts/train_chunked.py) clamp max_steps
    # to each segment end, and rebuilding the cosine from that would make
    # the LR sawtooth across segments.
    horizon = cfg.train.decay_steps or cfg.train.max_steps
    return optax.warmup_cosine_decay_schedule(
        init_value=0.0,
        peak_value=cfg.train.learning_rate,
        warmup_steps=cfg.train.warmup_steps,
        decay_steps=max(horizon, cfg.train.warmup_steps + 1),
        end_value=cfg.train.learning_rate * cfg.train.lr_end_factor,
    )


def make_optimizer(cfg: Config) -> optax.GradientTransformation:
    schedule = make_lr_schedule(cfg)
    tx = optax.chain(
        optax.clip_by_global_norm(cfg.train.grad_clip_norm),
        optax.adam(schedule, b1=cfg.train.adam_b1, b2=cfg.train.adam_b2),
    )
    if cfg.train.skip_nonfinite_updates:
        # Failure containment (one bad batch must not poison a long run):
        # a non-finite gradient skips the update — params and Adam moments
        # stay untouched — rather than writing NaN into the state. After
        # 100 CONSECUTIVE bad steps updates pass through again, at which
        # point the trainer's NaN halt guard stops the run with a debug
        # dump (the two mechanisms compose).
        tx = optax.apply_if_finite(tx, max_consecutive_errors=100)
    return tx


def create_state(cfg: Config, rng) -> TrainState:
    model = build_model(cfg.model)
    h, w = cfg.data.height, cfg.data.width
    dummy_img = jnp.zeros((1, h, w, 3), jnp.float32)
    dummy_k = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (1, 3, 3))
    params = model.init(rng, dummy_img, dummy_k)["params"]
    ema = (jax.tree_util.tree_map(jnp.copy, params)
           if cfg.loss.consistency_ema_teacher else None)
    return TrainState.create(apply_fn=model.apply, params=params,
                             ema_params=ema, tx=make_optimizer(cfg))


def _truncate_ldi(ldi, num_layers: int):
    """Keep the first ``num_layers`` layers of an LDI (staged training)."""
    return dataclasses.replace(
        ldi, textures=ldi.textures[:, :num_layers],
        disparities=ldi.disparities[:, :num_layers])


def make_train_step(cfg: Config, plan: Optional[MeshPlan] = None,
                    stage_layer0: bool = False,
                    freeze_layer0: bool = False):
    """Build the jitted, sharded train step.

    Returns ``step_fn(state, batch) -> (state, metrics)``. With a MeshPlan,
    in/out shardings are annotated so that the batch stays sharded on the
    data axis and XLA inserts the gradient all-reduce.

    With ``stage_layer0`` (SURVEY §7 hard-part 5: staged layer training),
    the loss sees only layer 0 of the prediction — the deep heads get no
    gradient, booting a clean visible-surface estimate first; the Trainer
    switches to the full step after ``cfg.train.stage_layer0_steps``.

    With ``freeze_layer0`` (``train.freeze_layer0_step``; the closing
    bracket of staged training), gradients AND optimizer updates are masked
    so every parameter layer-0's output depends on is bitwise constant —
    only deep-layer heads train; late layer-0 depth drift is impossible by
    construction (see ``models.ldi_predictor.freeze_layer0_grad_mask``).
    """
    model = build_model(cfg.model)
    two_preds = (cfg.model.family != "mpi"
                 and (cfg.loss.consistency_weight > 0
                      or cfg.loss.consistency_anchor_weight > 0
                      or cfg.loss.symmetric))

    def apply_model(params, image, intrinsics):
        fn = lambda p, im, K: model.apply({"params": p}, im, K)
        if cfg.train.remat_decoder:
            fn = jax.checkpoint(fn)
        return fn(params, image, intrinsics)

    def apply_model_pair(params, image_a, image_b, intrinsics):
        """One fused forward over both views (src and trg stacked on batch).

        The UNet is per-sample (convs + GroupNorm normalize within each
        sample), so stacking is math-identical to two calls — but it halves
        the dispatch count and doubles the matmul batch the MXU sees, which
        matters at the small per-view batches the two-prediction recipes
        train with.
        """
        b = image_a.shape[0]
        both = apply_model(params,
                           jnp.concatenate([image_a, image_b], axis=0),
                           jnp.concatenate([intrinsics, intrinsics], axis=0))
        split = lambda x: (x[:b], x[b:])
        ta, tb = split(both.textures)
        da, db = split(both.disparities)
        ka, kb = split(both.intrinsics)
        return (dataclasses.replace(both, textures=ta, disparities=da,
                                    intrinsics=ka),
                dataclasses.replace(both, textures=tb, disparities=db,
                                    intrinsics=kb))

    use_teacher = (two_preds and cfg.loss.consistency_ema_teacher
                   and not stage_layer0
                   and (cfg.loss.consistency_weight > 0
                        or cfg.loss.consistency_anchor_weight > 0))

    def loss_fn(params, ema_params, batch: Batch):
        from lsi_tpu.data.pipeline import decode_batch
        batch = decode_batch(batch)  # storage dtypes -> f32, on device
        if cfg.model.family == "mpi":
            pred = apply_model(params, batch.src_image, batch.intrinsics)
            from lsi_tpu.losses.losses import mpi_total_loss
            parts = mpi_total_loss(
                pred, batch.src_image, batch.trg_image, batch.pose_src2trg,
                cfg.loss,
                gt_disparity=batch.gt_disparity, gt_valid=batch.gt_valid,
                render_cfg=cfg.render)
        elif two_preds and not stage_layer0:
            from lsi_tpu.losses.losses import total_loss_bidirectional
            pred, pred_trg = apply_model_pair(
                params, batch.src_image, batch.trg_image, batch.intrinsics)
            teachers = {}
            if use_teacher:
                # Mean-teacher targets: constant w.r.t. the differentiated
                # params (loss_fn is only differentiated in argnum 0).
                t_src, t_trg = apply_model_pair(
                    ema_params, batch.src_image, batch.trg_image,
                    batch.intrinsics)
                teachers = dict(ldi_src_teacher=t_src, ldi_trg_teacher=t_trg)
            parts = total_loss_bidirectional(
                pred, pred_trg, batch.src_image, batch.trg_image,
                batch.pose_src2trg, cfg.loss, cfg.render,
                gt_disparity=batch.gt_disparity, gt_valid=batch.gt_valid,
                **teachers)
        else:
            pred = apply_model(params, batch.src_image, batch.intrinsics)
            if stage_layer0:
                pred = _truncate_ldi(pred, 1)
            parts = total_loss(
                pred, batch.trg_image, batch.pose_src2trg,
                cfg.loss, cfg.render,
                gt_disparity=batch.gt_disparity, gt_valid=batch.gt_valid)
        return parts["total"], parts

    def step_fn(state: TrainState, batch: Batch):
        (_, parts), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.ema_params, batch)
        if freeze_layer0:
            from lsi_tpu.models.ldi_predictor import freeze_layer0_grad_mask
            # Mask the grads (Adam moments of frozen entries decay instead
            # of accumulating) AND the updates (the momentum tail from
            # pre-freeze grads would otherwise keep moving frozen params).
            grads = freeze_layer0_grad_mask(cfg.model, grads)
            updates, new_opt_state = state.tx.update(
                grads, state.opt_state, state.params)
            updates = freeze_layer0_grad_mask(cfg.model, updates)
            new_state = state.replace(
                step=state.step + 1,
                params=optax.apply_updates(state.params, updates),
                opt_state=new_opt_state)
        else:
            new_state = state.apply_gradients(grads=grads)
        if state.ema_params is not None:
            # Mean-teacher decay ramp (Tarvainen & Valpola, NeurIPS'17):
            # d_t = min(d_cfg, (t+1)/(t+10)). A FIXED long-horizon EMA
            # initialized at the random init params makes the consistency
            # targets near-init garbage for the first ~horizon steps —
            # measured on the toy drift testbed (BASELINE.md r3): the
            # fixed-decay teacher arm degraded to abs_rel 0.71 while the
            # no-teacher control sat at 0.34. The ramp keeps the teacher
            # tracking the student closely early and only lengthens the
            # averaging horizon once the student is trained.
            d_cfg = cfg.loss.consistency_ema_decay
            t = state.step.astype(jnp.float32)
            d = jnp.minimum(d_cfg, (t + 1.0) / (t + 10.0))
            new_state = new_state.replace(ema_params=jax.tree_util.tree_map(
                lambda e, p: e * d + p * (1.0 - d),
                state.ema_params, new_state.params))
        metrics = dict(parts)
        metrics["grad_norm"] = optax.global_norm(grads)
        return new_state, metrics

    if plan is None:
        return jax.jit(step_fn, donate_argnums=(0,))

    replicated = plan.replicated()
    batch_sharded = plan.batch_sharding()
    # Prefix pytrees: one sharding per argument subtree (robust to optional
    # Batch fields being None).
    return jax.jit(
        step_fn,
        in_shardings=(replicated, batch_sharded),
        out_shardings=(replicated, replicated),
        donate_argnums=(0,),
    )


@dataclasses.dataclass
class Trainer:
    """End-to-end training driver (the reference Trainer re-imagined).

    Usage::
        t = Trainer(config)
        t.train()            # resumes from latest checkpoint automatically
    """
    config: Config

    def __post_init__(self):
        self.plan = make_mesh_plan()
        assert_divisible(self.config.data.batch_size, self.plan)
        self.writer = MetricWriter(self.config.train.checkpoint_dir)
        self.ckpt = CheckpointManager(self.config.train.checkpoint_dir,
                                      self.config.train.max_to_keep)
        self.step_fn = make_train_step(self.config, self.plan)
        self._stage_step_fn = (
            make_train_step(self.config, self.plan, stage_layer0=True)
            if self.config.train.stage_layer0_steps > 0 else None)
        # Consistency warm-up: pseudo-labels from a freshly-initialized
        # network are noise — before ``loss.consistency_start_step`` the
        # term is dropped via a second compiled step (the from-step-0
        # sweep arms paid ~2 dB PSNR; BASELINE.md r3 experiments).
        self._cons_warmup_step_fn = None
        lcfg = self.config.loss
        if ((lcfg.consistency_weight > 0
             or (lcfg.consistency_ema_teacher
                 and lcfg.consistency_anchor_weight > 0))
                and lcfg.consistency_start_step > 0):
            # Live mode keeps the negotiated anchor on through the warm-up
            # (measured fine from step 0); teacher mode gates BOTH terms —
            # an EMA of a half-trained net makes equally poor anchor and
            # pseudo-label targets.
            warm_loss = dataclasses.replace(lcfg, consistency_weight=0.0)
            if lcfg.consistency_ema_teacher:
                warm_loss = dataclasses.replace(
                    warm_loss, consistency_anchor_weight=0.0)
            warm_cfg = self.config.replace(loss=warm_loss)
            self._cons_warmup_step_fn = make_train_step(warm_cfg, self.plan)
        # Consistency stop: the disocc pseudo-label both trains hidden-layer
        # geometry and drives the late layer-0 drift through the shared
        # trunk (toy testbed, BASELINE.md r3) — after
        # ``loss.consistency_stop_step`` it is dropped (anchor kept) via a
        # third compiled step, taking the boot without the drift.
        self._cons_stop_step_fn = None
        if lcfg.consistency_weight > 0 and lcfg.consistency_stop_step > 0:
            stop_cfg = self.config.replace(loss=dataclasses.replace(
                lcfg, consistency_weight=0.0))
            self._cons_stop_step_fn = make_train_step(stop_cfg, self.plan)
        # Late layer-0 freeze (train.freeze_layer0_step): the final phase —
        # from the freeze step on, only deep-layer heads train (fourth
        # compiled step; update masking makes layer-0 bitwise constant).
        self._freeze_step_fn = None
        fz = self.config.train.freeze_layer0_step
        if self.config.train.freeze_layer0_from_best:
            # Statically checkable preconditions — a silent fallback here
            # would burn the whole pre-freeze leg and then pin the live
            # params, exactly the failure the flag exists to prevent.
            ev = self.config.train.eval_every
            if fz <= 0:
                raise ValueError("train.freeze_layer0_from_best requires "
                                 "train.freeze_layer0_step > 0")
            if not self.config.train.save_best_params:
                raise ValueError("train.freeze_layer0_from_best requires "
                                 "train.save_best_params=True (the splice "
                                 "source is the best-eval export)")
            if ev <= 0 or ev > fz:
                raise ValueError(
                    f"train.freeze_layer0_from_best needs at least one "
                    f"in-training eval before the freeze boundary: "
                    f"eval_every={ev} vs freeze_layer0_step={fz}")
        if fz > 0:
            if self.config.model.family != "ldi":
                raise ValueError("train.freeze_layer0_step is an LDI-family "
                                 "mechanism (layer-0 vs deep-head param "
                                 f"split); family={self.config.model.family!r}")
            if 0 < fz < self.config.train.stage_layer0_steps:
                # The stage branch would silently override the freeze
                # step_fn past the boundary while the from-best splice
                # still fired mid-stage.
                raise ValueError(
                    f"train.freeze_layer0_step={fz} must be >= "
                    f"train.stage_layer0_steps="
                    f"{self.config.train.stage_layer0_steps} (the freeze is "
                    "the LAST phase)")
            if lcfg.consistency_weight > 0 and fz < lcfg.consistency_start_step:
                raise ValueError(
                    f"train.freeze_layer0_step={fz} must be >= "
                    f"loss.consistency_start_step={lcfg.consistency_start_step}"
                    " (the freeze is the LAST phase)")
            freeze_cfg = self.config
            if lcfg.consistency_weight > 0 and lcfg.consistency_stop_step > 0:
                if fz < lcfg.consistency_stop_step:
                    raise ValueError(
                        f"train.freeze_layer0_step={fz} must be >= "
                        f"loss.consistency_stop_step="
                        f"{lcfg.consistency_stop_step} (the freeze is the "
                        "LAST phase)")
                # The freeze phase starts at/after the pseudo-label stop:
                # compile it with the stopped loss.
                freeze_cfg = self.config.replace(loss=dataclasses.replace(
                    lcfg, consistency_weight=0.0))
            self._freeze_step_fn = make_train_step(freeze_cfg, self.plan,
                                                   freeze_layer0=True)
        rb = self.config.train.collapse_rollback_threshold
        if rb > 0:
            if not self.config.train.save_best_params:
                raise ValueError("train.collapse_rollback_threshold requires "
                                 "train.save_best_params=True (the rollback "
                                 "target is the best-eval export)")
            if self.config.train.eval_every <= 0:
                raise ValueError("train.collapse_rollback_threshold requires "
                                 "train.eval_every > 0 (the collapse signal "
                                 "is the in-training eval's drift metric)")
            if self.config.train.drift_warn_threshold <= 0:
                raise ValueError("train.collapse_rollback_threshold requires "
                                 "train.drift_warn_threshold > 0 (the drift "
                                 "monitor computes the eval_abs_rel_drift "
                                 "signal the rollback triggers on)")
        self._eval_step = None
        self._eval_iter = None
        self._best_eval_abs_rel = None
        self._best_export_abs_rel = None  # save_best_params tracker; seeded
                                          # from the best_params.npz embedded
                                          # meta (NOT train.jsonl: only evals
                                          # that actually exported count, so
                                          # the feature can be enabled
                                          # mid-run)
        self._rollback_count = None       # collapse-rollback budget used;
                                          # seeded from rollback_state.json
                                          # (chunked segments share it)

    def _update_drift(self, out: Dict[str, float]) -> None:
        """Failure detection for geometry drift (the r3 finding: layer-0
        abs_rel can degrade while PSNR stays flat — BASELINE.md 10k table).
        Adds ``eval_abs_rel_drift`` = abs_rel above the run's best so far
        and warns past ``train.drift_warn_threshold``. The best is seeded
        from the checkpoint dir's train.jsonl so it survives the process
        recycling of chunked runs (scripts/train_chunked.py)."""
        thr = self.config.train.drift_warn_threshold
        if thr <= 0 or "eval_abs_rel" not in out:
            return
        if self._best_eval_abs_rel is None:
            path = os.path.join(self.config.train.checkpoint_dir,
                                "train.jsonl")
            self._best_eval_abs_rel = _best_abs_rel_from_jsonl(path)
        cur = float(out["eval_abs_rel"])
        best = self._best_eval_abs_rel
        drift = 0.0 if best is None else max(0.0, cur - best)
        out["eval_abs_rel_drift"] = drift
        if best is None or cur < best:
            self._best_eval_abs_rel = cur
        if drift > thr:
            print(f"[drift] eval_abs_rel {cur:.3f} exceeds the run's best "
                  f"{best:.3f} by {drift:.3f} (> {thr}): view synthesis is "
                  f"likely being bought with geometry drift — the measured "
                  f"mitigations are the anti-offloading margin "
                  f"(loss.min_layer0_margin=0.02), a late layer-0 freeze "
                  f"at ~50% horizon (train.freeze_layer0_step), and "
                  f"best-checkpoint selection by eval_abs_rel (BASELINE.md "
                  f"r4 synthesis; the EMA teacher was REFUTED there)",
                  flush=True)

    def _run_eval(self, state, step: int):
        """In-training held-out eval: metrics to the jsonl (eval_ prefix) +
        an image grid per eval into the checkpoint dir — a long run's
        quality trajectory is reconstructable from train.jsonl alone
        (the reference's tf.summary image logging, SURVEY.md §5).

        Returns ``(metrics, state)`` — the collapse-rollback response may
        replace the train state (params from the best export + a fresh
        optimizer)."""
        from lsi_tpu.evaluation.runner import (build_eval_step,
                                               eval_data_config,
                                               export_image_grid)
        cfg = self.config
        if self._eval_step is None:
            self._eval_step = build_eval_step(cfg)
            self._eval_iter = make_dataset(
                eval_data_config(cfg.data), seed=cfg.train.seed + 1)
        sums: Dict[str, float] = {}
        grid_args = None
        for i in range(max(1, cfg.train.eval_batches)):
            batch = next(self._eval_iter)
            metrics, rendered, pred = self._eval_step(state.params, batch)
            for k, v in metrics.items():
                sums[k] = sums.get(k, 0.0) + float(v)
            if i == 0:
                grid_args = (batch, rendered, pred)
        n = max(1, cfg.train.eval_batches)
        out = {f"eval_{k}": v / n for k, v in sums.items()}
        if "eval_abs_rel" not in out:
            # The eval data carries no GT depth, so neither the best-export
            # selection nor the drift/rollback machinery can ever fire.
            # Features whose whole value depends on that metric must fail at
            # the FIRST eval — not burn the pre-freeze leg and then silently
            # freeze the live params (exactly the r4 flagship failure).
            needs = []
            if (cfg.train.freeze_layer0_from_best
                    and not cfg.train.freeze_fallback_live):
                needs.append("train.freeze_layer0_from_best")
            if cfg.train.collapse_rollback_threshold > 0:
                needs.append("train.collapse_rollback_threshold")
            if needs:
                raise ValueError(
                    f"{' and '.join(needs)} require eval_abs_rel, but the "
                    f"eval at step {step} produced none — the eval split of "
                    f"dataset {cfg.data.dataset!r} has no GT depth (KITTI "
                    "without velodyne files?). Provide GT depth, or set "
                    "train.freeze_fallback_live=True to opt into freezing "
                    "the live params at the boundary.")
        img_dir = os.path.join(cfg.train.checkpoint_dir, "eval_images",
                               f"step_{step:08d}")
        export_image_grid(*grid_args, img_dir)
        self._update_drift(out)
        self._maybe_export_best(state, step, out)
        state = self._maybe_rollback(state, step, out)
        self.writer.write(step, out)
        return out, state

    def _best_npz_path(self) -> str:
        return os.path.join(self.config.train.checkpoint_dir,
                            "best_params.npz")

    def _seed_best_export_tracker(self) -> None:
        """Seed the save_best_params tracker from the npz's embedded meta
        (authoritative: params + metric commit as ONE atomic file), falling
        back to the human-readable json sidecar for pre-r5 exports."""
        if self._best_export_abs_rel is not None:
            return
        from lsi_tpu.train.checkpoint import read_params_npz_meta
        try:
            meta = read_params_npz_meta(self._best_npz_path())
            self._best_export_abs_rel = float(meta["eval_abs_rel"])
            return
        except (OSError, KeyError, ValueError):
            pass
        import json
        side = os.path.join(self.config.train.checkpoint_dir,
                            "best_params.json")
        try:
            with open(side) as f:
                self._best_export_abs_rel = float(
                    json.load(f)["eval_abs_rel"])
        except (OSError, ValueError, KeyError):
            pass

    def _maybe_export_best(self, state, step: int,
                           out: Dict[str, float]) -> None:
        """Automated best-checkpoint selection (train.save_best_params):
        export the params to best_params.npz whenever eval_abs_rel improves
        on the best export so far. The npz lives outside the orbax rotation
        (max_to_keep can't evict it), carries (step, eval_abs_rel) as
        embedded meta — one atomic file; the tracker is seeded from it
        across chunked-run segments — and a json sidecar mirrors the meta
        for the operator."""
        cfg = self.config
        if not cfg.train.save_best_params or "eval_abs_rel" not in out:
            return
        import json
        self._seed_best_export_tracker()
        cur = float(out["eval_abs_rel"])
        if (self._best_export_abs_rel is not None
                and cur >= self._best_export_abs_rel):
            return
        self._best_export_abs_rel = cur
        # Atomic single-file commit (params + meta in one npz): a crash
        # mid-export leaves either the previous consistent export or the
        # new one — never a truncated npz (would kill the freeze boundary)
        # and never a params/metric mismatch (a stale metric would let a
        # worse later eval overwrite the run's true best).
        npz = self._best_npz_path()
        export_params_npz(jax.device_get(state.params), npz + ".tmp.npz",
                          meta={"step": step, "eval_abs_rel": cur})
        os.replace(npz + ".tmp.npz", npz)
        side = os.path.join(cfg.train.checkpoint_dir, "best_params.json")
        with open(side + ".tmp", "w") as f:
            json.dump({"step": step, "eval_abs_rel": cur}, f)
        os.replace(side + ".tmp", side)

    def _rollback_state_path(self) -> str:
        return os.path.join(self.config.train.checkpoint_dir,
                            "rollback_state.json")

    def _maybe_rollback(self, state, step: int, out: Dict[str, float]):
        """Collapse response (train.collapse_rollback_threshold; the r4
        flagship finding): when an eval's drift above the run's best
        crosses the threshold, restore ALL params from best_params.npz and
        re-init the optimizer — fresh Adam moments, and the LR schedule
        (keyed on the optimizer's step count) replays its warmup. The
        layer-0 splice alone cannot recover the run: it pins the best
        GEOMETRY but leaves the trunk and deep heads in the collapsed
        basin (r4: PSNR never recovered its pre-collapse level)."""
        import json
        cfg = self.config
        thr = cfg.train.collapse_rollback_threshold
        drift = out.get("eval_abs_rel_drift", 0.0)
        if thr <= 0 or drift <= thr:
            return state
        npz = self._best_npz_path()
        if not os.path.exists(npz):
            print(f"[rollback] collapse at step {step} (drift {drift:.3f} > "
                  f"{thr}) but no best_params.npz exists yet — continuing "
                  "without rollback", flush=True)
            return state
        if self._rollback_count is None:
            try:
                with open(self._rollback_state_path()) as f:
                    self._rollback_count = int(json.load(f)["count"])
            except (OSError, ValueError, KeyError):
                self._rollback_count = 0
        if self._rollback_count >= cfg.train.collapse_max_rollbacks:
            print(f"[rollback] collapse at step {step} (drift {drift:.3f}) "
                  f"but the rollback budget "
                  f"({cfg.train.collapse_max_rollbacks}) is spent — repeated "
                  "collapse is a recipe problem, not a transient; continuing",
                  flush=True)
            return state
        self._rollback_count += 1
        tmp = self._rollback_state_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"count": self._rollback_count}, f)
        os.replace(tmp, self._rollback_state_path())

        from lsi_tpu.train.checkpoint import read_params_npz_meta
        template = jax.device_get(state.params)
        best = import_params_npz(template, npz)
        try:
            meta = read_params_npz_meta(npz)
            src = (f"step {int(meta['step'])}, "
                   f"eval_abs_rel {meta['eval_abs_rel']:.4f}")
        except (OSError, KeyError, ValueError):
            src = "meta unavailable"
        print(f"[rollback] eval_abs_rel {out['eval_abs_rel']:.3f} at step "
              f"{step} is {drift:.3f} above the run's best (> {thr}): "
              f"geometry collapse — restoring ALL params from "
              f"best_params.npz ({src}), re-initializing the optimizer "
              f"(LR re-warmup), rollback "
              f"{self._rollback_count}/{cfg.train.collapse_max_rollbacks}",
              flush=True)
        opt_state = state.tx.init(best)
        ema = (jax.tree_util.tree_map(jnp.copy, best)
               if state.ema_params is not None else None)
        new_state = dataclasses.replace(
            state, params=best, opt_state=opt_state, ema_params=ema)
        out["rollback"] = float(self._rollback_count)
        return self.plan.replicate(new_state)

    def _splice_best_layer0(self, state):
        """train.freeze_layer0_from_best: at the freeze boundary, replace
        every param entry layer-0 depends on with the run's best export
        (splice_layer0_params), so the freeze pins the best geometry the
        run measured rather than whatever the boundary step holds. Deep
        heads keep their live values and keep training."""
        import json

        from lsi_tpu.models.ldi_predictor import splice_layer0_params
        cfg = self.config
        npz = self._best_npz_path()
        if not os.path.exists(npz):
            msg = ("freeze_layer0_from_best: no best_params.npz in "
                   f"{cfg.train.checkpoint_dir} at the freeze boundary "
                   "(no eval ever produced an export)")
            if not cfg.train.freeze_fallback_live:
                # Silently freezing the live params is exactly the
                # fixed-step failure this flag exists to prevent (the r4
                # flagship run pinned a half-recovered collapse tail).
                raise FileNotFoundError(
                    msg + " — refusing to freeze the live params; set "
                    "train.freeze_fallback_live=True to opt in")
            print(f"[freeze] {msg} — freezing the live params "
                  "(train.freeze_fallback_live)", flush=True)
            return state
        template = jax.device_get(state.params)
        best = import_params_npz(template, npz)
        params = splice_layer0_params(cfg.model, state.params, best)
        try:
            with open(os.path.join(cfg.train.checkpoint_dir,
                                   "best_params.json")) as f:
                meta = json.load(f)
            src = (f"step {meta['step']}, "
                   f"eval_abs_rel {meta['eval_abs_rel']:.4f}")
        except (OSError, ValueError, KeyError):
            src = "sidecar missing"
        print(f"[freeze] layer-0 spliced from best_params.npz ({src}) "
              "and frozen; deep heads continue from the live state",
              flush=True)
        return dataclasses.replace(
            state, params=self.plan.replicate(params))

    def train(self, max_steps: Optional[int] = None,
              data_iter=None) -> Tuple[TrainState, Dict[str, Any]]:
        cfg = self.config
        max_steps = max_steps or cfg.train.max_steps

        state = create_state(cfg, jax.random.key(cfg.train.seed))
        state = self.ckpt.restore(state)
        start_step = int(state.step)
        if start_step == 0:
            # Fresh start (restore found no checkpoint): stale best-export /
            # rollback artifacts from a previous run in a reused
            # checkpoint_dir would seed the trackers with ANOTHER run's
            # best and could be spliced into layer-0 at the freeze boundary.
            for name in ("best_params.npz", "best_params.json",
                         "rollback_state.json"):
                path = os.path.join(cfg.train.checkpoint_dir, name)
                if os.path.exists(path):
                    os.remove(path)
                    print(f"[train] fresh start: removed stale {name} from "
                          f"{cfg.train.checkpoint_dir}", flush=True)
        state = self.plan.replicate(state)

        if data_iter is None:
            data_iter = make_dataset(cfg.data, seed=cfg.train.seed,
                                     sharding=self.plan.batch_sharding())

        profiling = bool(cfg.train.profile_dir)
        if profiling:
            jax.profiler.start_trace(cfg.train.profile_dir)

        last_metrics: Dict[str, Any] = {}
        t_last = time.time()
        frames = 0
        window_warned = False
        try:
            for step in range(start_step, max_steps):
                batch = next(data_iter)
                if (self._freeze_step_fn is not None
                        and cfg.train.freeze_layer0_from_best
                        and step == cfg.train.freeze_layer0_step):
                    # Crossing the freeze boundary live (a resume PAST the
                    # boundary restores already-spliced params and must not
                    # re-splice; a crash between the boundary and the next
                    # checkpoint resumes before it and re-splices from the
                    # same npz — deterministic either way).
                    state = self._splice_best_layer0(state)
                if (self._stage_step_fn is not None
                        and step < cfg.train.stage_layer0_steps):
                    step_fn = self._stage_step_fn
                elif (self._freeze_step_fn is not None
                        and step >= cfg.train.freeze_layer0_step):
                    step_fn = self._freeze_step_fn
                elif (self._cons_warmup_step_fn is not None
                        and step < cfg.loss.consistency_start_step):
                    step_fn = self._cons_warmup_step_fn
                elif (self._cons_stop_step_fn is not None
                        and step >= cfg.loss.consistency_stop_step):
                    step_fn = self._cons_stop_step_fn
                else:
                    step_fn = self.step_fn
                state, metrics = step_fn(state, batch)
                frames += cfg.data.batch_size

                if (step + 1) % cfg.train.log_every == 0 or \
                        step + 1 == max_steps:
                    metrics = {k: float(v) for k, v in metrics.items()}
                    if not all(map(_finite, metrics.values())):
                        # Failure detection: halt on NaN/inf rather than
                        # burning accelerator time on a dead run. The
                        # poisoned state goes to a debug dump OUTSIDE the
                        # orbax resume path — saving it as a regular
                        # checkpoint would make auto-resume restore the
                        # corrupted state forever (and max_to_keep could
                        # rotate out the last good one).
                        dump = os.path.join(
                            cfg.train.checkpoint_dir,
                            f"nan_debug_params_step{step + 1}.npz")
                        export_params_npz(
                            jax.device_get(state.params), dump)
                        raise FloatingPointError(
                            f"non-finite loss at step {step + 1}: {metrics} "
                            f"(params dumped to {dump})")
                    if not window_warned and "window_dropped_frac" in metrics:
                        # Pallas dy-window safety: training on poses that
                        # overflow the static window silently truncates the
                        # render — warn once, loudly (host callbacks are
                        # unsupported on axon, so the diagnostic rides the
                        # loss outputs).
                        from lsi_tpu.geometry.ldi import warn_window_drop
                        window_warned = warn_window_drop(
                            metrics["window_dropped_frac"],
                            cfg.render.pallas_max_dy)
                    now = time.time()
                    dt = now - t_last
                    metrics["steps_per_sec"] = cfg.train.log_every / dt
                    metrics["frames_per_sec"] = frames / dt
                    t_last, frames = now, 0
                    self.writer.write(step + 1, metrics)
                    last_metrics = metrics

                if cfg.train.eval_every and (
                        (step + 1) % cfg.train.eval_every == 0
                        or step + 1 == max_steps):
                    eval_metrics, state = self._run_eval(state, step + 1)
                    last_metrics.update(eval_metrics)

                if (step + 1) % cfg.train.checkpoint_every == 0 or \
                        step + 1 == max_steps:
                    self.ckpt.save(step + 1, jax.device_get(state))
        finally:
            if profiling:
                jax.profiler.stop_trace()
            self.ckpt.wait()
        return state, last_metrics


def _finite(x) -> bool:
    try:
        return bool(jnp.isfinite(x))
    except TypeError:
        return True
