"""Round-3 quality sweep: depth-drift + disoccluded-depth experiments.

Runs the synthetic_multi protocol (BASELINE.md "Multi-object generalization
protocol") under a set of loss/schedule variants, each into its own
checkpoint dir with in-training held-out eval, then summarizes the quality
trajectories (PSNR, layer-0 abs_rel, occluded-region metrics) per variant —
the decision trail VERDICT r2 items 1-2 ask for.

Usage:
  python scripts/quality_sweep.py --steps 3000 --eval_every 250 \
      --out /tmp/lsi_sweep [--variants base,cons ...]
  python scripts/quality_sweep.py --summarize /tmp/lsi_sweep
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

VARIANTS = {
    # r2 flagship protocol — reproduces the measured drift (control arm).
    # NOTE (r4): the synthetic_multi preset now ships the winner's margin
    # (loss.min_layer0_margin=0.02), so {} is no longer the historical
    # control — use `control_r3` to reproduce the r2/r3 drifting baseline.
    "base": {},
    "control_r3": {"loss.min_layer0_margin": 0.0},
    # SURVEY §2 depth-consistency term (cross-view, both directions).
    "cons": {"loss.consistency_weight": 0.5},
    # consistency + symmetric photometric (monodepth-style both-ways).
    "cons_sym": {"loss.consistency_weight": 0.5, "loss.symmetric": True},
    # hidden layers get PLAIN smoothness (no visible-edge gating).
    "hidsm": {"loss.smoothness_edge_gate_deep": False},
    # ordering-ratio cap < 1: deep layers cannot collapse onto layer 0.
    "cap": {"model.ordering_cap": 0.85},
    # staged layer-0 boot (SURVEY §7 hard-part 5).
    "stage": {"train.stage_layer0_steps": 500},
    # stronger smoothness (drift may be photometric-null wandering).
    "smooth3x": {"loss.smoothness_weight": 0.03},
    # combo of the depth-drift levers.
    "combo": {"loss.consistency_weight": 0.5, "loss.symmetric": True,
              "loss.smoothness_edge_gate_deep": False,
              "model.ordering_cap": 0.85},
    # --- round-3b revisions (after the first sweep measured plain `cons`
    # colluding: mutual agreement improves occ_psnr but degrades geometry)
    # symmetric photometric ONLY (no consistency): isolates the factor that
    # made cons_sym match base layer-0 depth at much better occ_psnr.
    "sym": {"loss.symmetric": True},
    # symmetric photometric + targeted pseudo-label consistency.
    "sym_occ": {"loss.symmetric": True,
                "loss.consistency_weight": 0.5,
                "loss.consistency_stop_target": True,
                "loss.consistency_disocc_only": True},
    # same at a gentler weight (the 0.5 arms trade ~2 dB PSNR at 2.5k).
    "sym_occ_w25": {"loss.symmetric": True,
                    "loss.consistency_weight": 0.25,
                    "loss.consistency_stop_target": True,
                    "loss.consistency_disocc_only": True},
    # targeted pseudo-label with a warm-up: the consistency term only turns
    # on once the pseudo-labels mean something (the from-step-0 arms pay
    # ~2 dB PSNR learning from a random net's labels).
    "sym_occ_d500": {"loss.symmetric": True,
                     "loss.consistency_weight": 0.5,
                     "loss.consistency_stop_target": True,
                     "loss.consistency_disocc_only": True,
                     "loss.consistency_start_step": 500},
    "cons_occ_d500": {"loss.consistency_weight": 0.5,
                      "loss.consistency_stop_target": True,
                      "loss.consistency_disocc_only": True,
                      "loss.consistency_start_step": 500},
    # r3c: the d500 warm-up arms still drifted layer-0 once the term
    # enabled (abs_rel 0.23 -> 0.29); deep_only stop-grads the source
    # layer-0 disparity inside the term so only hidden layers train on it.
    "sym_occ_deep": {"loss.symmetric": True,
                     "loss.consistency_weight": 0.5,
                     "loss.consistency_stop_target": True,
                     "loss.consistency_disocc_only": True,
                     "loss.consistency_start_step": 500,
                     "loss.consistency_deep_only": True},
    # same, gentler weight.
    "sym_occ_deep_w25": {"loss.symmetric": True,
                         "loss.consistency_weight": 0.25,
                         "loss.consistency_stop_target": True,
                         "loss.consistency_disocc_only": True,
                         "loss.consistency_start_step": 500,
                         "loss.consistency_deep_only": True},
    # r3d: disjoint-support composition — negotiated anchor on VISIBLE
    # pixels (cons_sym's layer-0 fix) + stop-target deep-only pseudo-label
    # on DISOCCLUDED pixels (sym_occ_deep's hidden-geometry fix).
    "anchor_occ": {"loss.symmetric": True,
                   "loss.consistency_anchor_weight": 0.5,
                   "loss.consistency_weight": 0.5,
                   "loss.consistency_stop_target": True,
                   "loss.consistency_disocc_only": True,
                   "loss.consistency_start_step": 500,
                   "loss.consistency_deep_only": True},
    # ablation: the visible-support anchor alone.
    "anchor_only": {"loss.symmetric": True,
                    "loss.consistency_anchor_weight": 0.5},
    # stop-gradient pseudo-label: the other prediction anchors, does not
    # negotiate.
    "cons_sg": {"loss.consistency_weight": 0.5,
                "loss.consistency_stop_target": True},
    # targeted: pseudo-label applied ONLY on disoccluded pixels (the signal
    # cross-prediction uniquely provides — hidden-surface geometry).
    "cons_occ": {"loss.consistency_weight": 0.5,
                 "loss.consistency_stop_target": True,
                 "loss.consistency_disocc_only": True},
    # weight sensitivity of the plain term.
    "cons_w01": {"loss.consistency_weight": 0.1},
    # targeted pseudo-label + the hidden-smoothness gate.
    "combo2": {"loss.consistency_weight": 0.5,
               "loss.consistency_stop_target": True,
               "loss.consistency_disocc_only": True,
               "loss.smoothness_edge_gate_deep": False},
    # --- r3 toy-testbed arms (run with --toy; BASELINE.md "CPU toy drift
    # testbed"). The preset IS the anchor_occ recipe, so control = {}.
    # EMA teacher with the Tarvainen-Valpola decay ramp (REFUTED on the
    # testbed: self-EMA endorses the slide — kept for reproducibility).
    "teacher_ramp": {"loss.consistency_ema_teacher": True},
    # pseudo-label window 500->5000 (best measured balanced composite).
    "window5k": {"loss.consistency_stop_step": 5000},
    # LR floor: is the drift late-training diffusion? (refuted)
    "lowlr": {"train.lr_end_factor": 0.005},
    # layer-0-only photometric tether (ineffective: the drift lives in the
    # photometric null space).
    "l0photo": {"loss.photo_layer0_weight": 0.5},
    # r4 candidate #1: deep-layer heads read the trunk through
    # stop_gradient — hidden-layer training provably cannot perturb
    # layer-0's representation (the toy frontier says the coupling IS the
    # shared trunk).
    "sg_trunk": {"model.deep_heads_stopgrad_trunk": True},
    # anti-offloading margin in the min-over-layers photometric: deep
    # layers win a pixel only by beating layer-0 by > margin, so layer-0
    # keeps its constraint on texture-ambiguous (tie) pixels.
    "margin02": {"loss.min_layer0_margin": 0.02},
    "margin05": {"loss.min_layer0_margin": 0.05},
    # composition of the two r4 mechanisms.
    "sg_margin": {"model.deep_heads_stopgrad_trunk": True,
                  "loss.min_layer0_margin": 0.02},
    # r4 candidate #2: late layer-0 freeze at the post-warmup abs_rel
    # minimum (~50% horizon) — from there on only deep heads train, so
    # late layer-0 drift is IMPOSSIBLE by construction while the disocc
    # pseudo-label keeps teaching hidden geometry (unlike window5k, which
    # buys its drift reduction by killing that signal at 5k).
    "freeze5k": {"train.freeze_layer0_step": 5000},
    # composite: margin improves the pre-freeze layer-0 (anti-offloading
    # keeps its constraint on tie pixels), freeze pins it after.
    "margin_freeze": {"loss.min_layer0_margin": 0.02,
                      "train.freeze_layer0_step": 5000},
}

# --toy: the CPU drift testbed (BASELINE.md r3) — 32x64 b4 reproduces the
# flagship late layer-0 drift at a 10k horizon in ~55 min/arm on one host
# core, no chip needed.
TOY = {"data.height": 32, "data.width": 64, "data.batch_size": 4}


def apply_overrides(cfg, kv: dict):
    from lsi_tpu.train.__main__ import apply_override
    for k, v in kv.items():
        cfg = apply_override(cfg, f"{k}={v}")
    return cfg


def run_variant(name: str, steps: int, eval_every: int, out_root: str,
                toy: bool = False):
    from lsi_tpu.config import get_config
    from lsi_tpu.train.trainer import Trainer

    ckpt = os.path.join(out_root, name)
    cfg = get_config("synthetic_multi")
    if toy:
        cfg = apply_overrides(cfg, TOY)
    cfg = apply_overrides(cfg, VARIANTS[name])
    cfg = cfg.replace(train=dataclasses.replace(
        cfg.train, max_steps=steps, eval_every=eval_every,
        eval_batches=8, checkpoint_dir=ckpt, checkpoint_every=steps,
        log_every=100))
    print(f"=== variant {name}: {VARIANTS[name]} -> {ckpt}", flush=True)
    t0 = time.time()
    _, metrics = Trainer(cfg).train()
    dt = time.time() - t0
    print(f"=== {name} done in {dt / 60:.1f} min; last: "
          f"{ {k: round(float(v), 4) for k, v in metrics.items()} }",
          flush=True)


def summarize(out_root: str):
    rows = []
    for name in sorted(os.listdir(out_root)):
        jpath = os.path.join(out_root, name, "train.jsonl")
        if not os.path.exists(jpath):
            continue
        evals = []
        with open(jpath) as f:
            for line in f:
                rec = json.loads(line)
                if "eval_psnr" in rec:
                    evals.append(rec)
        if not evals:
            continue
        first, last = evals[0], evals[-1]
        best_absrel = min(e.get("eval_abs_rel", 9e9) for e in evals)
        # drift = late abs_rel minus the post-warmup minimum (the r2 drift
        # statistic: geometry getting WORSE after it was once good); the
        # last two evals are averaged to damp single-eval noise.
        settled = [e.get("eval_abs_rel", 9e9) for e in evals
                   if e.get("step", 0) >= 500]
        late = ([e.get("eval_abs_rel", -1) for e in evals[-2:]])
        late_avg = sum(late) / max(1, len(late))
        drift = (late_avg - min(settled)) if settled else 0.0
        # occ averaged over the last 3 evals (2.5% support is noisy)
        occ_tail = [e.get("eval_occ_abs_rel", -1) for e in evals[-3:]]
        occp_tail = [e.get("eval_occ_psnr", -1) for e in evals[-3:]]
        rows.append({
            "variant": name,
            "evals": len(evals),
            "psnr_first": round(first["eval_psnr"], 2),
            "psnr_last": round(last["eval_psnr"], 2),
            "absrel_first": round(first.get("eval_abs_rel", -1), 3),
            "absrel_last": round(last.get("eval_abs_rel", -1), 3),
            "absrel_best": round(best_absrel, 3),
            "occ_absrel_last": round(sum(occ_tail) / len(occ_tail), 3),
            "occ_psnr_last": round(sum(occp_tail) / len(occp_tail), 2),
            "drift": round(drift, 3),
        })
    hdr = ["variant", "psnr_first", "psnr_last", "absrel_first",
           "absrel_last", "absrel_best", "drift", "occ_absrel_last",
           "occ_psnr_last"]
    print("\t".join(hdr))
    for r in rows:
        print("\t".join(str(r[k]) for k in hdr))
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=None,
                    help="train steps (default 3000; 10000 under --toy — "
                         "the documented testbed horizon)")
    ap.add_argument("--eval_every", type=int, default=250)
    ap.add_argument("--out", default="/tmp/lsi_sweep")
    ap.add_argument("--variants", default="")
    ap.add_argument("--summarize", default="")
    ap.add_argument("--toy", action="store_true",
                    help="CPU drift testbed scale (32x64 b4; BASELINE.md). "
                         "Defaults --steps to the documented 10k horizon "
                         "and namespaces output under <out>/toy so toy runs "
                         "never resume from (or summarize with) full-size "
                         "checkpoints.")
    args = ap.parse_args()
    # ADVICE r3: toy runs must not share ckpt dirs with full-size runs
    # (Trainer auto-restores and the fully-conv params load across
    # resolutions — a toy run could silently resume from a full-res ckpt).
    raw_out = args.out
    if args.toy:
        args.out = os.path.join(args.out, "toy")
    if args.steps is None:
        args.steps = 10000 if args.toy else 3000

    if args.summarize:
        summarize(args.summarize)
        return
    os.makedirs(args.out, exist_ok=True)
    names = (args.variants.split(",") if args.variants
             else list(VARIANTS))
    for name in names:
        if name not in VARIANTS:
            sys.exit(f"unknown variant {name!r}; have {sorted(VARIANTS)}")
    if len(names) > 1:
        # One SUBPROCESS per variant: running several Trainers in-process
        # leaks host memory (jit executable caches + axon client buffers
        # accumulate per config — the first in-process sweep grew to 130 GB
        # RSS and was OOM-killed mid-variant 5).
        import subprocess
        for name in names:
            # raw_out: the child re-applies the --toy namespacing itself.
            cmd = [sys.executable, os.path.abspath(__file__),
                   "--steps", str(args.steps),
                   "--eval_every", str(args.eval_every),
                   "--out", raw_out, "--variants", name]
            if args.toy:
                cmd.append("--toy")
            rc = subprocess.run(cmd).returncode
            if rc != 0:
                print(f"=== variant {name} FAILED rc={rc}", flush=True)
    else:
        run_variant(names[0], args.steps, args.eval_every, args.out,
                    toy=args.toy)
    summarize(args.out)


if __name__ == "__main__":
    main()
