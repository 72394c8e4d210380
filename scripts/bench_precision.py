#!/usr/bin/env python
"""Tent-matmul precision A/B: error vs the f32 lax oracle + throughput.

The r4 kernels moved the f32 tent matmuls to ``Precision.HIGHEST`` (Mosaic's
DEFAULT silently feeds the MXU bf16-truncated operands, ~5e-3 weight error).
That round's docs claimed the cost was "~nil (HBM-bound)" while its own
BENCH artifact recorded a −19% headline (314 → 255 fps) — r4 verdict weak
#1. This script measures the claim instead of asserting it: for each policy
in {default, high, highest} it spawns a child process (the policy is read
at TRACE time from ``LSI_TPU_TENT_PRECISION``) and records

  * forward splat max |rel err| vs the lax oracle (ops.splat, f32 CPU),
  * backward (coords + values grads) max |rel err| vs the oracle's VJP,
  * headline inference fps (2-layer LDI predict + splat render, 256x768
    b16 — bench.py's configuration), and
  * full-train-step fps (photo_mode=both, b8 — bench.py --train).

Results go to docs/perf.md §12; the shipped policy must cite this table.

Usage: python scripts/bench_precision.py [--quick] [--policies a,b,c]
"""

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def child(policy: str, quick: bool) -> None:
    sys.path.insert(0, REPO)
    import bench  # repo-root harness: probe, measure, measure_train
    import jax
    import jax.numpy as jnp
    import numpy as np

    assert os.environ.get("LSI_TPU_TENT_PRECISION") == policy
    devs = bench.probe_devices()
    if devs is None:
        print(json.dumps({"policy": policy,
                          "error": "accelerator unreachable"}))
        sys.exit(1)
    accel = devs[0]

    # --- error vs the f32 lax oracle (CPU: no MXU truncation anywhere).
    # Training-shaped problem: 2 layers folded into rows, stereo-ish
    # coords with |dy| < 2 so the kernel window and the un-windowed oracle
    # agree exactly in support.
    from lsi_tpu.kernels.splat_pallas import splat_pallas_diff
    from lsi_tpu.ops.splat import splat_bilinear

    h, w, layers, b = 128, 256, 2, 2
    rng = np.random.default_rng(0)
    hs = layers * h
    values = rng.uniform(size=(b, hs, w, 3)).astype(np.float32)
    weights = rng.uniform(0.1, 1.0, size=(b, hs, w, 1)).astype(np.float32)
    gx, gy = np.meshgrid(np.arange(w), np.arange(hs) % h)
    coords = np.stack([
        gx + rng.uniform(-30, 30, size=(b, hs, w)),
        gy + rng.uniform(-1.5, 1.5, size=(b, hs, w))], axis=-1
    ).astype(np.float32)

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        def oracle(v, c, wt):
            acc, ws = splat_bilinear(jnp.asarray(v), jnp.asarray(c),
                                     jnp.asarray(wt), (h, w),
                                     method="scatter")
            return acc, ws
        acc0, ws0 = oracle(values, coords, weights)
        loss_cot = np.asarray(
            rng.uniform(size=acc0.shape), np.float32), np.asarray(
            rng.uniform(size=ws0.shape), np.float32)

        def oracle_scalar(v, c, wt):
            acc, ws = oracle(v, c, wt)
            return (jnp.sum(acc * loss_cot[0]) + jnp.sum(ws * loss_cot[1]))
        g0 = jax.grad(oracle_scalar, argnums=(0, 1, 2))(
            values, coords, weights)
        acc0, ws0 = np.asarray(acc0), np.asarray(ws0)
        g0 = [np.asarray(g) for g in g0]

    import contextlib

    from jax.experimental.pallas import tpu as pltpu
    interp = (contextlib.nullcontext() if accel.platform == "tpu"
              else pltpu.force_tpu_interpret_mode())  # CPU smoke runs only
    with jax.default_device(accel), interp:
        def kernel_scalar(v, c, wt):
            acc, ws = splat_pallas_diff(v, c, wt, (h, w), max_dy=4)
            return (jnp.sum(acc * loss_cot[0]) + jnp.sum(ws * loss_cot[1]))
        acc1, ws1 = splat_pallas_diff(
            jnp.asarray(values), jnp.asarray(coords),
            jnp.asarray(weights), (h, w), max_dy=4)
        g1 = jax.grad(kernel_scalar, argnums=(0, 1, 2))(
            jnp.asarray(values), jnp.asarray(coords), jnp.asarray(weights))
        acc1, ws1 = np.asarray(acc1), np.asarray(ws1)
        g1 = [np.asarray(g) for g in g1]

    def rel(a, b_):
        scale = max(np.abs(b_).max(), 1e-6)
        return float(np.abs(a - b_).max() / scale)

    fwd_err = max(rel(acc1, acc0), rel(ws1, ws0))
    bwd_err = max(rel(a, b_) for a, b_ in zip(g1, g0))

    # --- throughput (bench.py protocol; honest scan-loop timing)
    iters = 5 if quick else 20
    fps_infer = bench.measure(accel, 256, 768, 2, batch=16, iters=iters,
                              use_pallas=True)
    sps_train, fps_train = bench.measure_train(
        accel, 256, 768, 2, 8, "both", True, max(1, 2 if quick else 6))

    print(json.dumps({
        "policy": policy, "fwd_rel_err": fwd_err, "bwd_rel_err": bwd_err,
        "fps_infer_b16": round(fps_infer, 2),
        "fps_train_both_b8": round(fps_train, 2),
        "steps_train_both_b8": round(sps_train, 3),
    }))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--policies", default="highest,high,default")
    ap.add_argument("--child", default="")
    args = ap.parse_args()

    if args.child:
        child(args.child, args.quick)
        return

    rows = []
    for policy in args.policies.split(","):
        env = dict(os.environ, LSI_TPU_TENT_PRECISION=policy)
        cmd = [sys.executable, os.path.abspath(__file__),
               "--child", policy] + (["--quick"] if args.quick else [])
        print(f"[bench_precision] {policy} ...", file=sys.stderr, flush=True)
        out = subprocess.run(cmd, env=env, capture_output=True, text=True,
                             cwd=REPO)
        line = out.stdout.strip().splitlines()[-1] if out.stdout.strip() \
            else ""
        try:
            rows.append(json.loads(line))
        except json.JSONDecodeError:
            rows.append({"policy": policy, "error": "child failed",
                         "stderr": out.stderr[-2000:]})
        print(out.stderr[-1500:], file=sys.stderr)
    print(json.dumps(rows, indent=1))


if __name__ == "__main__":
    main()
