"""Measure cfg-4 (highres_b64) TRAINING as literally configured:
512x1536, batch 64, remat decoder, photo_mode=splat — on ONE chip
(VERDICT r2 weak #7: prove the memory fit or re-spec the preset).

Times 2 serialized steps inside a lax.scan (honest axon protocol); even
completing proves the b64 remat train step fits 16 GB HBM.

Usage: python scripts/bench_highres_b64.py [--batch 64] [--steps 2]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--steps", type=int, default=2)
    ap.add_argument("--iters", type=int, default=2)
    args = ap.parse_args()

    from lsi_tpu.config import get_config
    from lsi_tpu.data.pipeline import Batch
    from lsi_tpu.api import default_intrinsics
    from lsi_tpu.geometry.transforms import translation_pose
    from lsi_tpu.train.trainer import create_state, make_train_step

    cfg = get_config("highres_b64")
    h, w = cfg.data.height, cfg.data.width
    b = args.batch
    print(f"config: {h}x{w} b{b} remat={cfg.train.remat_decoder} "
          f"photo={cfg.loss.photo_mode}", flush=True)

    state = create_state(cfg, jax.random.key(0))
    step_fn = make_train_step(cfg)
    rng = np.random.default_rng(0)
    batch = Batch(
        src_image=jnp.asarray(
            rng.integers(0, 255, (b, h, w, 3), np.uint8)),
        trg_image=jnp.asarray(
            rng.integers(0, 255, (b, h, w, 3), np.uint8)),
        intrinsics=default_intrinsics(b, h, w),
        pose_src2trg=jnp.broadcast_to(
            translation_pose(np.array([-0.3, 0.0, 0.0], np.float32))[None],
            (b, 4, 4)),
    )

    def loop(state, batch_arg):
        def body(s, _):
            new_s, m = step_fn(s, batch_arg)
            return new_s, m["total"]
        return jax.lax.scan(body, state, None, length=args.steps)

    loop_j = jax.jit(loop)
    print("compiling + first run...", flush=True)
    t0 = time.time()
    out_state, losses = loop_j(state, batch)
    first_loss = float(np.asarray(losses[-1]))
    print(f"first run ok in {time.time() - t0:.1f}s, loss={first_loss:.4f}",
          flush=True)
    t0 = time.perf_counter()
    for _ in range(args.iters):
        out_state, losses = loop_j(state, batch)
    _ = float(np.asarray(losses[-1]))
    _ = float(np.asarray(
        jnp.sum(jax.tree_util.tree_leaves(out_state.params)[0])))
    dt = (time.perf_counter() - t0) / (args.iters * args.steps)
    print(f"steps/s: {1.0 / dt:.3f}  frames/s: {b / dt:.2f} "
          f"(b{b} @{h}x{w}, one chip)", flush=True)


if __name__ == "__main__":
    main()
