#!/usr/bin/env python
"""Chunked training driver: run a long TPU job as N auto-resuming segments.

Why this exists (measured, 2026-08-17, docs/perf.md "tunnel memory" note):
the axon PJRT tunnel client leaks ~10 MB of host memory per dispatched
train step (buffers pinned per-invocation and never released; the pure-CPU
path is flat, so the leak is in the tunnel client, not the framework).
A 10k-step flagship run reached 107 GB RSS and wedged at step 9800. Until
the plugin is fixed, long runs should recycle the client process
periodically — which the framework's orbax auto-resume already makes
exact: every segment restores params + optimizer state + step from the
latest checkpoint and continues as if nothing happened (the data pipeline
is reseeded per segment; on the fresh-random-scenes synthetic family the
stream is stateless by design).

Usage: identical to ``python -m lsi_tpu.train`` plus ``--chunk-steps``:

    python scripts/train_chunked.py --chunk-steps 2500 \
        --config=synthetic_multi --set train.max_steps=10000 \
        train.checkpoint_dir=/tmp/run ...

Each segment is a fresh ``python -m lsi_tpu.train`` subprocess with
``train.max_steps`` clamped to the segment end; a non-zero exit from any
segment aborts the driver with that code.
"""

import argparse
import subprocess
import sys


def main(argv=None):
    parser = argparse.ArgumentParser(add_help=False)
    parser.add_argument("--chunk-steps", type=int, default=2500)
    args, passthrough = parser.parse_known_args(argv)

    total = None
    for tok in passthrough:
        if tok.startswith("train.max_steps="):
            total = int(tok.split("=", 1)[1])
    if total is None:
        sys.exit("train_chunked: pass train.max_steps=N via --set")
    if "train.checkpoint_dir=" not in " ".join(passthrough):
        sys.exit("train_chunked: pass train.checkpoint_dir=... via --set "
                 "(auto-resume is the chunking mechanism)")

    # Pin the LR-decay horizon to the TRUE total: each segment clamps
    # train.max_steps to its end, and the cosine schedule must not be
    # rebuilt from that clamped value (the LR would sawtooth).
    if not any(t.startswith("train.decay_steps=") for t in passthrough):
        passthrough = passthrough + [f"train.decay_steps={total}"]

    start = 0
    while start < total:
        end = min(start + args.chunk_steps, total)
        cmd = [sys.executable, "-m", "lsi_tpu.train"]
        cmd += [t if not t.startswith("train.max_steps=")
                else f"train.max_steps={end}" for t in passthrough]
        print(f"[train_chunked] segment {start}->{end} of {total}",
              flush=True)
        rc = subprocess.call(cmd)
        if rc != 0:
            sys.exit(rc)
        start = end
    print("[train_chunked] done", flush=True)


if __name__ == "__main__":
    main()
