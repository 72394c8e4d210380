"""Isolate which VALUE property of coords/weights makes TPU scatter slow."""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from lsi_tpu.ops.splat import splat_bilinear


def timeit(fn, *args, iters=5, warmup=1, label=""):
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{label}: {(time.perf_counter() - t0) / iters * 1e3:.3f} ms",
          flush=True)


def main():
    n, hs, w, c = 8, 512, 768, 4
    h = 256
    rng = np.random.default_rng(0)
    vals = jnp.asarray(rng.uniform(size=(n, hs, w, c)), jnp.float32)
    base_x = np.broadcast_to(np.arange(w, dtype=np.float32), (n, hs, w))
    base_y = np.broadcast_to(
        (np.arange(hs, dtype=np.float32)[:, None] % h), (n, hs, w))

    fn = jax.jit(lambda v, cc, wt: splat_bilinear(v, cc, wt, (h, w)))

    def run(label, x, y, wvals):
        coords = jnp.asarray(np.stack([x, y], -1), jnp.float32)
        timeit(fn, vals, coords, jnp.asarray(wvals, jnp.float32), label=label)

    w_uniform = rng.uniform(0.1, 1.0, (n, hs, w, 1)).astype(np.float32)
    w_exp = np.exp(50.0 * (rng.uniform(0.05, 0.8, (n, hs, w, 1)) - 0.8)
                   ).astype(np.float32)

    shift_rand = rng.uniform(0, 120, (n, hs, w)).astype(np.float32)
    jit_y = rng.uniform(-1.5, 1.5, (n, hs, w)).astype(np.float32)
    d = rng.uniform(0.05, 0.8, (n, hs, w)).astype(np.float32)
    shift_proj = (729.6 * 0.3 * d).astype(np.float32)

    run("rand-shift, jitter-y, uniform-w", base_x - shift_rand,
        base_y + jit_y, w_uniform)
    run("rand-shift, exact-y, uniform-w", base_x - shift_rand, base_y,
        w_uniform)
    run("proj-shift, jitter-y, uniform-w", base_x - shift_proj,
        base_y + jit_y, w_uniform)
    run("rand-shift, jitter-y, exp-w", base_x - shift_rand, base_y + jit_y,
        w_exp)
    run("proj-shift, exact-y, exp-w", base_x - shift_proj, base_y, w_exp)
    # exact integer x as well (identity-like)
    run("exact-x, exact-y, uniform-w", base_x, base_y, w_uniform)


if __name__ == "__main__":
    main()
