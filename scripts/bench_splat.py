"""Microbenchmark: splat implementations on the attached accelerator.

Usage: python scripts/bench_splat.py [--h 256] [--w 768] [--layers 2] [--b 8]
Times each splat method (and later the Pallas kernel) in isolation, plus the
bilinear gather and the UNet forward for context.
"""

import argparse
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")


def timeit(fn, *args, iters=10, warmup=2):
    def materialize(o):
        # jax.block_until_ready returns early on the axon tunnel; a real
        # device->host reduction read is the only trustworthy sync.
        return float(np.asarray(jax.tree.reduce(
            lambda a, b: a + jnp.sum(b).astype(jnp.float32),
            jax.tree.leaves(o), jnp.float32(0))))
    for _ in range(warmup):
        materialize(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    materialize(out)
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--h", type=int, default=256)
    ap.add_argument("--w", type=int, default=768)
    ap.add_argument("--layers", type=int, default=2)
    ap.add_argument("--b", type=int, default=8)
    ap.add_argument("--methods", default="scatter,sort,pallas")
    args = ap.parse_args()

    from lsi_tpu.ops.splat import splat_bilinear
    from lsi_tpu.ops.gather import bilinear_sample

    b, l, h, w = args.b, args.layers, args.h, args.w
    n = b  # layers folded into height like the render does
    rng = np.random.default_rng(0)
    vals = jnp.asarray(rng.uniform(size=(n, l * h, w, 4)), jnp.float32)
    # realistic stereo-ish coords: mostly horizontal shifts up to ~120 px
    base_x = np.broadcast_to(np.arange(w, dtype=np.float32),
                             (n, l * h, w)).copy()
    base_y = np.broadcast_to(
        np.arange(l * h, dtype=np.float32)[:, None] % h, (n, l * h, w)).copy()
    shift = rng.uniform(0, 120, (n, l * h, w)).astype(np.float32)
    jitter_y = rng.uniform(-1.5, 1.5, (n, l * h, w)).astype(np.float32)
    coords = jnp.asarray(np.stack([base_x - shift, base_y + jitter_y], -1))
    weights = jnp.asarray(rng.uniform(0.1, 1.0, (n, l * h, w, 1)),
                          jnp.float32)

    print(f"device: {jax.devices()[0]}  shapes: vals {vals.shape}",
          file=sys.stderr)

    for method in args.methods.split(","):
        if method == "pallas":
            try:
                from lsi_tpu.kernels.splat_pallas import splat_pallas
                fn = jax.jit(lambda v, c, wt: splat_pallas(
                    v, c, wt, (h, w)))
            except Exception as e:
                print(f"pallas unavailable: {e}", file=sys.stderr)
                continue
        else:
            fn = jax.jit(lambda v, c, wt, m=method: splat_bilinear(
                v, c, wt, (h, w), method=m))
        try:
            dt = timeit(fn, vals, coords, weights)
            px = n * l * h * w
            print(f"splat[{method}]: {dt * 1e3:.3f} ms "
                  f"({px / dt / 1e9:.2f} Gpix/s src, "
                  f"{b / dt:.1f} eff-frames/s)")
        except Exception as e:
            print(f"splat[{method}] FAILED: {type(e).__name__}: {e}",
                  file=sys.stderr)

    # gather for context
    g = jax.jit(lambda im, c: bilinear_sample(im, c)[0])
    imgs = vals[..., :3]
    dt = timeit(g, imgs, coords)
    print(f"gather: {dt * 1e3:.3f} ms")

    # grad of scatter splat
    def loss(v, c, wt):
        a, s = splat_bilinear(v, c, wt, (h, w))
        return jnp.sum(a) + jnp.sum(s)
    gr = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))
    dt = timeit(gr, vals, coords, weights)
    print(f"splat grad[scatter]: {dt * 1e3:.3f} ms")


if __name__ == "__main__":
    main()
