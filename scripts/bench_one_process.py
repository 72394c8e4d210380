"""One process, one executable, both input sets: values or compilation?"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from lsi_tpu.geometry import projection
from lsi_tpu.geometry.transforms import translation_pose
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
    n, hs, w = 8, 512, 768
    h = 256
    b, l = 8, 2
    rng = np.random.default_rng(0)

    # --- synthetic-fast input set (bjv6koy0g recipe) ---
    vals_s = jnp.asarray(rng.uniform(size=(n, hs, w, 4)), jnp.float32)
    base_x = np.broadcast_to(np.arange(w, dtype=np.float32), (n, hs, w))
    base_y = np.broadcast_to(
        (np.arange(hs, dtype=np.float32)[:, None] % h), (n, hs, w))
    d_rand = rng.uniform(0.05, 0.8, (n, hs, w)).astype(np.float32)
    coords_s = jnp.asarray(
        np.stack([base_x - 729.6 * 0.3 * d_rand, base_y], -1), jnp.float32)
    w_s = jnp.asarray(np.exp(20.0 * (d_rand[..., None] - 0.8)), jnp.float32)

    # --- render-slow input set (bench_layout recipe, host-uploaded) ---
    tex = rng.uniform(size=(b, l, h, w, 3)).astype(np.float32)
    disp = np.ascontiguousarray(
        np.sort(rng.uniform(0.05, 0.8, (b, l, h, w, 1)), axis=1)[:, ::-1]
    ).astype(np.float32)
    K = np.tile(np.array([[729.6, 0, 383.5], [0, 729.6, 127.5], [0, 0, 1]],
                         np.float32)[None], (b * l, 1, 1))
    pose = np.tile(np.asarray(translation_pose(
        np.array([-0.3, 0.0, 0.0], np.float32)))[None], (b * l, 1, 1))
    fp = jax.jit(lambda dd: projection.forward_project(
        dd, jnp.asarray(K), jnp.asarray(K), jnp.asarray(pose)))
    coords_r, tdisp_r, valid_r = fp(jnp.asarray(disp.reshape(b * l, h, w, 1)))
    coords_r = np.asarray(coords_r).reshape(n, hs, w, 2)
    tdisp_r = np.asarray(tdisp_r).reshape(n, hs, w, 1)
    valid_r = np.asarray(valid_r).reshape(n, hs, w, 1)
    w_r = np.exp(20.0 * (tdisp_r - 0.8)) * valid_r
    pay_r = np.concatenate(
        [tex.reshape(n, hs, w, 3), tdisp_r], -1).astype(np.float32)

    fn = jax.jit(lambda v, cc, wt: splat_bilinear(v, cc, wt, (h, w)))

    timeit(fn, vals_s, coords_s, w_s, label="synthetic set (1st)")
    timeit(fn, jnp.asarray(pay_r), jnp.asarray(coords_r),
           jnp.asarray(w_r), label="render set")
    timeit(fn, vals_s, coords_s, w_s, label="synthetic set (again)")

    # hybrid: render coords with synthetic weights/vals and vice versa
    timeit(fn, vals_s, jnp.asarray(coords_r), w_s,
           label="render coords only")
    timeit(fn, jnp.asarray(pay_r), coords_s, jnp.asarray(w_r),
           label="render vals+weights, synthetic coords")


if __name__ == "__main__":
    main()
