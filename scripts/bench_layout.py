"""Prove/disprove: layout of scatter operands causes the 760ms splat."""

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
    b, l, h, w = 8, 2, 256, 768
    rng = np.random.default_rng(0)
    tex = jnp.asarray(rng.uniform(size=(b, l, h, w, 3)), jnp.float32)
    disp = jnp.asarray(
        np.ascontiguousarray(
            np.sort(rng.uniform(0.05, 0.8, (b, l, h, w, 1)), axis=1)[:, ::-1]),
        jnp.float32)
    K = jnp.asarray(np.tile(np.array(
        [[729.6, 0, 383.5], [0, 729.6, 127.5], [0, 0, 1]],
        np.float32)[None], (b, 1, 1)))
    pose = jnp.broadcast_to(
        translation_pose(np.array([-0.3, 0.0, 0.0], np.float32))[None],
        (b, 4, 4))
    disp_bl = disp.reshape(b * l, h, w, 1)
    Kr = jnp.repeat(K, l, axis=0)
    poser = jnp.repeat(pose, l, axis=0)

    fp = jax.jit(lambda d: projection.forward_project(d, Kr, Kr, poser))
    coords, tdisp, valid = fp(disp_bl)
    weights = jnp.exp(20.0 * (tdisp - 0.8)) * valid
    payload = jnp.concatenate(
        [tex.reshape(b * l, h, w, 3), tdisp], -1)

    fn = jax.jit(lambda v, cc, wt: splat_bilinear(v, cc, wt, (h, w)))

    # A: device-produced arrays, reshaped (b, l*h, w, .)
    pay_f = payload.reshape(b, l * h, w, 4)
    coords_f = coords.reshape(b, l * h, w, 2)
    weights_f = weights.reshape(b, l * h, w, 1)
    timeit(fn, pay_f, coords_f, weights_f, label="A device-produced folded")

    # B: same VALUES, re-uploaded from host
    timeit(fn, jnp.asarray(np.asarray(pay_f)),
           jnp.asarray(np.asarray(coords_f)),
           jnp.asarray(np.asarray(weights_f)),
           label="B host re-upload same values")

    # C: no fold — scatter with N = b*l
    timeit(fn, payload, coords, weights, label="C device-produced unfolded")

    # D: fused fold+splat in ONE jit
    def folded(payload, coords, weights):
        return splat_bilinear(payload.reshape(b, l * h, w, 4),
                              coords.reshape(b, l * h, w, 2),
                              weights.reshape(b, l * h, w, 1), (h, w))
    timeit(jax.jit(folded), payload, coords, weights,
           label="D fold+splat one jit")

    # E: full render in one jit, but scatter per (b*l) then sum layer axis
    def render_unfolded(disp_bl, tex):
        coords, tdisp, valid = projection.forward_project(
            disp_bl, Kr, Kr, poser)
        wgt = jnp.exp(20.0 * (tdisp - 0.8)) * valid
        payload = jnp.concatenate([tex.reshape(b * l, h, w, 3), tdisp], -1)
        accum, wsum = splat_bilinear(payload, coords, wgt, (h, w))
        accum = accum.reshape(b, l, h, w, 4).sum(1)
        wsum = wsum.reshape(b, l, h, w, 1).sum(1)
        return accum, wsum
    timeit(jax.jit(render_unfolded), disp_bl, tex,
           label="E full render, unfolded scatter+sum")


if __name__ == "__main__":
    main()
