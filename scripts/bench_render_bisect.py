"""Bisect render_forward cost on the accelerator."""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from lsi_tpu.geometry import projection
from lsi_tpu.geometry.transforms import translation_pose
from lsi_tpu.ops.splat import splat_bilinear


def timeit(fn, *args, iters=10, warmup=2, label=""):
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
        np.sort(rng.uniform(0.05, 0.8, (b, l, h, w, 1)), axis=1)[:, ::-1],
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
    timeit(fp, disp_bl, label="forward_project")
    coords, tdisp, valid = fp(disp_bl)

    # stage: zweight
    def zw(tdisp, valid):
        tv = tdisp.reshape(b, l, h, w, 1)
        vv = valid.reshape(b, l, h, w, 1)
        d_shift = jax.lax.stop_gradient(
            jnp.max(jnp.where(vv > 0, tv, -jnp.inf), axis=(1, 2, 3, 4),
                    keepdims=True))
        d_shift = jnp.maximum(d_shift, 0.0)
        return jnp.exp(50.0 * (tv - d_shift)) * vv
    timeit(jax.jit(zw), tdisp, valid, label="zweights")
    weights = jax.jit(zw)(tdisp, valid)

    payload = jnp.concatenate([tex, tdisp.reshape(b, l, h, w, 1)], -1)
    pay_f = payload.reshape(b, l * h, w, 4)
    coords_f = coords.reshape(b, l * h, w, 2)
    weights_f = weights.reshape(b, l * h, w, 1)

    timeit(jax.jit(lambda v, c, wt: splat_bilinear(v, c, wt, (h, w))),
           pay_f, coords_f, weights_f, label="splat on render arrays")

    # full render piece by piece in one jit
    def render_nosplat(disp_bl, tex):
        coords, tdisp, valid = projection.forward_project(disp_bl, Kr, Kr,
                                                          poser)
        tv = tdisp.reshape(b, l, h, w, 1)
        vv = valid.reshape(b, l, h, w, 1)
        d_shift = jnp.max(jnp.where(vv > 0, tv, -jnp.inf), axis=(1, 2, 3, 4),
                          keepdims=True)
        d_shift = jnp.maximum(d_shift, 0.0)
        wgt = jnp.exp(50.0 * (tv - d_shift)) * vv
        payload = jnp.concatenate([tex, tv], -1)
        return payload.sum() + wgt.sum() + coords.sum()
    timeit(jax.jit(render_nosplat), disp_bl, tex, label="render minus splat")

    def render_full(disp_bl, tex):
        coords, tdisp, valid = projection.forward_project(disp_bl, Kr, Kr,
                                                          poser)
        tv = tdisp.reshape(b, l, h, w, 1)
        vv = valid.reshape(b, l, h, w, 1)
        d_shift = jnp.max(jnp.where(vv > 0, tv, -jnp.inf), axis=(1, 2, 3, 4),
                          keepdims=True)
        d_shift = jnp.maximum(d_shift, 0.0)
        wgt = jnp.exp(50.0 * (tv - d_shift)) * vv
        payload = jnp.concatenate([tex, tv], -1)
        accum, wsum = splat_bilinear(
            payload.reshape(b, l * h, w, 4), coords.reshape(b, l * h, w, 2),
            wgt.reshape(b, l * h, w, 1), (h, w))
        return accum, wsum
    timeit(jax.jit(render_full), disp_bl, tex, label="render full")


if __name__ == "__main__":
    main()
