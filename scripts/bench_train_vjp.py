"""Profile the training-step cost structure at the flagship resolution.

Breaks the splat-direction train step (256x768 b8, the slow direction per
bench.py --train) into stages, each timed with the honest scan-loop +
device->host-read protocol (docs/perf.md §5):

  1. model fwd (predict only)
  2. render fwd (Pallas splat, given an LDI)
  3. render fwd+VJP (jax.vjp pullback through splat_pallas_diff)
  4. full loss fwd (model + render + losses)
  5. full train step (4 + backward + adam)

Usage: python scripts/bench_train_vjp.py [iters]
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

LOOP = 10


def mat(x) -> float:
    return float(np.asarray(jnp.sum(jax.tree_util.tree_leaves(x)[0])))


def timed(name, fn, *args, iters=3):
    out = fn(*args)
    mat(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    mat(out)
    dt = (time.perf_counter() - t0) / (iters * LOOP)
    print(f"{name:34s} {dt * 1e3:8.2f} ms/step", flush=True)
    return dt


def main(iters=3):
    from lsi_tpu.api import default_intrinsics
    from lsi_tpu.config import (Config, DataConfig, LossConfig, ModelConfig,
                                RenderConfig)
    from lsi_tpu.data.pipeline import Batch
    from lsi_tpu.geometry.ldi import LDI, render_forward
    from lsi_tpu.geometry.transforms import translation_pose
    from lsi_tpu.train.trainer import create_state, make_train_step

    h, w, b, layers = 256, 768, 8, 2
    cfg = Config(
        model=ModelConfig(num_layers=layers),
        render=RenderConfig(use_pallas="on"),
        loss=LossConfig(photo_mode="splat"),
        data=DataConfig(dataset="synthetic", height=h, width=w,
                        batch_size=b))
    state = create_state(cfg, jax.random.key(0))
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(size=(b, h, w, 3)), jnp.float32)
    trg = jnp.asarray(rng.uniform(size=(b, h, w, 3)), jnp.float32)
    K = default_intrinsics(b, h, w)
    pose = jnp.broadcast_to(
        translation_pose(np.array([-0.3, 0, 0], np.float32))[None],
        (b, 4, 4))
    tex = jnp.asarray(rng.uniform(size=(b, layers, h, w, 3)), jnp.float32)
    disp = jnp.asarray(np.sort(rng.uniform(0.05, 0.8, (b, layers, h, w, 1)),
                               axis=1)[:, ::-1].copy(), jnp.float32)

    from lsi_tpu.models.ldi_predictor import LDIPredictor
    model = LDIPredictor(cfg.model)

    def loop(body):
        def run(carry_img, *args):
            def step(c, _):
                out = body(c, *args)
                return c + 1e-30 * out, ()
            out, _ = jax.lax.scan(step, carry_img, None, length=LOOP)
            return out
        return jax.jit(run)

    # 1. model fwd
    fwd = loop(lambda im, p, k: jnp.mean(
        model.apply({"params": p}, im, k).disparities))
    timed("model fwd", fwd, img, state.params, K, iters=iters)

    # 2. render fwd
    def render_body(t, d, kk, p):
        ldi = LDI(textures=t, disparities=d, intrinsics=kk)
        return jnp.mean(render_forward(ldi, p, use_pallas="on")["rgb"])
    rend = loop(lambda t, d, kk, p: render_body(t, d, kk, p))
    timed("render fwd (pallas)", rend, tex, disp, K, pose, iters=iters)

    # 3. render fwd + VJP (cotangent pullback into textures+disparities)
    def render_vjp_body(t, d, kk, p):
        f = lambda tt, dd: render_body(tt, dd, kk, p)
        val, pull = jax.vjp(f, t, d)
        gt_, gd_ = pull(jnp.ones_like(val))
        return val + jnp.mean(gt_) + jnp.mean(gd_)
    rvjp = loop(render_vjp_body)
    timed("render fwd+VJP (pallas)", rvjp, tex, disp, K, pose, iters=iters)

    # 3b. gather direction (inverse-warp): fwd and fwd+VJP into the
    # disparities (the coordinate-gradient path that trains depth), A/B
    # between the lax 4-corner gather and the Pallas tent-matmul kernel.
    def gather_body(up, t, d, kk, p):
        from lsi_tpu.geometry.ldi import LDI, gather_target_per_layer_folded
        ldi = LDI(textures=t, disparities=d, intrinsics=kk)
        sampled, valid, _ = gather_target_per_layer_folded(
            ldi, trg, p, use_pallas=up, pallas_max_dy=2)
        return jnp.mean(sampled * valid)

    for up, tag in (("off", "lax"), ("on", "pallas")):
        body = functools.partial(gather_body, up)
        gfwd = loop(lambda t, d, kk, p: body(t, d, kk, p))
        timed(f"gather fwd ({tag})", gfwd, tex, disp, K, pose, iters=iters)

        def gather_vjp_body(t, d, kk, p):
            f = lambda dd: body(t, dd, kk, p)
            val, pull = jax.vjp(f, d)
            (gd_,) = pull(jnp.ones_like(val))
            return val + jnp.mean(gd_)
        gvjp = loop(gather_vjp_body)
        timed(f"gather fwd+VJP ({tag})", gvjp, tex, disp, K, pose,
              iters=iters)

    # 4/5. loss fwd and full train step
    batch = Batch(src_image=img, trg_image=trg, intrinsics=K,
                  pose_src2trg=pose)
    step_fn = make_train_step(cfg)

    def loss_only(im, p):
        from lsi_tpu.losses import total_loss
        ldi = model.apply({"params": p}, im, K)
        return total_loss(ldi, trg, pose, cfg.loss, cfg.render)["total"]
    lf = loop(lambda im, p: loss_only(im, p))
    timed("loss fwd (model+render+loss)", lf, img, state.params, iters=iters)

    def train_body(im, s):
        # tie the batch to the carry so the step can't be hoisted out of
        # the timing scan
        b2 = Batch(src_image=im, trg_image=trg, intrinsics=K,
                   pose_src2trg=pose)
        new_s, metrics = step_fn(s, b2)
        del new_s
        return metrics["total"]
    tstep = loop(train_body)
    timed("full train step", tstep, img, state, iters=iters)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 3)
