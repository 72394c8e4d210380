"""Honest per-stage timing (scan-loop + materializing sync) on the TPU."""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from lsi_tpu.api import default_intrinsics
from lsi_tpu.config import Config, ModelConfig
from lsi_tpu.geometry import projection
from lsi_tpu.geometry.ldi import render_forward
from lsi_tpu.geometry.transforms import translation_pose
from lsi_tpu.models.ldi_predictor import LDIPredictor
from lsi_tpu.train.trainer import create_state

LOOP = 10


def scan_time(step, carry_init, args, label, iters=3):
    """Time `step(carry, *args) -> carry` over LOOP iterations in one jit."""

    @jax.jit
    def loop(carry, *args):
        def body(c, _):
            return step(c, *args), ()
        out, _ = jax.lax.scan(body, carry, None, length=LOOP)
        return out

    def materialize(o):
        return float(np.asarray(jax.tree.reduce(
            lambda a, b2: a + jnp.sum(b2).astype(jnp.float32),
            jax.tree.leaves(o), jnp.float32(0))))

    materialize(loop(carry_init, *args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = loop(carry_init, *args)
    materialize(out)
    dt = (time.perf_counter() - t0) / (iters * LOOP)
    print(f"{label}: {dt * 1e3:.3f} ms", flush=True)
    return dt


def main():
    b, h, w = 8, 256, 768
    use_pallas = "--no-pallas" not in sys.argv
    cfg = Config(model=ModelConfig(num_layers=2))
    state = create_state(cfg, jax.random.key(0))
    model = LDIPredictor(cfg.model)
    rng = np.random.default_rng(0)
    image = jnp.asarray(rng.uniform(size=(b, h, w, 3)), jnp.float32)
    K = default_intrinsics(b, h, w)
    pose = jnp.broadcast_to(
        translation_pose(np.array([-0.3, 0.0, 0.0], np.float32))[None],
        (b, 4, 4))
    print(f"pallas={use_pallas}", flush=True)

    # 1. predict only (carry = image)
    def predict_step(img, params, K):
        ldi = model.apply({"params": params}, img, K)
        return img + 1e-30 * jnp.mean(ldi.disparities)
    scan_time(predict_step, image, (state.params, K), "predict_ldi")

    # 2. render only (carry = textures)
    ldi0 = jax.jit(lambda p, im, k: model.apply({"params": p}, im, k))(
        state.params, image, K)

    def render_step(tex, disp, K, pose):
        from lsi_tpu.geometry.ldi import LDI
        out = render_forward(LDI(textures=tex, disparities=disp,
                                 intrinsics=K), pose,
                             use_pallas=use_pallas)
        return tex + 1e-30 * jnp.mean(out["rgb"])
    scan_time(render_step, ldi0.textures, (ldi0.disparities, K, pose),
              "render_forward")

    # 2b. render minus splat (geometry+weights only)
    def geom_step(disp, K, pose):
        bl = disp.reshape(b * 2, h, w, 1)
        rep = lambda m: jnp.repeat(m, 2, axis=0)
        coords, tdisp, valid = projection.forward_project(
            bl, rep(K), rep(K), rep(pose))
        zw = jnp.exp(30.0 * (tdisp - jnp.max(tdisp))) * valid
        return disp + 1e-30 * (jnp.mean(coords) + jnp.mean(zw))
    scan_time(geom_step, ldi0.disparities, (K, pose), "geometry+weights")

    # 3. fused predict+render
    def full_step(img, params, K, pose):
        ldi = model.apply({"params": params}, img, K)
        out = render_forward(ldi, pose, use_pallas=use_pallas)
        return img + 1e-30 * jnp.mean(out["rgb"])
    scan_time(full_step, image, (state.params, K, pose), "predict+render")


if __name__ == "__main__":
    main()
