"""Stage-by-stage timing of the predict+render pipeline on the accelerator."""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from lsi_tpu.api import default_intrinsics
from lsi_tpu.config import Config, ModelConfig
from lsi_tpu.geometry import projection
from lsi_tpu.geometry.ldi import LDI, render_forward
from lsi_tpu.geometry.transforms import translation_pose
from lsi_tpu.models.ldi_predictor import LDIPredictor
from lsi_tpu.models.unet import UNet
from lsi_tpu.train.trainer import create_state


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
    b, h, w = 8, 256, 768
    cfg = Config(model=ModelConfig(num_layers=2))
    state = create_state(cfg, jax.random.key(0))
    model = LDIPredictor(cfg.model)
    rng = np.random.default_rng(0)
    image = jnp.asarray(rng.uniform(size=(b, h, w, 3)), jnp.float32)
    K = default_intrinsics(b, h, w)
    pose = jnp.broadcast_to(
        translation_pose(np.array([-0.3, 0.0, 0.0], np.float32))[None],
        (b, 4, 4))

    print(f"device {jax.devices()[0]}")

    # 1. bare UNet
    unet = UNet(base_filters=32, num_scales=5)
    uvars = unet.init(jax.random.key(0), image)
    timeit(jax.jit(lambda v, x: unet.apply(v, x)), uvars, image,
           label="unet backbone")

    # 2. full predictor
    predict = jax.jit(lambda p, im: model.apply({"params": p}, im, K))
    ldi = predict(state.params, image)
    timeit(predict, state.params, image, label="predict_ldi")

    # 3. forward_project geometry alone
    disp = ldi.disparities.reshape(b * 2, h, w, 1)
    Krep = jnp.repeat(K, 2, axis=0)
    poserep = jnp.repeat(pose, 2, axis=0)
    timeit(jax.jit(lambda d: projection.forward_project(d, Krep, Krep,
                                                        poserep)),
           disp, label="forward_project")

    # 4. render alone
    render = jax.jit(lambda l: render_forward(l, pose)["rgb"])
    timeit(render, ldi, label="render_forward")

    # 5. fused predict+render
    def full(p, im):
        l = model.apply({"params": p}, im, K)
        return render_forward(l, pose)["rgb"]
    timeit(jax.jit(full), state.params, image, label="predict+render fused")


if __name__ == "__main__":
    main()
