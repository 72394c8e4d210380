"""Bisect predict_ldi cost: backbone vs heads vs transposes."""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
import flax.linen as nn

from lsi_tpu.api import default_intrinsics
from lsi_tpu.config import ModelConfig
from lsi_tpu.models.ldi_predictor import LDIPredictor
from lsi_tpu.models.unet import UNet
from lsi_tpu.train.trainer import create_state
from lsi_tpu.config import Config


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
    b, h, w = 8, 256, 768
    rng = np.random.default_rng(0)
    image = jnp.asarray(rng.uniform(size=(b, h, w, 3)), jnp.float32)
    K = default_intrinsics(b, h, w)

    unet = UNet(base_filters=32, num_scales=5)
    uvars = unet.init(jax.random.key(0), image)
    feats = jax.jit(lambda v, x: unet.apply(v, x))(uvars, image)
    timeit(jax.jit(lambda v, x: unet.apply(v, x)), uvars, image,
           label="backbone")

    # heads alone on precomputed feats
    conv = nn.Conv(2, (3, 3), padding="SAME", dtype=jnp.bfloat16)
    cvars = conv.init(jax.random.key(1), feats)

    def heads(cv, feats, image):
        raw = conv.apply(cv, feats).astype(jnp.float32)
        sig = nn.sigmoid(raw)
        d0 = 0.01 + 0.99 * sig[..., 0]
        d1 = d0 * (0.2 + 0.8 * sig[..., 1])
        disparity = jnp.stack([d0, d1], axis=1)[..., None]
        tex0 = image[:, None]
        return disparity, tex0
    timeit(jax.jit(heads), cvars, feats, image, label="disp head+stack")

    # transpose alone
    raw = jnp.asarray(rng.uniform(size=(b, h, w, 2)), jnp.float32)
    timeit(jax.jit(lambda r: jnp.stack([r[..., 0], r[..., 1]], axis=1)),
           raw, label="stack->(b,2,h,w)")

    timeit(jax.jit(lambda r: jnp.moveaxis(r, 3, 1)), raw,
           label="moveaxis 3->1")

    # full predictor
    cfg = Config(model=ModelConfig(num_layers=2))
    state = create_state(cfg, jax.random.key(0))
    model = LDIPredictor(cfg.model)
    predict = jax.jit(lambda p, im: model.apply({"params": p}, im, K))
    timeit(predict, state.params, image, label="predict_ldi full")


if __name__ == "__main__":
    main()
