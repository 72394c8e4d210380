"""Honest (scan+materialize) bisect of predictor components."""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
import flax.linen as nn

from lsi_tpu.models.unet import UNet, ConvBlock

LOOP = 10


def scan_time(step, carry, args, label, iters=3):
    @jax.jit
    def loop(c, *a):
        def body(cc, _):
            return step(cc, *a), ()
        out, _ = jax.lax.scan(body, c, None, length=LOOP)
        return out

    def mat(o):
        return float(np.asarray(jnp.sum(o)))

    mat(loop(carry, *args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = loop(carry, *args)
    mat(out)
    print(f"{label}: {(time.perf_counter() - t0) / (iters * LOOP) * 1e3:.3f}"
          " ms", flush=True)


def main():
    b, h, w = 8, 256, 768
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(size=(b, h, w, 3)), jnp.float32)

    unet = UNet(base_filters=32, num_scales=5)
    uv = unet.init(jax.random.key(0), img)

    def unet_step(x, v):
        f = unet.apply(v, x)
        return x + 1e-30 * jnp.mean(f.astype(jnp.float32))
    scan_time(unet_step, img, (uv,), "unet only")

    # single conv block (are convs themselves OK?)
    cb = ConvBlock(32, dtype=jnp.bfloat16)
    cbv = cb.init(jax.random.key(0), img)

    def cb_step(x, v):
        f = cb.apply(v, x)
        return x + 1e-30 * jnp.mean(f.astype(jnp.float32))
    scan_time(cb_step, img, (cbv,), "one ConvBlock 3->32 fullres")

    # heads on fixed feats
    feats = jax.jit(lambda v, x: unet.apply(v, x))(uv, img)
    conv2 = nn.Conv(2, (3, 3), padding="SAME", dtype=jnp.bfloat16)
    c2v = conv2.init(jax.random.key(1), feats)
    conv3 = nn.Conv(3, (3, 3), padding="SAME", dtype=jnp.bfloat16)
    c3v = conv3.init(jax.random.key(2), feats)

    def heads_step(f, c2v, c3v, img):
        raw = conv2.apply(c2v, f).astype(jnp.float32)
        sig = nn.sigmoid(raw)
        d0 = 0.01 + 0.99 * sig[..., 0]
        d1 = d0 * (0.2 + 0.8 * sig[..., 1])
        disp = jnp.stack([d0, d1], axis=1)[..., None]
        rawt = conv3.apply(c3v, f).astype(jnp.float32)
        tex = jnp.moveaxis(nn.sigmoid(rawt)[..., None, :], 3, 1)
        textures = jnp.concatenate([img.astype(jnp.float32)[:, None], tex],
                                   axis=1)
        return f + (1e-30 * (jnp.mean(disp) + jnp.mean(textures))).astype(f.dtype)
    scan_time(heads_step, feats, (c2v, c3v, img), "heads (5-D build)")

    def heads_flat_step(f, c2v, c3v, img):
        raw = conv2.apply(c2v, f).astype(jnp.float32)
        sig = nn.sigmoid(raw)
        d0 = 0.01 + 0.99 * sig[..., 0]
        d1 = d0 * (0.2 + 0.8 * sig[..., 1])
        disp = jnp.concatenate([d0, d1], axis=1)[..., None]  # (B, 2H, W, 1)
        rawt = conv3.apply(c3v, f).astype(jnp.float32)
        tex = nn.sigmoid(rawt)
        textures = jnp.concatenate([img.astype(jnp.float32), tex],
                                   axis=1)  # (B, 2H, W, 3)
        return f + (1e-30 * (jnp.mean(disp) + jnp.mean(textures))).astype(f.dtype)
    scan_time(heads_flat_step, feats, (c2v, c3v, img),
              "heads (folded 4-D build)")


if __name__ == "__main__":
    main()
