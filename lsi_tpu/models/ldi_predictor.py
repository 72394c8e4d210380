"""LDI prediction heads: image -> per-layer (texture, disparity).

Capability parity with the output heads of the reference's
``lsi/nnutils/nets.py``: L sigmoid disparity maps scaled to
[min_disparity, max_disparity] with an *enforced depth ordering* across
layers (deeper layer = strictly smaller disparity, parametrized
multiplicatively so ordering holds by construction, not by penalty), and L
RGB textures where layer 0 may be the input-image passthrough (the visible
surface) while deeper layers are predicted/inpainted.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from lsi_tpu.config import ModelConfig
from lsi_tpu.geometry.ldi import LDI
from lsi_tpu.models.unet import UNet


def _layer0_owned_channels(cfg: ModelConfig, name: str) -> int:
    """How much of a top-level param module layer-0's output depends on.

    Returns -1 for "the whole tensor" (the shared UNet trunk), N for "the
    leading N output channels" (channel 0 of ``disp_head``; channels 0-2 of
    ``tex_head`` when layer-0 texture is predicted — a conv's output
    channels have disjoint kernels, so per-channel slicing separates the
    layers exactly), and 0 for deep-only modules. In the
    ``deep_heads_stopgrad_trunk`` architecture the heads are disjoint
    modules and ``disp_head``/``tex_head`` are layer-0-only, so the leading
    slice IS the whole tensor there. The single source of truth for the
    layer-0/deep param partition — used by both the freeze mask and the
    best-checkpoint splice below.
    """
    if name.startswith("UNet"):
        return -1
    if name == "disp_head":
        return 1
    if name == "tex_head" and not cfg.layer0_texture_from_input:
        return 3
    return 0


def freeze_layer0_grad_mask(cfg: ModelConfig, tree):
    """Zero the entries of a grad/update pytree that feed layer-0's output.

    The late-phase layer-0 freeze (``train.freeze_layer0_step``): see
    ``_layer0_owned_channels`` for the exact param partition.

    Applied by the trainer to BOTH the gradients (keeps Adam moments of
    frozen entries decaying instead of accumulating) and the optimizer
    updates (Adam's momentum tail would otherwise keep moving frozen params
    for ~1/(1-b1) steps after the switch) — the frozen entries are bitwise
    constant from the switch on.
    """
    def mask(path, g):
        n = _layer0_owned_channels(cfg, getattr(path[0], "key",
                                                str(path[0])))
        if n < 0:
            return jnp.zeros_like(g)
        if n:
            return g.at[..., :n].set(0.0)
        return g
    return jax.tree_util.tree_map_with_path(mask, tree)


def splice_layer0_params(cfg: ModelConfig, live, best):
    """Replace every param entry layer-0's output depends on with ``best``.

    The value side of ``freeze_layer0_grad_mask``'s partition: entries the
    mask freezes are taken from ``best`` (the run's best-eval export), the
    deep-only remainder keeps the ``live`` values. Used by
    ``train.freeze_layer0_from_best``: at the freeze boundary layer-0
    becomes "the best geometry the run ever measured, then immutable" —
    robust to both slow drift and transient collapses that a fixed-step
    freeze would pin (the r4 flagship run collapsed at ~step 2000 and the
    50%-horizon freeze captured the half-recovered state; BASELINE.md).
    """
    def splice(path, lv, bv):
        n = _layer0_owned_channels(cfg, getattr(path[0], "key",
                                                str(path[0])))
        if n < 0:
            return jnp.asarray(bv, lv.dtype)
        if n:
            return lv.at[..., :n].set(jnp.asarray(bv[..., :n], lv.dtype))
        return lv
    return jax.tree_util.tree_map_with_path(splice, live, best)


class LDIPredictor(nn.Module):
    config: ModelConfig = ModelConfig()

    @nn.compact
    def __call__(self, image: jnp.ndarray, intrinsics: jnp.ndarray) -> LDI:
        """image (B, H, W, 3) in [0,1]; intrinsics (B, 3, 3) -> LDI."""
        cfg = self.config
        dtype = jnp.dtype(cfg.compute_dtype)
        b, h, w, _ = image.shape
        l = cfg.num_layers

        feats = UNet(base_filters=cfg.base_filters,
                     num_scales=cfg.num_scales, dtype=dtype)(image)

        # Optional trunk isolation (anti-drift; see ModelConfig): deep
        # layers read the features through stop_gradient via a private
        # conv branch, so their training signal cannot move the trunk —
        # the r3 toy testbed showed hidden-layer gradients leaking through
        # the shared trunk drive the late layer-0 depth drift.
        use_iso = cfg.deep_heads_stopgrad_trunk and l > 1
        if use_iso:
            feats_deep = jax.lax.stop_gradient(feats)
            feats_deep = nn.relu(nn.Conv(
                cfg.base_filters, (3, 3), padding="SAME", dtype=dtype,
                name="deep_trunk")(feats_deep))

        # --- Disparity heads: multiplicative ordering --------------------
        # Layer 0: d0 = dmin + (dmax - dmin) * sigmoid(raw0).
        # Layer i>0: d_i = d_{i-1} * (r + (cap - r) * sigmoid(raw_i)), with a
        # floor ratio r keeping layers separated from 0 disparity and an
        # optional cap < 1 forcing strict depth separation between
        # consecutive layers (a collapse guard: with cap == 1 a deep layer
        # can sit exactly on top of layer 0 and never learn hidden geometry).
        if use_iso:
            raw0 = nn.Conv(1, (3, 3), padding="SAME", dtype=dtype,
                           name="disp_head")(feats)
            rawd = nn.Conv(l - 1, (3, 3), padding="SAME", dtype=dtype,
                           name="disp_head_deep")(feats_deep)
            raw_disp = jnp.concatenate([raw0, rawd], axis=-1)
        else:
            raw_disp = nn.Conv(l, (3, 3), padding="SAME", dtype=dtype,
                               name="disp_head")(feats)
        raw_disp = raw_disp.astype(jnp.float32)
        sig = nn.sigmoid(raw_disp)  # (B, H, W, L)
        d0 = cfg.min_disparity + (cfg.max_disparity - cfg.min_disparity) * sig[..., 0]
        disps = [d0]
        floor_ratio = cfg.ordering_floor
        cap_ratio = cfg.ordering_cap
        for i in range(1, l):
            ratio = floor_ratio + (cap_ratio - floor_ratio) * sig[..., i]
            base = disps[-1]
            if use_iso:
                # Break the multiplicative gradient chain too: without
                # this, deep-layer losses still reach layer-0 (and the
                # trunk) through d_i = d_{i-1} * ratio_i. Ordering holds
                # numerically either way.
                base = jax.lax.stop_gradient(base)
            disps.append(base * ratio)
        disparity = jnp.stack(disps, axis=1)[..., None]  # (B, L, H, W, 1)

        # --- Texture heads ----------------------------------------------
        num_tex = l - 1 if cfg.layer0_texture_from_input else l
        if num_tex > 0:
            if use_iso:
                # Deep textures from the isolated branch; a predicted
                # layer-0 texture (if any) stays on the live trunk.
                chunks = []
                if not cfg.layer0_texture_from_input:
                    chunks.append(nn.Conv(3, (3, 3), padding="SAME",
                                          dtype=dtype,
                                          name="tex_head")(feats))
                chunks.append(nn.Conv((l - 1) * 3, (3, 3), padding="SAME",
                                      dtype=dtype,
                                      name="tex_head_deep")(feats_deep))
                raw_tex = jnp.concatenate(chunks, axis=-1)
            else:
                raw_tex = nn.Conv(num_tex * 3, (3, 3), padding="SAME",
                                  dtype=dtype, name="tex_head")(feats)
            tex = nn.sigmoid(raw_tex.astype(jnp.float32))
            tex = tex.reshape(b, h, w, num_tex, 3)
            tex = jnp.moveaxis(tex, 3, 1)  # (B, num_tex, H, W, 3)
        if cfg.layer0_texture_from_input:
            tex0 = image.astype(jnp.float32)[:, None]  # (B, 1, H, W, 3)
            textures = (jnp.concatenate([tex0, tex], axis=1)
                        if num_tex > 0 else tex0)
        else:
            textures = tex

        return LDI(textures=textures, disparities=disparity,
                   intrinsics=intrinsics.astype(jnp.float32))
