"""Public API — mirrors the reference surface (BASELINE.json, normative):

    predict_ldi(image) -> ldi      # (B, H, W, 3) -> LDI(B, L, H, W, ...)
    render(ldi, pose)  -> image    # LDI + (B, 4, 4) pose -> (B, H, W, 3)

``render`` is a pure jit-friendly function. ``predict_ldi`` needs network
parameters; use :class:`LSIModel` to bundle (config, params) — or pass
``params`` explicitly to the functional form.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from lsi_tpu.config import Config, ModelConfig, RenderConfig
from lsi_tpu.geometry import projection
from lsi_tpu.geometry.ldi import LDI, render_forward
from lsi_tpu.models.ldi_predictor import LDIPredictor


def default_intrinsics(batch: int, height: int, width: int) -> jnp.ndarray:
    """A generic driving-camera K when none is supplied (fx ~ 0.95 * W)."""
    fx = 0.95 * width
    fy = 0.95 * width
    cx = (width - 1) / 2.0
    cy = (height - 1) / 2.0
    K = projection.intrinsics_matrix(fx, fy, cx, cy)
    return jnp.broadcast_to(K, (batch, 3, 3))


def predict_ldi(image: jnp.ndarray, params,
                config: Optional[ModelConfig] = None,
                intrinsics: Optional[jnp.ndarray] = None) -> LDI:
    """Functional LDI prediction: image (B, H, W, 3) in [0, 1] -> LDI."""
    config = config or ModelConfig()
    if intrinsics is None:
        b, h, w, _ = image.shape
        intrinsics = default_intrinsics(b, h, w)
    model = LDIPredictor(config)
    return model.apply({"params": params}, image, intrinsics)


def render(ldi: LDI, pose: jnp.ndarray,
           config: Optional[RenderConfig] = None,
           K_trg: Optional[jnp.ndarray] = None,
           out_hw=None) -> jnp.ndarray:
    """Render an LDI into the camera at ``pose`` (source->target, (B,4,4)).

    Returns the composited novel-view RGB (B, Ho, Wo, 3). For the full
    render dict (disparity, coverage) use geometry.ldi.render_forward.
    """
    config = config or RenderConfig()
    out = render_forward(
        ldi, pose, K_trg=K_trg, out_hw=out_hw,
        zbuffer_scale=config.zbuffer_scale,
        splat_method=config.splat_method,
        use_pallas=config.use_pallas,
        pallas_max_dy=config.pallas_max_dy,
        check_window=config.window_check)
    frac = out["window_dropped_frac"]
    if config.window_check and not isinstance(frac, jax.core.Tracer):
        # Eager call: the diagnostic is concrete — warn on truncation here.
        # Under jit the caller owns the returned scalar (see render_forward).
        from lsi_tpu.geometry.ldi import warn_window_drop
        warn_window_drop(frac, config.pallas_max_dy)
    return out["rgb"]


class LSIModel:
    """Bundles (config, params): the user-facing handle.

    >>> model = LSIModel.init(jax.random.key(0), config)
    >>> ldi = model.predict_ldi(image)
    >>> novel = model.render(ldi, pose)
    """

    def __init__(self, config: Config, params):
        self.config = config
        self.params = params
        self._predict = jax.jit(
            lambda p, img, K: LDIPredictor(config.model).apply(
                {"params": p}, img, K))

    @classmethod
    def init(cls, rng, config: Optional[Config] = None,
             height: Optional[int] = None, width: Optional[int] = None):
        config = config or Config()
        h = height or config.data.height
        w = width or config.data.width
        dummy = jnp.zeros((1, h, w, 3), jnp.float32)
        variables = LDIPredictor(config.model).init(
            rng, dummy, default_intrinsics(1, h, w))
        return cls(config, variables["params"])

    def predict_ldi(self, image: jnp.ndarray,
                    intrinsics: Optional[jnp.ndarray] = None) -> LDI:
        if intrinsics is None:
            b, h, w, _ = image.shape
            intrinsics = default_intrinsics(b, h, w)
        return self._predict(self.params, image, intrinsics)

    def render(self, ldi: LDI, pose: jnp.ndarray, **kw) -> jnp.ndarray:
        return render(ldi, pose, config=self.config.render, **kw)

    def save(self, path: str) -> None:
        """Single-file portable export: params + config in one ``.npz``.

        The flat param arrays ride the portable export format
        (train/checkpoint.export_params_npz keys) with the full config tree
        embedded as a JSON sidecar key — no orbax / framework state needed
        to reload for serving.
        """
        import dataclasses
        import json

        import numpy as np

        flat = jax.tree_util.tree_flatten_with_path(self.params)[0]
        out = {}
        for keypath, leaf in flat:
            key = "/".join(str(getattr(k, "key", getattr(k, "idx", k)))
                           for k in keypath)
            out["params/" + key] = np.asarray(leaf)
        out["__config__"] = np.frombuffer(
            json.dumps(dataclasses.asdict(self.config)).encode(), np.uint8)
        np.savez(path, **out)

    @classmethod
    def load(cls, path: str) -> "LSIModel":
        """Reload a :meth:`save` export (config + params)."""
        import json

        import numpy as np

        from lsi_tpu.config import (Config, DataConfig, LossConfig,
                                    ModelConfig, TrainConfig)

        data = np.load(path)
        raw = json.loads(bytes(data["__config__"]).decode())
        config = Config(model=ModelConfig(**raw["model"]),
                        render=RenderConfig(**raw["render"]),
                        loss=LossConfig(**raw["loss"]),
                        data=DataConfig(**raw["data"]),
                        train=TrainConfig(**raw["train"]))
        template = cls.init(jax.random.key(0), config)
        flat, treedef = jax.tree_util.tree_flatten_with_path(template.params)
        leaves = []
        for keypath, leaf in flat:
            key = "params/" + "/".join(
                str(getattr(k, "key", getattr(k, "idx", k)))
                for k in keypath)
            arr = data[key]
            assert arr.shape == leaf.shape, (key, arr.shape, leaf.shape)
            leaves.append(arr.astype(leaf.dtype))
        return cls(config, jax.tree_util.tree_unflatten(treedef, leaves))
