"""lsi_tpu — a TPU-native (JAX/XLA/Pallas) layered-scene-inference framework.

Re-implements, TPU-first, the capabilities of google/layered-scene-inference
(Tulsiani, Tucker, Snavely — "Layer-structured 3D Scene Inference via View
Synthesis", ECCV 2018): a convolutional encoder-decoder predicts a Layered
Depth Image (LDI: per-layer texture + disparity) from a single RGB image, and
a fully differentiable rendering core (projective transforms, bilinear gather
sampling, forward splatting, soft z-buffer compositing) synthesizes novel
views so the whole pipeline trains from stereo pairs with view-synthesis
losses — no direct 3D supervision.

Public API (layouts normative, mirroring the reference — see BASELINE.json):
    predict_ldi(image) -> LDI          # image (B, H, W, 3) float in [0, 1]
    render(ldi, pose)  -> image        # novel-view RGB (B, H, W, 3)

with LDI textures (B, L, H, W, 3) and disparities (B, L, H, W, 1).

Reference parity citations use the canonical public repo layout
(``lsi/geometry/...``) — the mounted reference tree was empty at build time,
so module-path citations stand in for file:line (see SURVEY.md §0).
"""

__version__ = "0.1.0"

# Lazy public API (PEP 562): importing the package must not drag in the
# JAX runtime — data-pipeline worker processes import pure-numpy submodules
# (lsi_tpu.data.synthetic) and must stay lightweight, and `import lsi_tpu`
# from tooling/scripts should not pay (or race for) accelerator init.
_EXPORTS = {
    "predict_ldi": ("lsi_tpu.api", "predict_ldi"),
    "render": ("lsi_tpu.api", "render"),
    "LSIModel": ("lsi_tpu.api", "LSIModel"),
    "LDI": ("lsi_tpu.geometry.ldi", "LDI"),
    "Config": ("lsi_tpu.config", "Config"),
    "RenderConfig": ("lsi_tpu.config", "RenderConfig"),
    "ModelConfig": ("lsi_tpu.config", "ModelConfig"),
}


def __getattr__(name: str):
    if name in _EXPORTS:
        import importlib

        module, attr = _EXPORTS[name]
        value = getattr(importlib.import_module(module), attr)
        globals()[name] = value  # cache: later lookups skip __getattr__
        return value
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


def __dir__():
    return sorted(set(globals()) | set(_EXPORTS))
