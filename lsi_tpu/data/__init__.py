"""Data pipelines: synthetic scenes, KITTI, SYNTHIA, device prefetch.

Lazy exports (PEP 562): worker processes import the pure-numpy scene
generators (``lsi_tpu.data.synthetic``) through this package and must not
pay for (or race with the parent over) the JAX runtime that
``pipeline``/loaders pull in.
"""

_EXPORTS = {
    "Batch": ("lsi_tpu.data.pipeline", "Batch"),
    "make_dataset": ("lsi_tpu.data.pipeline", "make_dataset"),
}


def __getattr__(name: str):
    if name in _EXPORTS:
        import importlib

        module, attr = _EXPORTS[name]
        value = getattr(importlib.import_module(module), attr)
        globals()[name] = value
        return value
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


def __dir__():
    return sorted(set(globals()) | set(_EXPORTS))
