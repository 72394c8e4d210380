"""Checkpoint / resume via orbax + portable numpy export.

Capability parity with the reference's ``tf.train.Saver`` periodic
save / restore-latest idiom (``lsi/nnutils/train_utils.py``), upgraded to
the TPU-native stack: orbax ``CheckpointManager`` (async-safe, max_to_keep,
atomic), automatic resume-from-latest on startup (the failure-recovery
story), plus a pure-numpy ``.npz`` parameter export for portability and
parity tooling.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 5):
        self._dir = os.path.abspath(directory)
        os.makedirs(self._dir, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self._dir,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True),
        )

    def save(self, step: int, state: Any) -> None:
        self._mgr.save(step, args=ocp.args.StandardSave(state))

    def wait(self) -> None:
        self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, state_template: Any, step: Optional[int] = None) -> Any:
        """Restore into the structure of ``state_template``; returns it
        unchanged if no checkpoint exists (fresh start)."""
        step = self._mgr.latest_step() if step is None else step
        if step is None:
            return state_template
        return self._mgr.restore(
            step, args=ocp.args.StandardRestore(state_template))

    def restore_raw(self, step: Optional[int] = None) -> Optional[dict]:
        """Restore the saved tree with its OWN structure (plain dicts of
        numpy arrays), no template. None if no checkpoint exists.

        This is the right call for consumers that need only a slice of
        the train state (eval wants ``params`` + ``step``): a structure
        template from a differently-configured state would fail the
        strict orbax match — e.g. a checkpoint trained with the EMA
        teacher carries ``ema_params`` that a teacherless eval config's
        template lacks."""
        step = self._mgr.latest_step() if step is None else step
        if step is None:
            return None
        return self._mgr.restore(step, args=ocp.args.StandardRestore())

    def close(self) -> None:
        self._mgr.wait_until_finished()
        self._mgr.close()


#: Reserved key prefix for scalar metadata riding inside a params .npz.
#: Param keys are '/'-joined flax module paths and can never collide.
NPZ_META_PREFIX = "__meta_"


def export_params_npz(params, path: str, meta=None) -> None:
    """Flatten a param pytree to a portable .npz (keys are '/'-joined).

    ``meta`` (optional dict of scalars) is stored INSIDE the npz under
    reserved ``__meta_<name>`` keys, so (params, metadata) commit as ONE
    atomic file — a two-file (npz + json sidecar) commit has a crash window
    where a new npz pairs with a stale sidecar, and a best-export tracker
    seeded from that stale value would let a worse later eval overwrite the
    run's true best."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    out = {}
    for keypath, leaf in flat:
        key = "/".join(str(getattr(k, "key", getattr(k, "idx", k)))
                       for k in keypath)
        out[key] = np.asarray(leaf)
    for k, v in (meta or {}).items():
        out[NPZ_META_PREFIX + k] = np.asarray(v)
    np.savez(path, **out)


def read_params_npz_meta(path: str) -> dict:
    """The ``meta`` dict stored by export_params_npz (empty if none)."""
    prefix = NPZ_META_PREFIX
    with np.load(path) as data:
        return {k[len(prefix):]: data[k].item()
                for k in data.files if k.startswith(prefix)}


def import_params_npz(params_template, path: str):
    """Load a .npz export back into the given pytree structure."""
    data = np.load(path)
    flat, treedef = jax.tree_util.tree_flatten_with_path(params_template)
    leaves = []
    for keypath, leaf in flat:
        key = "/".join(str(getattr(k, "key", getattr(k, "idx", k)))
                       for k in keypath)
        arr = data[key]
        assert arr.shape == leaf.shape, (key, arr.shape, leaf.shape)
        leaves.append(arr.astype(leaf.dtype))
    return jax.tree_util.tree_unflatten(treedef, leaves)
