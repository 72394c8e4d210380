"""Device mesh construction and sharding rules — the communication backend.

The reference is a single-process, single-device TF1 program with no
distribution machinery (SURVEY.md §2); this module is the TPU-native
first-class replacement: it owns the ``jax.sharding.Mesh``, the
``NamedSharding`` rules (batch arrays sharded over the ``data`` axis,
parameters replicated), and the jit-level sharding annotations for the train
step. All collectives (gradient ``psum`` etc.) are emitted by XLA from these
annotations and ride ICI within a slice; multi-host DCN initialization is a
thin optional hook behind the same interface.

Scaling model (v5e-8 and beyond): pure data parallelism — the LDI model is
~10 MB of parameters (vs ~16 GB HBM/chip), so TP/PP/EP are structurally
unnecessary; the scale axes are batch x resolution x layers (SURVEY.md §2
parallelism inventory). Spatial sharding of the render for extreme
resolutions is documented in docs/parity.md as a future axis.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


@dataclasses.dataclass(frozen=True)
class MeshPlan:
    """A mesh plus the framework's canonical sharding rules."""
    mesh: Mesh

    @property
    def num_devices(self) -> int:
        return self.mesh.size

    def batch_sharding(self) -> NamedSharding:
        """Leading-axis (batch) sharding for data arrays of any rank."""
        return NamedSharding(self.mesh, P(DATA_AXIS))

    def replicated(self) -> NamedSharding:
        """Fully-replicated sharding (params, opt state, scalars)."""
        return NamedSharding(self.mesh, P())

    def shard_batch(self, tree):
        """Place a host batch pytree onto the mesh, batch-axis sharded."""
        s = self.batch_sharding()
        return jax.tree.map(
            lambda x: jax.device_put(x, s) if x is not None else None, tree)

    def replicate(self, tree):
        """Place a pytree onto the mesh fully replicated."""
        s = self.replicated()
        return jax.tree.map(
            lambda x: jax.device_put(x, s) if x is not None else None, tree)


def make_mesh_plan(devices: Optional[Sequence[jax.Device]] = None,
                   multi_host: bool = False) -> MeshPlan:
    """Build the 1-D data-parallel mesh over all (local) devices.

    Args:
      devices: explicit device list (tests pass subsets); defaults to all.
      multi_host: initialize jax.distributed first (multi-slice DCN). On a
        single slice this is a no-op kept behind the flag so the same entry
        point serves both.
    """
    if multi_host:
        # Standard JAX multi-host bring-up; coordinator discovery comes from
        # the TPU environment. Safe only when launched on all hosts.
        jax.distributed.initialize()
        devices = jax.devices() if devices is None else devices
    if devices is None:
        devices = jax.local_devices()
    mesh = Mesh(np.asarray(devices), (DATA_AXIS,))
    return MeshPlan(mesh=mesh)


def assert_divisible(global_batch: int, plan: MeshPlan) -> None:
    if global_batch % plan.num_devices != 0:
        raise ValueError(
            f"global batch {global_batch} not divisible by mesh size "
            f"{plan.num_devices}")
