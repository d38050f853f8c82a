"""Device mesh + sharding utilities — the framework's distributed runtime.

Replaces the reference's entire torch.distributed/NCCL/Accelerate stack
(reference common/dist_utils.py, common/misc.py, trainer/build.py:66-75):

  * DDP gradient all-reduce        -> batch-dim sharding under jit; XLA emits
                                      the reduce over the mesh automatically
  * contrastive-loss all_gather    -> global-batch loss math; XLA inserts
    (contra_loss.py:61-64)            all-gather/reduce-scatter from shardings
  * eval-side object gathers       -> jit'd metric sums are already global;
    (misc.py:43-140)                  multihost: multihost_utils allgather
  * SLURM/accelerate launchers     -> jax.distributed.initialize (multi-host)

The default mesh is 1-D data-parallel over all devices ('dp'); an optional
'mp' axis shards the big vocab heads (30522-way LM head) when requested.
Collectives ride ICI within a slice; DCN across slices is handled by device
order (jax places same-slice devices adjacent).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_MESH: Optional[Mesh] = None


def get_mesh(num_devices: Optional[int] = None, mp: int = 1) -> Mesh:
    """Build (and cache) the global mesh: ('dp', 'mp')."""
    global _MESH
    devices = jax.devices()
    n = num_devices or len(devices)
    if _MESH is not None and _MESH.devices.size == n:
        return _MESH
    devs = np.asarray(devices[:n]).reshape(n // mp, mp)
    _MESH = Mesh(devs, ("dp", "mp"))
    return _MESH


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over 'dp'."""
    return NamedSharding(mesh, P("dp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """Place a host batch dict onto the mesh, batch-dim sharded.

    Scalars / 0-d entries are replicated. Non-array values pass through
    (they must not enter jit).
    """
    bs = batch_sharding(mesh)
    rep = replicated(mesh)

    def place(x):
        if hasattr(x, "ndim"):
            return jax.device_put(x, bs if x.ndim >= 1 else rep)
        return x

    return {k: place(v) for k, v in batch.items()}
