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
'mp' axis (config ``parallel.mp``) shards the big vocab heads (the 30522-way
LM head, reference modules/heads/pretrain_head.py:35-43) column-wise. This is
the single mesh-construction code path: ``BaseTrainer`` and the driver's
``dryrun_multichip`` both call :func:`mesh_from_cfg` + :func:`shard_module`.
Collectives ride ICI within a slice; DCN across slices is handled by device
order (jax places same-slice devices adjacent).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, mp: int = 1) -> Mesh:
    """Build a ('dp', 'mp') mesh over the first ``n_devices`` devices."""
    devices = jax.devices()
    n = n_devices or len(devices)
    if n % mp != 0:
        raise ValueError(f"n_devices={n} not divisible by mp={mp}")
    devs = np.asarray(devices[:n]).reshape(n // mp, mp)
    return Mesh(devs, ("dp", "mp"))


def mesh_from_cfg(cfg) -> Mesh:
    """Resolve mesh shape from config + available hardware.

    dp is ``min(devices/mp, num_gpu)`` further reduced until it divides the
    batch size (the reference requires batch % world_size == 0 implicitly via
    per-rank loaders, reference data/build.py:42-63); mp is the optional
    ``parallel.mp`` knob (no reference analog — the reference is DP-only,
    SURVEY §2.9).
    """
    mp = int(cfg.select("parallel.mp", 1)) if hasattr(cfg, "select") else 1
    n_dev = len(jax.devices())
    if n_dev % mp != 0:
        raise ValueError(f"{n_dev} devices not divisible by parallel.mp={mp}")
    avail_dp = n_dev // mp
    dp = min(avail_dp, int(cfg.get("num_gpu", avail_dp)) or avail_dp)
    batch = int(cfg.dataloader.batchsize) if cfg.get("dataloader") else dp
    while dp > 1 and batch % dp != 0:
        dp -= 1
    return make_mesh(n_devices=dp * mp, mp=mp)


def batch_sharding(mesh: Mesh, axis: int = 0) -> NamedSharding:
    """Shard the batch dim (``axis``) over 'dp'."""
    return NamedSharding(mesh, P(*([None] * axis), "dp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def global_put(x, sharding: NamedSharding):
    """Place host data onto a (possibly multi-process) sharding.

    Single-process: plain device_put. Multi-process: device_put rejects
    non-addressable shardings, so build the global array from per-shard
    callbacks — every process must hold the SAME host value (true for
    replicated params and for the identical-per-host batch contract the
    reference's DistributedSampler also assumes)."""
    if jax.process_count() == 1:
        return jax.device_put(x, sharding)
    import jax.numpy as jnp

    if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jax.dtypes.prng_key):
        # typed PRNG keys (NNX rng streams): ship the raw key data, re-wrap
        data = np.asarray(jax.random.key_data(x))
        extra = data.ndim - x.ndim
        inner = NamedSharding(sharding.mesh,
                              P(*sharding.spec, *([None] * extra)))
        arr = jax.make_array_from_callback(data.shape, inner,
                                           lambda idx: data[idx])
        return jax.random.wrap_key_data(arr, impl=jax.random.key_impl(x))
    x = np.asarray(x)
    return jax.make_array_from_callback(x.shape, sharding,
                                        lambda idx: x[idx])


def shard_batch(batch: dict, mesh: Mesh, axis: int = 0) -> dict:
    """Place a host batch dict onto the mesh, batch-dim sharded.

    ``axis`` is the batch dimension (1 for the trainer's stacked
    steps-per-dispatch batches of shape (K, B, ...)). Scalars / too-small
    entries are replicated, as are arrays whose batch dim doesn't divide dp
    (end-of-dataloader remainder batches — the analog of the reference's
    uneven-tail handling in ``gather_for_metrics``, reference
    common/misc.py:84-132; replication keeps the math exact at a small cost
    that only the last eval batch pays). Non-array values pass through (they
    must not enter jit).
    """
    bs = batch_sharding(mesh, axis)
    rep = replicated(mesh)
    dp = mesh.shape.get("dp", mesh.devices.size)

    def place(x):
        if hasattr(x, "ndim"):
            sharded = x.ndim > axis and x.shape[axis] % dp == 0
            target = bs if sharded else rep
            if isinstance(x, jax.Array) and x.committed and \
                    x.sharding.is_equivalent_to(target, x.ndim):
                return x  # already correctly placed (e.g. cached bench batch)
            return global_put(x, target)
        return x

    return {k: place(v) for k, v in batch.items()}


def _param_spec(dotted: str, leaf, mp: int):
    """PartitionSpec for one parameter leaf.

    Vocab-sized LM-head weights go column-parallel over 'mp' (output dim is
    the 30522-way vocab, reference modules/heads/pretrain_head.py:35-43);
    everything else is replicated. Heads whose vocab doesn't divide mp (the
    607-way object head) stay replicated.
    """
    if mp > 1 and hasattr(leaf, "ndim"):
        if ("pred_head.decoder.kernel" in dotted and leaf.ndim == 2
                and leaf.shape[1] % mp == 0):
            return P(None, "mp")
        if (dotted.endswith("pred_head.bias.value") and leaf.ndim == 1
                and leaf.shape[0] % mp == 0):
            return P("mp")
    return P()


def shard_module(module, mesh: Mesh) -> None:
    """Place an NNX module's (or optimizer's) state onto the mesh in place.

    Replicates everything except the mp-sharded vocab heads (see
    :func:`_param_spec`). Used by both the trainer and ``dryrun_multichip``
    so the dryrun exercises the production sharding code.
    """
    from flax import nnx

    mp = mesh.shape.get("mp", 1)

    def place(path, leaf):
        if not hasattr(leaf, "ndim"):
            return leaf
        names = [str(getattr(p, "key", getattr(p, "idx", p))) for p in path]
        spec = _param_spec(".".join(names), leaf, mp)
        return global_put(leaf, NamedSharding(mesh, spec))

    state = nnx.state(module)
    state = jax.tree_util.tree_map_with_path(place, state)
    nnx.update(module, state)


# ---------------------------------------------------------------------------
# Ambient mesh discovery for kernel call sites.
#
# GSPMD has no partitioning rule for an opaque pallas_call: given dp-sharded
# operands it inserts an ALL-GATHER and runs the kernel fully replicated on
# every device (verified on the 8-device CPU mesh) — each chip would process
# the whole global batch through the fused SA/MHA kernels. The fix is
# jax.shard_map over 'dp' at the call sites, which needs the mesh at trace
# time. Two discovery paths: the innermost `with mesh:` context (tests,
# dryrun_multichip), and the trainer-registered active mesh (the trainer
# shards via NamedSharding placement without entering a mesh context).
# ---------------------------------------------------------------------------
_ACTIVE: Optional[Mesh] = None


def set_active_mesh(mesh: Optional[Mesh]) -> None:
    """Register the mesh kernel call sites should shard_map over (trainer).
    Pass ``None`` to clear — a trainer/eval built later in the same process
    must not shard_map over a stale mesh (trainer __del__/close clears)."""
    global _ACTIVE
    _ACTIVE = mesh


class active_mesh:
    """Context manager form of set_active_mesh: registers on enter,
    restores the previous registration on exit."""

    def __init__(self, mesh: Optional[Mesh]):
        self.mesh = mesh

    def __enter__(self):
        self._prev = _ACTIVE
        set_active_mesh(self.mesh)
        return self.mesh

    def __exit__(self, *exc):
        set_active_mesh(self._prev)
        return False


def ambient_dp_mesh() -> Optional[Mesh]:
    """The mesh governing the current trace, if its 'dp' axis is non-trivial.

    Checks the physical `with mesh:` context first (jax keeps it on
    thread_resources; there is no public accessor for the *physical* context
    in jax 0.9 — get_abstract_mesh only sees `use_mesh`), then the
    trainer-registered active mesh. The private thread_resources read is
    guarded: if a jax upgrade moves it, discovery degrades to the registered
    mesh instead of crashing."""
    m = None
    try:
        from jax._src import mesh as mesh_lib

        m = mesh_lib.thread_resources.env.physical_mesh
    except Exception:
        m = None
    if m is None or m.empty:
        m = _ACTIVE
    if m is None or "dp" not in m.axis_names or m.shape["dp"] <= 1:
        return None
    return m


def dp_shard_map(fn, mesh: Mesh, n_sharded: int, n_replicated: int = 0,
                 out_specs=None):
    """shard_map ``fn`` over the mesh's 'dp' axis: the first ``n_sharded``
    args are dim-0 sharded, the next ``n_replicated`` replicated; outputs
    are dim-0 sharded unless ``out_specs`` (a pytree of PartitionSpec
    matching fn's outputs — P() marks a shard-identical/replicated output,
    e.g. a psum'd statistic) says otherwise. The caller must ensure dim 0
    of each sharded arg divides dp."""
    in_specs = (P("dp"),) * n_sharded + (P(),) * n_replicated
    # check_vma=False: pallas_call out_shapes carry no varying-mesh-axes
    # annotation, which the vma checker requires; the bodies are pure
    # per-shard compute (no collectives beyond explicit psums), so the
    # check adds nothing here
    return jax.shard_map(fn, mesh=mesh, in_specs=in_specs,
                         out_specs=P("dp") if out_specs is None
                         else out_specs, check_vma=False)


# Backwards-compatible cached accessor (pre-round-2 API).
_MESH: Optional[Mesh] = None


def get_mesh(num_devices: Optional[int] = None, mp: int = 1) -> Mesh:
    """Build (and cache) the global mesh: ('dp', 'mp')."""
    global _MESH
    n = num_devices or len(jax.devices())
    if _MESH is not None and _MESH.devices.size == n and \
            _MESH.shape.get("mp", 1) == mp:
        return _MESH
    _MESH = make_mesh(n, mp=mp)
    return _MESH
