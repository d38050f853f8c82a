"""Worker for tests/test_two_process.py — runs as 1-of-N real processes.

Argv: rank world coordinator_port outfile. The parent sets the CPU platform
env (4 virtual devices per process). Exercises the REAL multi-process
branches: jax.distributed.initialize, ShardedDataset per-host shards,
evaluator ``_sum_across_processes`` (multihost allgather), and one GPS train
step over a global mesh spanning both processes (production shard_module /
shard_batch placement code).
"""

import json
import sys

rank, world, port, outfile = (int(sys.argv[1]), int(sys.argv[2]),
                              int(sys.argv[3]), sys.argv[4])

import jax  # noqa: E402

if world > 1:
    jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                               num_processes=world, process_id=rank)

import numpy as np  # noqa: E402
from flax import nnx  # noqa: E402

import sceneverse_tpu.model  # noqa: F401,E402
from __graft_entry__ import _gps_batch, _gps_cfg  # noqa: E402
from sceneverse_tpu.data.sharding import ShardedDataset  # noqa: E402
from sceneverse_tpu.evaluator.build import _sum_across_processes  # noqa: E402
from sceneverse_tpu.model import build_model  # noqa: E402
from sceneverse_tpu.optim.build import build_optim  # noqa: E402
from sceneverse_tpu.parallel.mesh import (make_mesh, shard_batch,  # noqa: E402
                                          shard_module)

results = {"rank": rank, "world": jax.process_count(),
           "n_devices": jax.device_count(),
           "n_local": jax.local_device_count()}

# 1) per-host dataset shards
shard = ShardedDataset(list(range(103)), world, rank)
results["shard"] = [int(shard[i]) for i in range(len(shard))]

# 2) evaluator cross-process metric sum
local = np.asarray([float(rank + 1), 10.0 * (rank + 1)], np.float32)
results["summed"] = [float(x) for x in _sum_across_processes(local)]

# 3) one GPS train step over the global mesh
n_dev = jax.device_count()
cfg = _gps_cfg(hidden=64, layers=1, vocab=512)
for part in ("language", "vision", "grounding"):
    cfg.model[part].args.num_attention_heads = 4
    if "dim_feedforward" in cfg.model[part].args:
        cfg.model[part].args.dim_feedforward = 96

mesh = make_mesh(n_dev, mp=1)
model = build_model(cfg, rngs=nnx.Rngs(0))
model.train()
loss_mod, tx, _, _ = build_optim(cfg, model, total_steps=100)
optimizer = nnx.Optimizer(model, tx, wrt=nnx.Param)
shard_module(model, mesh)
shard_module(optimizer, mesh)

batch = _gps_batch(n_dev, num_obj=4, num_points=64, seq_len=12, vocab=512,
                   cap_len=12)
batch = {k: np.asarray(v) for k, v in batch.items()}  # identical on all ranks
batch = shard_batch(batch, mesh)


@nnx.jit
def train_step(model, optimizer, batch):
    def loss_fn(model):
        out = model(batch)
        total, _ = loss_mod(out)
        return total

    total, grads = nnx.value_and_grad(loss_fn)(model)
    optimizer.update(model, grads)
    return total


with mesh:
    total = train_step(model, optimizer, batch)
    jax.block_until_ready(total)
results["loss"] = float(total.addressable_data(0))

# a post-step parameter probe: all ranks must agree after the update
probe = nnx.state(model)["lang_encoder"]["model"]["embeddings"][
    "word_embeddings"]["embedding"].value
results["param_probe"] = float(
    jax.numpy.abs(probe).sum().addressable_data(0))

with open(outfile, "w") as f:
    json.dump(results, f)
print(f"worker {rank}/{world} ok", flush=True)
