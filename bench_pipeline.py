"""Input-pipeline + trainer-loop throughput at GPS scale.

Measures what bench.py deliberately excludes (reference analogs: worker
__getitem__ pipeline data/datasets/base.py:324-512, trainer hot loop
trainer/default_trainer.py:26-46):

  * item_build   — per-core ScanBase item construction rate (native C++ path);
                   multiply by host cores for the production feed rate.
  * collate      — DataLoader + numpy collate, no device transfer.
  * h2d          — shard_batch device placement of a GPS batch (126 MB);
                   through a remote-TPU tunnel this measures the tunnel, on a
                   directly-attached TPU VM it is PCIe DMA.
  * trainer_loop — the REAL trainer epoch (jit step + evaluator metric math +
                   batched log flush) fed from pre-placed device batches, so
                   the number isolates trainer overhead and is directly
                   comparable to bench.py's bare-loop scenes/s.

Prints one JSON line per phase. Usage: python bench_pipeline.py
"""

from __future__ import annotations

import argparse
import json
import os
import time
from pathlib import Path

os.environ.setdefault("SCENEVERSE_PALLAS_FAST", "1")

BATCH = 64
NUM_OBJ = 80
NUM_POINTS = 1024
SEQ_LEN = 50
CAP_LEN = 64
FIXTURE_SCANS = 4
FIXTURE_OBJECTS = 75          # leaves headroom under max_obj_len=80
PTS_PER_OBJ = 1800            # > num_points so subsampling is real work
ANNOS_PER_OBJ = 5


def fixture_root() -> Path:
    """GPS-scale fixture tree, cached across runs (it is ~60 MB of .pth)."""
    from sceneverse_tpu.data.fixture import write_synthetic_tree

    root = Path(os.environ.get("SCENEVERSE_BENCH_FIXTURE",
                               "/tmp/sceneverse_bench_fixture"))
    stamp = root / ".complete"
    tag = f"{FIXTURE_SCANS}-{FIXTURE_OBJECTS}-{PTS_PER_OBJ}-{ANNOS_PER_OBJ}"
    if not (stamp.exists() and stamp.read_text() == tag):
        import shutil

        if root.exists():
            shutil.rmtree(root)
        write_synthetic_tree(root, n_scans=FIXTURE_SCANS,
                             n_objects=FIXTURE_OBJECTS,
                             pts_per_obj=PTS_PER_OBJ,
                             annos_per_obj=ANNOS_PER_OBJ)
        stamp.write_text(tag)
    return root


def bench_cfg(data_root, exp_dir, num_workers=0, native=True):
    """Full-size GPS config (all_pretrain.yaml shape budget) on the fixture."""
    from sceneverse_tpu.config import Config

    return Config({
        "name": "BenchGPS", "rng_seed": 42, "num_gpu": 1, "mode": "train",
        "exp_dir": str(exp_dir), "task": "Pretrain",
        "trainer": "OpenVocabTrainer",
        "mixed_precision": "bf16",
        "debug": {"flag": False, "hard_debug": False},
        "data": {
            "train": ["ScanNetSpatialRefer"],
            "val": ["ScanNetSpatialRefer"],
            "test": ["ScanNetSpatialRefer"],
            "scan_family_base": str(data_root),
            "args": {
                "max_obj_len": NUM_OBJ, "max_seq_len": SEQ_LEN,
                "num_points": NUM_POINTS, "pc_type": "gt", "sem_type": "607",
                "filter_lang": False, "txt_mask_ratio": 0.15,
                "pc_mask_ratio": 0.1, "rot_aug": True,
                "mask_strategy": "random", "use_scene_cap": True,
                "max_scene_cap_len": CAP_LEN, "native_loader": native,
            },
            "ScanNetSpatialRefer": {
                "train": {"sources": ["scanrefer"]},
                "val": {"sources": ["scanrefer"]},
                "test": {"sources": ["scanrefer"]},
            },
        },
        "data_wrapper": {"train": "MaskDatasetWrapper",
                         "val": "ScanFamilyDatasetWrapperOld",
                         "test": "ScanFamilyDatasetWrapperOld"},
        "dataloader": {"batchsize": BATCH, "num_workers": num_workers},
        "solver": {
            "gradient_accumulation_steps": 1, "epochs_per_eval": 0,
            "epochs_per_save": 0, "log_every": 10,
            "lr": 5e-4, "grad_norm": 5.0, "epochs": 3,
            "optim": {"name": "AdamW", "args": {"betas": [0.9, 0.98]}},
            "sched": {"name": "warmup_cosine",
                      "args": {"warmup_steps": 500, "minimum_ratio": 0.1}},
        },
        "eval": {"train": {"name": "PretrainEval"},
                 "val": {"name": "ScanReferEval"}, "save": False},
        "model": {
            "name": "OpenVocab", "inter": "before",
            "language": {"name": "BERTLanguageEncoder", "lr": 1e-5,
                         "args": {"hidden_size": 768, "num_hidden_layers": 4,
                                  "num_attention_heads": 12}},
            "vision": {"name": "PointOpenVocabEncoder", "lr": 1e-4,
                       "args": {"hidden_size": 768, "freeze": True,
                                "num_attention_heads": 12, "num_layers": 4,
                                "dim_feedforward": 2048, "spatial_dim": 5,
                                "dim_loc": 6, "attn_type": "spatial",
                                "pairwise_rel_type": "center"}},
            "grounding": {"name": "UnifiedSpatialCrossEncoderV2", "lr": 1e-4,
                          "args": {"hidden_size": 768, "num_attention_heads": 12,
                                   "num_layers": 4, "dim_feedforward": 2048,
                                   "dim_loc": 6}},
            "heads": {"head_list": ["pretrain_head"],
                      "pretrain_head": {"name": "OVPretrainHead",
                                        "args": {"hidden_size": 768,
                                                 "vocab_size": 30522}}},
            "loss_list": ["lm_cls_loss", "TextObjWithinBatch",
                          "TextSceneBetweenBatch"],
            "vis_loss_list": ["lm_cls_loss", "TextObjWithinBatch",
                              "TextSceneBetweenBatch"],
        },
    })


def emit(metric, value, unit="scenes/s", **extra):
    print(json.dumps({"metric": metric, "value": round(value, 2),
                      "unit": unit, **extra}), flush=True)


def bench_item_build(cfg, n=24):
    from sceneverse_tpu.data.build import get_dataset

    ds = get_dataset(cfg, "train")
    ds[0]  # warm (opens .pth, builds caches)
    t0 = time.perf_counter()
    for i in range(n):
        ds[i]
    rate = n / (time.perf_counter() - t0)
    emit("item_build_scenes_per_sec_per_core", rate)
    return ds, rate


def bench_collate(cfg, steps=6):
    from sceneverse_tpu.data import build_dataloader

    loader = build_dataloader(cfg, split="train")
    it = iter(loader)
    next(it)  # warm
    t0, n = time.perf_counter(), 0
    for _ in range(steps):
        batch = next(it)
        n += batch["obj_fts"].shape[0]
    rate = n / (time.perf_counter() - t0)
    emit("loader_collate_scenes_per_sec", rate,
         workers=int(cfg.dataloader.num_workers))
    return batch, rate


def bench_materialized(cfg, steps=10, n_threads=1):
    """Fused materialized batch assembly (data/materialized.py) — the
    production train feed path."""
    from sceneverse_tpu.config import Config
    from sceneverse_tpu.data.materialized import (
        MaterializedBatchLoader, ensure_materialized)

    cfg = Config(cfg.to_dict())
    cfg.data.args["materialized"] = "fast"
    store = ensure_materialized(cfg, "ScanNetSpatialRefer", "train")
    loader = MaterializedBatchLoader(cfg, [store], n_threads=n_threads)
    it = iter(loader)
    batch = next(it)  # warm (faults the mmap pages)
    n, t0 = 0, time.perf_counter()
    for _ in range(steps):
        try:
            batch = next(it)
        except StopIteration:
            it = iter(loader)
            batch = next(it)
        n += batch["obj_fts"].shape[0]
    rate = n / (time.perf_counter() - t0)
    emit("materialized_feed_scenes_per_sec", rate, threads=n_threads)
    return batch, rate


def bench_h2d(batch, mesh, iters=4):
    import jax

    from sceneverse_tpu.parallel.mesh import shard_batch

    arrays = {k: v for k, v in batch.items() if hasattr(v, "ndim")}
    nbytes = sum(v.nbytes for v in arrays.values())
    out = shard_batch(arrays, mesh)  # warm
    jax.block_until_ready(out["obj_fts"])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = shard_batch(arrays, mesh)
        jax.block_until_ready(out["obj_fts"])
    dt = (time.perf_counter() - t0) / iters
    emit("h2d_batch_transfer_mb_per_sec", nbytes / dt / 1e6, unit="MB/s",
         batch_mb=round(nbytes / 1e6, 1))
    return out


class DeviceBatchLoader:
    """Fixed ring of pre-placed device batches — isolates the trainer loop
    from host build + H2D so the number is comparable to bench.py."""

    def __init__(self, batches, length):
        self.batches = batches
        self.length = length

    def __len__(self):
        return self.length

    def __iter__(self):
        for i in range(self.length):
            yield dict(self.batches[i % len(self.batches)])


def bench_trainer_loop(cfg, device_batches, steps):
    import jax

    from sceneverse_tpu.trainer import build_trainer

    trainer = build_trainer(cfg)
    trainer.data_loaders["train"] = DeviceBatchLoader(device_batches, steps)
    trainer.total_steps = steps * 3
    trainer.train_step(0)                      # compile + warm epoch
    t0 = time.perf_counter()
    trainer.train_step(1)                      # steady state (timed)
    dt = time.perf_counter() - t0
    rate = steps * int(cfg.dataloader.batchsize) / dt
    emit("trainer_loop_scenes_per_sec", rate, steps=steps,
         log_every=int(cfg.solver.log_every))
    return trainer, rate


class BoundedLoader:
    """Bound any host-batch loader to ``steps`` batches per epoch."""

    def __init__(self, loader, steps):
        self.loader, self.steps = loader, steps

    def __len__(self):
        return self.steps

    def __iter__(self):
        it = iter(self.loader)
        for _ in range(self.steps):
            try:
                yield next(it)
            except StopIteration:
                it = iter(self.loader)
                try:
                    yield next(it)
                except StopIteration:
                    # PEP 479 would surface this as an opaque
                    # "generator raised StopIteration" RuntimeError
                    raise RuntimeError(
                        "BoundedLoader: wrapped loader yields no batches "
                        "(empty split / everything filtered out?)") from None


def bench_trainer_feed(cfg, steps, n_threads=1):
    """END-TO-END train throughput with the loader IN the loop: materialized
    batch assembly -> packed h2d -> fused train step, per epoch (VERDICT r4
    item 5 — the device-resident `bench_trainer_loop` number assumes a free
    host feed; this one pays for it). jax's async dispatch overlaps the next
    batch's host assembly with the in-flight device step, so on a host whose
    aggregate feed rate exceeds the chip's step rate this converges to the
    device-resident number."""
    from sceneverse_tpu.config import Config
    from sceneverse_tpu.data.materialized import (
        MaterializedBatchLoader, ensure_materialized)
    from sceneverse_tpu.trainer import build_trainer

    cfg = Config(cfg.to_dict())
    cfg.data.args["materialized"] = "fast"
    store = ensure_materialized(cfg, "ScanNetSpatialRefer", "train")
    loader = MaterializedBatchLoader(cfg, [store], n_threads=n_threads)
    trainer = build_trainer(cfg)
    trainer.data_loaders["train"] = BoundedLoader(loader, steps)
    trainer.total_steps = steps * 3
    trainer.train_step(0)                      # compile + warm epoch
    t0 = time.perf_counter()
    trainer.train_step(1)                      # steady state (timed)
    dt = time.perf_counter() - t0
    rate = steps * int(cfg.dataloader.batchsize) / dt
    emit("trainer_feed_scenes_per_sec", rate, steps=steps,
         threads=n_threads)
    trainer.close()
    return rate


def bench_eval_loop(cfg, trainer, mesh, steps=12):
    """Eval-mode epoch rate: jit forward + evaluator host update per batch
    (reference trainer/openvocab_trainer.py:55-80 runs this every epoch)."""
    import jax

    from sceneverse_tpu.data import build_dataloader
    from sceneverse_tpu.parallel.mesh import shard_batch

    loader = build_dataloader(cfg, split="val")
    loader = loader[0] if isinstance(loader, list) else loader
    raw = next(iter(loader))
    arrays = {k: v for k, v in raw.items() if hasattr(v, "ndim")}
    aux = {k: v for k, v in raw.items() if not hasattr(v, "ndim")}
    device_batch = {**shard_batch(arrays, mesh), **aux}
    trainer.data_loaders["val"] = DeviceBatchLoader([device_batch], steps)
    trainer._eval_loop("val", "val")       # compile + warm
    trainer.data_loaders["val"] = DeviceBatchLoader([device_batch], steps)
    t0 = time.perf_counter()
    trainer._eval_loop("val", "val")
    dt = time.perf_counter() - t0
    rate = steps * raw["obj_fts"].shape[0] / dt
    emit("eval_loop_scenes_per_sec", rate, steps=steps)
    return rate


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=16)
    ap.add_argument("--workers", type=int, default=0,
                    help="DataLoader workers (default 0: this rig has 1 core)")
    ap.add_argument("--skip-trainer", action="store_true")
    ap.add_argument("--feed-sweep", action="store_true",
                    help="n_threads sweep of the materialized feed at "
                         "GPS-scale points + loader-in-the-loop trainer "
                         "throughput (VERDICT r4 item 5)")
    args = ap.parse_args()

    import sceneverse_tpu.data  # noqa: F401
    import sceneverse_tpu.evaluator  # noqa: F401
    import sceneverse_tpu.model  # noqa: F401
    import sceneverse_tpu.trainer  # noqa: F401
    from sceneverse_tpu.parallel.mesh import mesh_from_cfg, shard_batch

    root = fixture_root()
    exp = Path("/tmp/sceneverse_bench_exp")
    exp.mkdir(exist_ok=True)
    cfg = bench_cfg(root, exp, num_workers=args.workers)

    mesh = mesh_from_cfg(cfg)
    if args.feed_sweep:
        for nt in (1, 2, 4):
            bench_materialized(cfg, steps=16, n_threads=nt)
        bench_trainer_feed(cfg, steps=args.steps,
                           n_threads=max(1, args.workers))
        return
    bench_item_build(cfg)
    bench_materialized(cfg, n_threads=max(1, args.workers))
    batch, _ = bench_collate(cfg)
    arrays = {k: v for k, v in batch.items() if hasattr(v, "ndim")}
    bench_h2d(batch, mesh)

    if not args.skip_trainer:
        # two distinct device-resident batches (ring) so steps aren't
        # value-degenerate, placed once before timing
        import numpy as np

        b2 = {k: (np.ascontiguousarray(v[::-1]) if hasattr(v, "ndim") and v.ndim
                  else v) for k, v in arrays.items()}
        device_batches = [shard_batch(arrays, mesh), shard_batch(b2, mesh)]
        trainer, _ = bench_trainer_loop(cfg, device_batches, args.steps)
        bench_eval_loop(cfg, trainer, mesh)


if __name__ == "__main__":
    main()
