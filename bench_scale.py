"""Production-scale host-path drill (VERDICT r3 item 7).

SceneVerse production scale is ~68K scans / ~2.5M vision-language pairs.
The reference loads EVERY scan into RAM up front in each worker process
(reference data/datasets/base.py:65-142); this drill proves the rebuild does
not need to, and measures the absolute costs at that scan/item count on a
metadata-scale fixture (points deliberately small — the axis under test is
table/metadata scale, not point volume; per-batch WRITE volume is still
full-size because assembly subsamples every object to num_points):

  * fixture      — synthetic 68K-scan tree write time + disk size.
  * materialize  — live ScanBase init (the reference-style full up-front
                   load: seconds + RSS high-water) and the one-time
                   materialized-store build on top of it (data/materialized.py).
  * feed         — store-backed startup (mmap open + loader prep: seconds +
                   RSS, vs the full-load RSS above) and the fused
                   whole-batch assembly rate at the production item count.
  * feed_mesh    — the same feed placed onto a dp=8 virtual CPU device mesh
                   via shard_batch each batch (host->8-device placement
                   included), i.e. what one loader process delivers to an
                   8-chip pod slice.

Each phase runs in its own subprocess so ru_maxrss isolates its RAM
high-water. Prints one JSON line per phase. Results: BASELINE.md
"Production-scale host path".

Usage: python bench_scale.py [--scans 68000] [--annos-per-obj 12]
                             [--batch 128] [--root /tmp/sceneverse_scale]
"""

from __future__ import annotations

import argparse
import json
import os
import resource
import subprocess
import sys
import time
from pathlib import Path

NUM_OBJ = 80        # max_obj_len (GPS consumption shape)
NUM_POINTS = 1024
SEQ_LEN = 50
CAP_LEN = 64
FIX_OBJECTS = 6     # objects/scan in the fixture (3 foreground)
FIX_PTS = 24        # points/object — metadata drill, not point volume


def emit(metric, value, unit, **extra):
    print(json.dumps({"metric": metric, "value": round(value, 2),
                      "unit": unit, **extra}), flush=True)


def rss_gib() -> float:
    """Current process RAM high-water (ru_maxrss is KiB on Linux)."""
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 2**20


def tree_gib(path) -> float:
    total = 0
    for p in Path(path).rglob("*"):
        if p.is_file():
            total += p.stat().st_size
    return total / 2**30


def drill_cfg(root, batch):
    from sceneverse_tpu.config import Config

    return Config({
        "name": "ScaleDrill", "rng_seed": 42, "num_gpu": 1, "mode": "train",
        "exp_dir": str(Path(root) / "exp"), "task": "Pretrain",
        "debug": {"flag": False, "hard_debug": False},
        "data": {
            "train": ["ScanNetSpatialRefer"],
            "scan_family_base": str(root),
            "args": {
                "max_obj_len": NUM_OBJ, "max_seq_len": SEQ_LEN,
                "num_points": NUM_POINTS, "pc_type": "gt", "sem_type": "607",
                "filter_lang": False, "txt_mask_ratio": 0.15,
                "pc_mask_ratio": 0.1, "rot_aug": True,
                "mask_strategy": "random", "use_scene_cap": True,
                "max_scene_cap_len": CAP_LEN, "native_loader": True,
            },
            "ScanNetSpatialRefer": {"train": {"sources": ["scanrefer"]}},
        },
        "data_wrapper": {"train": "MaskDatasetWrapper"},
        "dataloader": {"batchsize": batch, "num_workers": 0},
    })


# ------------------------------------------------------------------ phases
def phase_fixture(args):
    from sceneverse_tpu.data.fixture import write_synthetic_tree

    root = Path(args.root)
    stamp = root / ".complete"
    tag = f"{args.scans}-{FIX_OBJECTS}-{FIX_PTS}-{args.annos_per_obj}"
    if stamp.exists() and stamp.read_text() == tag:
        emit("scale_fixture_write", 0.0, "s", cached=True,
             scans=args.scans, disk_gib=round(tree_gib(root), 2))
        return
    import shutil

    if root.exists():
        shutil.rmtree(root)
    t0 = time.perf_counter()
    write_synthetic_tree(root, n_scans=args.scans, n_objects=FIX_OBJECTS,
                         pts_per_obj=FIX_PTS,
                         annos_per_obj=args.annos_per_obj)
    dt = time.perf_counter() - t0
    stamp.write_text(tag)
    emit("scale_fixture_write", dt, "s", scans=args.scans,
         disk_gib=round(tree_gib(root), 2), rss_gib=round(rss_gib(), 2))


def phase_materialize(args):
    from sceneverse_tpu.data.build import DATASET_REGISTRY
    from sceneverse_tpu.data.materialized import (_fingerprint,
                                                  materialize_dataset)
    import sceneverse_tpu.data  # noqa: F401 (registry population)

    cfg = drill_cfg(args.root, args.batch)
    t0 = time.perf_counter()
    live = DATASET_REGISTRY.get("ScanNetSpatialRefer")(cfg, "train")
    init_s = time.perf_counter() - t0
    init_rss = rss_gib()  # the reference-style all-scans-up-front high-water
    n_items = len(live)

    out = Path(args.root) / "materialized" / "ScanNetSpatialRefer_train"
    t0 = time.perf_counter()
    materialize_dataset(live, out,
                        _fingerprint(cfg, "ScanNetSpatialRefer", "train"))
    build_s = time.perf_counter() - t0
    emit("scale_scanbase_full_load", init_s, "s", scans=args.scans,
         items=n_items, rss_gib=round(init_rss, 2))
    emit("scale_store_build", build_s, "s",
         store_gib=round(tree_gib(out), 2), rss_gib=round(rss_gib(), 2))


def _loader(args):
    from sceneverse_tpu.data.materialized import MaterializedBatchLoader

    cfg = drill_cfg(args.root, args.batch)
    store = Path(args.root) / "materialized" / "ScanNetSpatialRefer_train"
    t0 = time.perf_counter()
    loader = MaterializedBatchLoader(cfg, [store], n_threads=1)
    return loader, time.perf_counter() - t0


def phase_feed(args):
    loader, open_s = _loader(args)
    emit("scale_store_open", open_s, "s", items=loader.n_items,
         rss_gib=round(rss_gib(), 2))  # vs scale_scanbase_full_load rss
    it = iter(loader)
    next(it)  # warm: faults mmap pages, allocates the ring buffer
    n, t0 = 0, time.perf_counter()
    for _ in range(args.steps):
        n += next(it)["obj_fts"].shape[0]
    emit("scale_feed_scenes_per_sec", n / (time.perf_counter() - t0),
         "scenes/s", batch=args.batch, rss_gib=round(rss_gib(), 2))


def phase_feed_mesh(args):
    import jax

    from sceneverse_tpu.parallel.mesh import make_mesh, shard_batch

    mesh = make_mesh(8, mp=1)
    loader, _ = _loader(args)
    it = iter(loader)

    def place(batch):
        arrays = {k: v for k, v in batch.items() if hasattr(v, "ndim")}
        return shard_batch(arrays, mesh)

    placed = place(next(it))  # warm
    jax.block_until_ready(placed)
    n, t0 = 0, time.perf_counter()
    for _ in range(args.steps):
        placed = place(next(it))
        n += placed["obj_fts"].shape[0]
    jax.block_until_ready(placed)
    emit("scale_feed_dp8_scenes_per_sec", n / (time.perf_counter() - t0),
         "scenes/s", batch=args.batch, devices=len(jax.devices()),
         rss_gib=round(rss_gib(), 2))


PHASES = ["fixture", "materialize", "feed", "feed_mesh"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scans", type=int, default=68000)
    ap.add_argument("--annos-per-obj", type=int, default=12,
                    help="12 x 3 fg objects x 68K scans ~= 2.5M items")
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--steps", type=int, default=40)
    ap.add_argument("--root", default="/tmp/sceneverse_scale")
    ap.add_argument("--phase", choices=PHASES)
    args = ap.parse_args()

    if args.phase:
        globals()[f"phase_{args.phase}"](args)
        return

    base = [sys.argv[0], "--scans", str(args.scans), "--annos-per-obj",
            str(args.annos_per_obj), "--batch", str(args.batch),
            "--steps", str(args.steps), "--root", args.root]
    for phase in PHASES:
        # scrub the axon TPU-tunnel hooks (sitecustomize on PYTHONPATH
        # defeats --xla_force_host_platform_device_count; same recipe as
        # tests/conftest.py) — every phase is host/CPU work
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env["PYTHONPATH"] = ":".join(
            p for p in env.get("PYTHONPATH", "").split(":")
            if "axon" not in p)
        for k in list(env):
            if k.startswith(("PALLAS_AXON", "AXON", "TPU_")):
                env.pop(k)
        if phase == "feed_mesh":
            env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                                + " --xla_force_host_platform_device_count=8")
        r = subprocess.run([sys.executable, *base, "--phase", phase],
                           env=env)
        if r.returncode != 0:
            raise SystemExit(f"phase {phase} failed rc={r.returncode}")


if __name__ == "__main__":
    main()
