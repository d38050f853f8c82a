"""Benchmark: finetune / QA train-step throughput on real hardware.

VERDICT r4 item 3: every BASELINE.md throughput row so far was the PRETRAIN
step; the reference's first-class finetune experiments run a different head,
loss, and wrapper contract:

  * ScanRefer finetune — GroundHeadV1 (3 aux classifier MLPs + fused og3d
    matcher, reference modules/heads/ground_head.py + configs/final/finetune/
    scanrefer_finetune.yaml: batch 256/chip, og3d_loss only,
    ScanFamilyDatasetWrapperOld batch contract, no scene caption).
  * ScanQA / SQA3D — QAHeadV1 (MCAN AttFlat fusion + 8864-way answer MLP,
    reference modules/heads/qa_head.py:72-91), BCE multi-hot answer_loss,
    batch 32/chip (scanqa_finetune.yaml:65).

Usage: python bench_finetune.py [scanrefer|scanqa|all]  (default all)
Prints one JSON line per task:
  {"metric": "<task>_finetune_scenes_per_sec_per_chip", "value": ...}
vs_baseline uses the same 128 scenes/s A100 engineering estimate as
bench.py (the reference publishes no numbers; the finetune step is cheaper
than pretrain — no LM head, no caption tower — so the estimate is
conservative for these tasks).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

os.environ.setdefault("SCENEVERSE_PALLAS_FAST", "1")

A100_SCENES_PER_SEC = 128.0
NUM_OBJ = 80
NUM_POINTS = 1024
SEQ_LEN = 50
WARMUP = 1
SCAN_STEPS = 10
BLOCKS = 3


def _finetune_cfg(task: str):
    from __graft_entry__ import _gps_cfg

    cfg = _gps_cfg(use_scene_cap=False)
    if task == "scanrefer":
        # reference configs/final/finetune/scanrefer_finetune.yaml:229-241
        cfg.model.heads = {
            "head_list": ["ground_head"],
            "ground_head": {"name": "GroundHeadV1",
                            "args": {"hidden_size": 384, "input_size": 768,
                                     "sem_cls_size": 607, "dropout": 0.3,
                                     "detach_all_aux_loss": True}},
        }
        cfg.model.loss_list = ["og3d_loss"]
        cfg.model.vis_loss_list = ["og3d_loss"]
    elif task == "scanqa":
        # reference configs/final/finetune/scanqa_finetune.yaml:139-147
        cfg.model.heads = {
            "head_list": ["qa_head"],
            "qa_head": {"name": "QAHeadV1",
                        "args": {"hidden_size": 768, "mlp_size": 256,
                                 "flat_out_size": 512,
                                 "num_answers": 8864}},
        }
        cfg.model.loss_list = ["answer_loss"]
        cfg.model.vis_loss_list = ["answer_loss"]
    else:
        raise ValueError(task)
    return cfg


def _batch(task: str, batch: int, seed: int = 0):
    from __graft_entry__ import _gps_batch

    out = _gps_batch(batch, NUM_OBJ, NUM_POINTS, SEQ_LEN,
                     use_scene_cap=False, seed=seed)
    if task == "scanqa":
        import jax.numpy as jnp

        rng = np.random.RandomState(seed + 1)
        # multi-hot answer labels (ScanQA items carry >=1 valid answer)
        hot = np.zeros((batch, 8864), np.float32)
        hot[np.arange(batch), rng.randint(0, 8864, batch)] = 1.0
        out["answer_label"] = jnp.asarray(hot)
    return out


def bench_task(task: str, batch: int) -> dict:
    import jax
    from flax import nnx

    from sceneverse_tpu.model import build_model
    from sceneverse_tpu.optim.build import build_optim
    from sceneverse_tpu.utils.precision import enable_mixed_precision

    cfg = _finetune_cfg(task)
    model = build_model(cfg, rngs=nnx.Rngs(0))
    model.train()
    enable_mixed_precision(model)
    loss_mod, tx, _, _ = build_optim(cfg, model, total_steps=10_000)
    from __graft_entry__ import make_train_scaffold

    _, train_k, state = make_train_scaffold(model, loss_mod, tx, SCAN_STEPS)

    batch_d = _batch(task, batch)
    total, state = train_k(state, batch_d)
    float(total)
    dts = []
    for _ in range(BLOCKS):
        t0 = time.perf_counter()
        total, state = train_k(state, batch_d)
        float(total)
        dts.append(time.perf_counter() - t0)
    sps = batch * SCAN_STEPS / min(dts)
    return {
        "metric": f"{task}_finetune_scenes_per_sec_per_chip",
        "value": round(sps, 2),
        "unit": "scenes/s",
        "vs_baseline": round(sps / A100_SCENES_PER_SEC, 3),
        "batch": batch,
    }


def main(argv=None):
    from sceneverse_tpu.utils.prng import configure_default_prng

    configure_default_prng()
    import sceneverse_tpu.model  # noqa: F401

    which = (argv or sys.argv[1:] or ["all"])[0]
    jobs = []
    if which in ("scanrefer", "all"):
        # reference batch 256/chip (scanrefer_finetune.yaml:8 runs 2x256)
        jobs.append(("scanrefer", int(os.environ.get(
            "SCENEVERSE_BENCH_FT_BATCH", 256))))
    if which in ("scanqa", "all"):
        # faithful batch 32 (scanqa_finetune.yaml:65) + the TPU-optimal 256
        jobs.append(("scanqa", 32))
        jobs.append(("scanqa", int(os.environ.get(
            "SCENEVERSE_BENCH_QA_BATCH", 256))))
    for task, batch in jobs:
        print(json.dumps(bench_task(task, batch)), flush=True)


if __name__ == "__main__":
    main()
