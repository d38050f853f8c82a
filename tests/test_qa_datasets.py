"""ScanQA / SQA3D dataset + evaluator tests over the fixture tree, including
a full QA fine-tuning slice through DefaultTrainer."""

import numpy as np
import pytest

from sceneverse_tpu.config import Config
import sceneverse_tpu.data  # noqa: F401
import sceneverse_tpu.evaluator  # noqa: F401
import sceneverse_tpu.model  # noqa: F401
import sceneverse_tpu.trainer  # noqa: F401
from sceneverse_tpu.data.build import DATASET_REGISTRY
from sceneverse_tpu.data.fixture import write_synthetic_tree
from sceneverse_tpu.trainer import build_trainer

HID = 32


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    return write_synthetic_tree(tmp_path_factory.mktemp("sv"), n_scans=2)


def qa_cfg(data_root, tmp_path, dataset="ScanNetScanQAOld"):
    num_answers = 6 if dataset == "ScanNetSQA3D" else 5
    return Config({
        "name": "TestQA", "rng_seed": 42, "num_gpu": 1, "mode": "train",
        "exp_dir": str(tmp_path / "exp"),
        "task": "ScanQA" if dataset == "ScanNetScanQAOld" else "SQA3D",
        "trainer": "DefaultTrainer",
        "debug": {"flag": False, "hard_debug": True},
        "data": {
            "train": [dataset], "val": [dataset], "test": [dataset],
            "scan_family_base": str(data_root),
            "args": {"max_obj_len": 6, "max_seq_len": 16, "num_points": 32,
                     "pc_type": "gt", "sem_type": "607", "filter_lang": False,
                     "txt_mask_ratio": 0.15, "pc_mask_ratio": 0.1,
                     "rot_aug": False, "mask_strategy": "random",
                     "use_scene_cap": False},
            dataset: {s: {"use_unanswer": True, "test_file": "val"}
                      for s in ("train", "val", "test")},
        },
        "data_wrapper": {"train": "ScanFamilyDatasetWrapperOld",
                         "val": "ScanFamilyDatasetWrapperOld",
                         "test": "ScanFamilyDatasetWrapperOld"},
        "dataloader": {"batchsize": 2, "num_workers": 0},
        "solver": {"gradient_accumulation_steps": 1, "epochs_per_eval": 1,
                   "lr": 1e-4, "grad_norm": 5.0, "epochs": 1,
                   "optim": {"name": "AdamW", "args": {"betas": [0.9, 0.98]}},
                   "sched": {"name": "warmup_cosine",
                             "args": {"warmup_steps": 2}}},
        "eval": {"name": "ScanQAEval" if dataset == "ScanNetScanQAOld" else "SQA3DEval",
                 "save": False},
        "model": {
            "name": "OpenVocab", "inter": "before",
            "language": {"name": "BERTLanguageEncoder", "lr": 1e-5,
                         "args": {"hidden_size": HID, "num_hidden_layers": 2,
                                  "num_attention_heads": 4}},
            "vision": {"name": "PointOpenVocabEncoder", "lr": 1e-4,
                       "args": {"hidden_size": HID, "freeze": True,
                                "num_attention_heads": 4, "num_layers": 2,
                                "dim_feedforward": 64, "spatial_dim": 5,
                                "dim_loc": 6, "attn_type": "spatial",
                                "pairwise_rel_type": "center"}},
            "grounding": {"name": "UnifiedSpatialCrossEncoderV2", "lr": 1e-4,
                          "args": {"hidden_size": HID, "num_attention_heads": 4,
                                   "num_layers": 2, "dim_feedforward": 64,
                                   "dim_loc": 6}},
            "heads": {"head_list": ["qa_head"],
                      "qa_head": {"name": "QAHeadV1",
                                  "args": {"hidden_size": HID, "mlp_size": 16,
                                           "flat_out_size": 24,
                                           "num_answers": num_answers}}},
            "loss_list": ["answer_loss"],
            "vis_loss_list": ["answer_loss"],
        },
    })


def test_scanqa_dataset_items(data_root):
    cfg = qa_cfg(data_root, data_root)
    ds = DATASET_REGISTRY.get("ScanNetScanQAOld")(cfg, "train")
    assert len(ds) > 0
    item = ds[0]
    assert item["answer_label"].shape == (5,)
    assert item["answer_label"].sum() >= 1
    assert item["tgt_object_id"].shape[0] == item["obj_fts"].shape[0] + 1
    assert item["tgt_object_label"].shape == (607,)


def test_sqa3d_dataset_items(data_root):
    cfg = qa_cfg(data_root, data_root, dataset="ScanNetSQA3D")
    ds = DATASET_REGISTRY.get("ScanNetSQA3D")(cfg, "train")
    assert len(ds) > 0
    item = ds[0]
    assert "situation" in item and "question" in item
    assert item["sentence"].startswith("I ")  # situation + question concat
    assert 0 <= item["sqa_type"] <= 5
    assert item["answer_label"].shape == (6,)


def test_scanqa_finetune_end_to_end(data_root, tmp_path):
    cfg = qa_cfg(data_root, tmp_path)
    trainer = build_trainer(cfg)
    results = trainer.run()
    assert "ans1_acc" in results and "ans10_acc" in results


def test_sqa3d_finetune_end_to_end(data_root, tmp_path):
    cfg = qa_cfg(data_root, tmp_path, dataset="ScanNetSQA3D")
    trainer = build_trainer(cfg)
    results = trainer.run()
    assert "ans1_acc" in results
    assert any(k.startswith("type") for k in results)
