"""Full GPS slice end-to-end on the real data pipeline: fixture tree ->
ScanNetSpatialRefer -> Mask/ScanFamily wrappers -> OpenVocabTrainer
(pretrain losses incl. contrastive) -> PretrainEval/ScanReferEval."""

import numpy as np
import pytest

from sceneverse_tpu.config import Config
import sceneverse_tpu.data  # noqa: F401
import sceneverse_tpu.evaluator  # noqa: F401
import sceneverse_tpu.model  # noqa: F401
import sceneverse_tpu.trainer  # noqa: F401
from sceneverse_tpu.data.fixture import write_synthetic_tree
from sceneverse_tpu.trainer import build_trainer

HID = 32


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    return write_synthetic_tree(tmp_path_factory.mktemp("sv"), n_scans=3)


def gps_cfg(data_root, tmp_path):
    return Config({
        "name": "TestGPS",
        "rng_seed": 42,
        "num_gpu": 1,
        "mode": "train",
        "exp_dir": str(tmp_path / "exp"),
        "task": "Pretrain",
        "trainer": "OpenVocabTrainer",
        "debug": {"flag": False, "hard_debug": True},
        "data": {
            "train": ["ScanNetSpatialRefer"],
            "val": ["ScanNetSpatialRefer"],
            "test": ["ScanNetSpatialRefer"],
            "scan_family_base": str(data_root),
            "args": {
                "max_obj_len": 6, "max_seq_len": 16, "num_points": 32,
                "pc_type": "gt", "sem_type": "607", "filter_lang": False,
                "txt_mask_ratio": 0.15, "pc_mask_ratio": 0.1, "rot_aug": True,
                "mask_strategy": "random", "use_scene_cap": True,
                "max_scene_cap_len": 24,
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
        "dataloader": {"batchsize": 4, "num_workers": 0},
        "solver": {
            "gradient_accumulation_steps": 1,
            "epochs_per_eval": 1,
            "lr": 5e-4,
            "grad_norm": 5.0,
            "epochs": 1,
            "optim": {"name": "AdamW", "args": {"betas": [0.9, 0.98]}},
            "sched": {"name": "warmup_cosine",
                      "args": {"warmup_steps": 2, "minimum_ratio": 0.1}},
        },
        "eval": {"train": {"name": "PretrainEval"},
                 "val": {"name": "ScanReferEval"}, "save": False},
        "model": {
            "name": "OpenVocab",
            "inter": "before",
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
            "heads": {"head_list": ["pretrain_head"],
                      "pretrain_head": {"name": "OVPretrainHead",
                                        "args": {"hidden_size": HID,
                                                 "vocab_size": 30522}}},
            "loss_list": ["lm_cls_loss", "TextObjWithinBatch",
                          "TextSceneBetweenBatch"],
            "vis_loss_list": ["lm_cls_loss", "TextObjWithinBatch",
                              "TextSceneBetweenBatch"],
        },
    })


def test_gps_pretrain_end_to_end(data_root, tmp_path):
    cfg = gps_cfg(data_root, tmp_path)
    trainer = build_trainer(cfg)
    results = trainer.run()
    # val evaluator = ScanReferEval through the eval wrapper
    assert "og_acc_iou25" in results
    assert 0.0 <= results["og_acc_iou25"] <= 1.0
    assert trainer.global_step > 0


def test_gps_grounding_finetune_path(data_root, tmp_path):
    cfg = gps_cfg(data_root, tmp_path)
    cfg.model.heads.head_list = ["ground_head"]
    cfg.model.heads.ground_head = Config({
        "name": "GroundHeadV1",
        "args": {"input_size": HID, "hidden_size": HID, "sem_cls_size": 607,
                 "dropout": 0.3, "detach_all_aux_loss": True},
    })
    cfg.model.loss_list = ["og3d_loss"]
    cfg.model.vis_loss_list = ["og3d_loss"]
    cfg.data_wrapper.train = "ScanFamilyDatasetWrapperOld"
    cfg.data.args.use_scene_cap = False
    cfg.eval.train = Config({"name": "ScanReferEval"})
    trainer = build_trainer(cfg)
    results = trainer.run()
    assert "og_acc_iou50" in results


def test_debug_trainer_iterates_dataloaders(data_root, tmp_path, capsys):
    """DebugTrainer iterates every split without touching the model
    (reference trainer/debug_trainer.py:26-44)."""
    cfg = gps_cfg(data_root, tmp_path)
    cfg.trainer = "DebugTrainer"
    trainer = build_trainer(cfg)
    trainer.run()
    assert "all dataloaders iterated" in capsys.readouterr().out


def test_gps_pretrain_mixed_precision(data_root, tmp_path):
    """Full trainer e2e with mixed_precision=bf16 — exercises the bf16
    compute paths (bf16 attention logits, low-precision softmax/CE VJP
    residuals) that f32 tests never trace. Guards against dtype-mismatch
    regressions in custom VJPs (cotangent dtype must equal primal dtype)."""
    cfg = gps_cfg(data_root, tmp_path)
    cfg.mixed_precision = "bf16"
    trainer = build_trainer(cfg)
    results = trainer.run()
    assert trainer.global_step > 0
    assert all(np.isfinite(v) for v in results.values() if np.isscalar(v))
