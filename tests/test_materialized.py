"""Offline-materialized input pipeline tests (VERDICT r2 item 1).

1. Per-item equivalence: the store-backed MaterializedSpatialRefer inherits
   the live ``_getitem_refer`` over mmap views, so items must be
   BIT-IDENTICAL to the live dataset for the same index + RNG state (val
   split uses per-item seeded RNG; train compared under a reset global seed).
2. Fast batch loader: schema equality with DataLoader+MaskDatasetWrapper
   (keys, shapes, dtypes, padding semantics) plus semantic invariants
   (normalized clouds, loc/label consistency with the store).
"""

import numpy as np
import pytest

import sceneverse_tpu.data  # noqa: F401
from sceneverse_tpu.config import Config
from sceneverse_tpu.data.build import DATASET_REGISTRY, build_dataloader
from sceneverse_tpu.data.fixture import write_synthetic_tree
from sceneverse_tpu.data.materialized import (
    MaterializedBatchLoader, MaterializedSpatialRefer, ensure_materialized)


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    return write_synthetic_tree(tmp_path_factory.mktemp("sv"), n_scans=4,
                                n_objects=12, pts_per_obj=90)


def mk_cfg(data_root, materialized=False, max_obj_len=8):
    return Config({
        "rng_seed": 7, "num_gpu": 1,
        "debug": {"flag": False},
        "data": {
            "train": ["ScanNetSpatialRefer"],
            "val": ["ScanNetSpatialRefer"],
            "scan_family_base": str(data_root),
            "args": {
                "max_obj_len": max_obj_len, "max_seq_len": 20,
                "num_points": 32, "pc_type": "gt", "sem_type": "607",
                "filter_lang": False, "txt_mask_ratio": 0.15,
                "pc_mask_ratio": 0.1, "rot_aug": True,
                "mask_strategy": "random", "use_scene_cap": True,
                "max_scene_cap_len": 28,
                "materialized": materialized,
            },
            "ScanNetSpatialRefer": {
                "train": {"sources": ["scanrefer"]},
                "val": {"sources": ["scanrefer"]},
            },
        },
        "data_wrapper": {"train": "MaskDatasetWrapper",
                         "val": "ScanFamilyDatasetWrapperOld"},
        "dataloader": {"batchsize": 4, "num_workers": 0},
    })


def _assert_item_equal(a, b, idx):
    assert set(a.keys()) == set(b.keys()), (idx, set(a) ^ set(b))
    for k in a:
        va, vb = a[k], b[k]
        if isinstance(va, np.ndarray):
            np.testing.assert_array_equal(va, vb, err_msg=f"item {idx} {k}")
        else:
            assert va == vb, (idx, k, va, vb)


def test_per_item_equivalence_val(data_root, tmp_path):
    """val split: per-item seeded RNG -> bit-identical without seed games."""
    cfg = mk_cfg(data_root)
    live = DATASET_REGISTRY.get("ScanNetSpatialRefer")(cfg, "val")
    mat = MaterializedSpatialRefer(cfg, "val")
    assert len(live) == len(mat)
    for i in range(min(len(live), 12)):
        _assert_item_equal(live[i], mat[i], i)


def test_per_item_equivalence_train(data_root):
    """train split: global-RNG path compared under a reset seed per item."""
    import random

    cfg = mk_cfg(data_root, max_obj_len=5)  # force the crop path
    live = DATASET_REGISTRY.get("ScanNetSpatialRefer")(cfg, "train")
    mat = MaterializedSpatialRefer(cfg, "train")
    assert len(live) == len(mat)
    for i in range(min(len(live), 8)):
        np.random.seed(1000 + i)
        random.seed(2000 + i)
        a = live[i]
        np.random.seed(1000 + i)
        random.seed(2000 + i)
        b = mat[i]
        _assert_item_equal(a, b, i)


def test_store_reuse_and_fingerprint(data_root):
    cfg = mk_cfg(data_root)
    p1 = ensure_materialized(cfg, "ScanNetSpatialRefer", "val")
    stamp = (p1 / "meta.json").stat().st_mtime
    p2 = ensure_materialized(cfg, "ScanNetSpatialRefer", "val")
    assert p1 == p2 and (p2 / "meta.json").stat().st_mtime == stamp
    # content-affecting config change -> rebuild
    cfg2 = mk_cfg(data_root)
    cfg2.data.args.use_scene_cap = False
    p3 = ensure_materialized(cfg2, "ScanNetSpatialRefer", "val")
    assert (p3 / "meta.json").stat().st_mtime > stamp


def test_fast_loader_schema_matches_wrapper_path(data_root):
    cfg = mk_cfg(data_root, materialized="fast")
    fast = build_dataloader(cfg, "train")
    assert isinstance(fast, MaterializedBatchLoader)
    fast_batch = next(iter(fast))

    cfg_live = mk_cfg(data_root)
    live = build_dataloader(cfg_live, "train")
    live_batch = next(iter(live))

    assert set(fast_batch) == set(live_batch), \
        set(fast_batch) ^ set(live_batch)
    for k in live_batch:
        lv, fv = live_batch[k], fast_batch[k]
        assert fv.shape == lv.shape, (k, fv.shape, lv.shape)
        assert fv.dtype == lv.dtype, (k, fv.dtype, lv.dtype)


def test_fast_loader_semantics(data_root):
    cfg = mk_cfg(data_root, materialized="fast")
    loader = MaterializedBatchLoader(
        cfg, [ensure_materialized(cfg, "ScanNetSpatialRefer", "train")])
    batch = next(iter(loader))
    B, O = batch["obj_masks"].shape
    n = batch["obj_masks"].sum(1)

    # padding semantics: fts 1.0 / locs 0.0 / labels -100 beyond n_objs
    for b in range(B):
        assert np.all(batch["obj_fts"][b, n[b]:] == 1.0)
        assert np.all(batch["obj_locs"][b, n[b]:] == 0.0)
        assert np.all(batch["obj_labels"][b, n[b]:] == -100)
        assert np.all(batch["obj_labels"][b, :n[b]] >= 0)
        # unit-sphere normalized xyz for real objects
        xyz = batch["obj_fts"][b, :n[b], :, :3]
        d = np.sqrt((xyz ** 2).sum(-1)).max(-1)
        np.testing.assert_allclose(d, 1.0, atol=1e-4)
        # per-object recentering
        np.testing.assert_allclose(xyz.mean(1), 0.0, atol=1e-4)
    # target id within range; masking produced labels on masked positions only
    assert np.all(batch["tgt_object_id"][:, 0] <= n)
    lm = batch["masked_lm_labels"]
    assert np.all((lm == -1) | (batch["txt_masks"] == 1))
    # scene caption ids start with [CLS] and are padded int64
    assert batch["scene_txt_ids"].dtype == np.int64

    # two epochs shuffle differently but share static shapes
    b2 = next(iter(loader))
    assert b2["obj_fts"].shape == batch["obj_fts"].shape
    assert not np.array_equal(b2["txt_ids"], batch["txt_ids"])


def test_fast_loader_threads_match_single(data_root):
    """n_threads only splits the scatter loop; same seed -> same batch."""
    cfg = mk_cfg(data_root, materialized="fast")
    store = ensure_materialized(cfg, "ScanNetSpatialRefer", "train")
    a = next(iter(MaterializedBatchLoader(cfg, [store], n_threads=1)))
    b = next(iter(MaterializedBatchLoader(cfg, [store], n_threads=3)))
    for k in a:
        np.testing.assert_array_equal(a[k], b[k], err_msg=k)
