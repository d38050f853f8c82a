"""Golden-value evaluator tests: hand-computed metrics on tiny synthetic
batches for every evaluator family (reference test strategy SURVEY.md §4 —
the reference has no evaluator unit tests; these pin our metric math)."""

import jax.numpy as jnp
import numpy as np
import pytest

import sceneverse_tpu.evaluator  # noqa: F401 — populate registry
from sceneverse_tpu.config import Config
from sceneverse_tpu.evaluator.build import EVALUATOR_REGISTRY


def make_eval(name, **cfg_extra):
    cfg = Config({"eval": {"name": name, "save": False},
                  "exp_dir": "", **cfg_extra})
    return EVALUATOR_REGISTRY.get(name)(cfg)


def obj_cls_fields(B, O, C=7):
    """Minimal obj-cls inputs so obj_cls_accs doesn't KeyError."""
    return {
        "obj_labels": jnp.zeros((B, O), jnp.int32),
        "obj_cls_raw_logits": jnp.tile(
            jnp.eye(C, dtype=jnp.float32)[0], (B, O, 1)),
    }


def test_scanrefer_golden():
    ev = make_eval("ScanReferEval")
    # 4 samples, 3 objects. Predictions = argmax rows: [0, 2, 1, 0]
    logits = jnp.asarray([
        [9.0, 1.0, 1.0],
        [1.0, 2.0, 9.0],
        [1.0, 9.0, 2.0],
        [9.0, 1.0, 1.0],
    ])
    iou25 = jnp.asarray([  # hit at predicted col?: y, n, y, y → 3/4
        [1, 0, 0],
        [1, 0, 0],
        [0, 1, 0],
        [1, 0, 1],
    ])
    iou50 = jnp.asarray([  # y, n, n, n → 1/4
        [1, 0, 0],
        [0, 0, 0],
        [0, 0, 1],
        [0, 1, 0],
    ])
    d = {
        "og3d_logits": logits,
        "tgt_object_id_iou25": iou25,
        "tgt_object_id_iou50": iou50,
        "tgt_object_id": jnp.asarray([[0], [2], [0], [1]]),  # og: hit,hit,miss,miss
        "is_multiple": jnp.asarray([0, 0, 1, 1]),
        **obj_cls_fields(4, 3),
    }
    m = ev.batch_metrics(d)
    assert m["og_acc_iou25"] == pytest.approx(3 / 4)
    assert m["og_acc_iou50"] == pytest.approx(1 / 4)
    assert m["og_acc"] == pytest.approx(2 / 4)
    # unique = rows 0,1 → iou25 hits y,n → 1/2; multiple = rows 2,3 → y,y → 2/2
    assert m["og_acc_iou25_unique"] == pytest.approx(1 / 2)
    assert m["og_acc_iou25_multiple"] == pytest.approx(1.0)
    assert m["og_acc_iou50_unique"] == pytest.approx(1 / 2)
    assert m["og_acc_iou50_multiple"] == pytest.approx(0.0)


def test_referit3d_golden():
    ev = make_eval("ReferIt3DEval")
    logits = jnp.asarray([
        [9.0, 0.0, 0.0],   # pred 0
        [0.0, 9.0, 0.0],   # pred 1
        [0.0, 0.0, 9.0],   # pred 2
        [9.0, 0.0, 0.0],   # pred 0
    ])
    d = {
        "og3d_logits": logits,
        "tgt_object_id": jnp.asarray([[0], [1], [0], [1]]),  # correct: y,y,n,n
        "is_hard": jnp.asarray([0, 1, 1, 0]),
        "is_view_dependent": jnp.asarray([1, 0, 0, 0]),
        **obj_cls_fields(4, 3),
    }
    m = ev.batch_metrics(d)
    assert m["og_acc"] == pytest.approx(2 / 4)
    assert m["og_acc_easy"] == pytest.approx(1 / 2)      # rows 0,3 → y,n
    assert m["og_acc_hard"] == pytest.approx(1 / 2)      # rows 1,2 → y,n
    assert m["og_acc_view_dep"] == pytest.approx(1.0)    # row 0 → y
    assert m["og_acc_view_indep"] == pytest.approx(1 / 3)  # rows 1,2,3 → y,n,n


def test_scanqa_golden():
    ev = make_eval("ScanQAEval")
    # 3 samples, 4 answers; top-k guard exercised (4 < 10)
    scores = jnp.asarray([
        [9.0, 1.0, 0.0, 0.0],   # top1 = 0
        [0.0, 9.0, 8.0, 0.0],   # top1 = 1
        [0.0, 0.0, 1.0, 9.0],   # top1 = 3
    ])
    labels = jnp.asarray([
        [1, 0, 0, 0],  # top1 hit; top10 hit
        [0, 0, 1, 0],  # top1 miss; top10 hit (multi-hot anywhere)
        [0, 0, 0, 0],  # no valid answer → both miss
    ])
    m = ev.batch_metrics({"answer_scores": scores, "answer_label": labels,
                          **obj_cls_fields(3, 2)})
    assert m["ans1_acc"] == pytest.approx(1 / 3)
    assert m["ans10_acc"] == pytest.approx(2 / 3)


def test_sqa3d_golden():
    ev = make_eval("SQA3DEval", data={"scan_family_base": ""})
    scores = jnp.asarray([
        [9.0, 0.0, 0.0],
        [0.0, 9.0, 0.0],
        [9.0, 0.0, 0.0],
    ])
    labels = jnp.asarray([
        [1, 0, 0],  # hit, type 0
        [1, 0, 0],  # miss, type 0
        [1, 0, 0],  # hit, type 2
    ])
    d = {"answer_scores": scores, "answer_label": labels,
         "sqa_type": jnp.asarray([0, 0, 2]), **obj_cls_fields(3, 2)}
    m = ev.batch_metrics(d)
    assert m["ans1_acc"] == pytest.approx(2 / 3)
    assert m["type0_acc"] == pytest.approx(1 / 2)
    assert m["type2_acc"] == pytest.approx(1.0)
    assert m["type1_acc"] == pytest.approx(0.0)


def test_update_record_aggregates_across_batches():
    """(value,count) protocol: record() must ratio-reduce over ALL batches,
    not average per-batch ratios (reference evaluator/build.py:24-43)."""
    ev = make_eval("ReferIt3DEval")
    base = {"is_hard": jnp.asarray([0]), "is_view_dependent": jnp.asarray([0]),
            **obj_cls_fields(1, 2)}
    # batch A: 1 sample correct; batch B: 1 sample wrong
    ev.update({"og3d_logits": jnp.asarray([[9.0, 0.0]]),
               "tgt_object_id": jnp.asarray([[0]]), **base})
    ev.update({"og3d_logits": jnp.asarray([[9.0, 0.0]]),
               "tgt_object_id": jnp.asarray([[1]]), **base})
    is_best, results = ev.record()
    assert results["og_acc"] == pytest.approx(1 / 2)
    assert is_best  # first record is always best
