"""ScanQA evaluators (reference evaluator/scanqa_eval.py:14-101):
top-1/top-10 multi-hot answer accuracy + obj-cls accs; Gen variant string-
matches cleaned free-form answers."""

from __future__ import annotations

import collections
import json
import os

import jax.numpy as jnp
import numpy as np

from sceneverse_tpu.evaluator.build import EVALUATOR_REGISTRY, BaseEvaluator, ratio_metrics
from sceneverse_tpu.evaluator.common import obj_cls_accs


@EVALUATOR_REGISTRY.register()
class ScanQAEval(BaseEvaluator):

    JIT_METRICS = True
    target_metric = "ans1_acc"

    def __init__(self, cfg, accelerator=None, **kwargs):
        super().__init__(cfg, accelerator, **kwargs)
        self.answer_vocab = None
        if self.save:
            from sceneverse_tpu.data.data_utils import ScanQAAnswer

            path = os.path.join(
                cfg.data.scan_family_base, "annotations/qa/ScanQA_v1.0_train.json"
            )
            if os.path.isfile(path):
                train_data = json.load(open(path, encoding="utf-8"))
                counter = collections.Counter(
                    sorted(sum([d["answers"] for d in train_data], []))
                )
                self.answer_vocab = ScanQAAnswer(counter.keys())

    def batch_metrics(self, data_dict, include_count=False):
        scores = data_dict["answer_scores"]
        labels = data_dict["answer_label"]  # multi-hot (B, A)
        total = scores.shape[0]
        choice_1 = jnp.argmax(scores, axis=-1)
        rows = jnp.arange(total)
        correct1 = jnp.sum(labels[rows, choice_1] == 1)
        import jax.lax as lax

        _, choice_10 = lax.top_k(scores, min(10, scores.shape[-1]))
        hits10 = jnp.take_along_axis(labels, choice_10, axis=1) == 1
        correct10 = jnp.sum(jnp.any(hits10, axis=1))

        metrics = {
            "ans1_acc": (correct1, total),
            "ans10_acc": (correct10, total),
        }
        metrics.update(obj_cls_accs(data_dict))

        if self.save and "data_idx" in data_dict and self.answer_vocab is not None:
            from sceneverse_tpu.common.box_utils import get_3d_box

            og3d_pred = np.asarray(jnp.argmax(data_dict["og3d_logits"], axis=1))
            boxes = np.asarray(data_dict["obj_boxes"])
            c10 = np.asarray(choice_10)
            for i in range(total):
                box = boxes[i, og3d_pred[i]]
                self.eval_results.append({
                    "scene_id": data_dict["scan_id"][i],
                    "question_id": data_dict["data_idx"][i],
                    "answer_top10": [self.answer_vocab.itos(int(c10[i, j])) for j in range(10)],
                    "bbox": get_3d_box(box[0:3], box[3:6]).tolist(),
                })

        if not include_count:
            return ratio_metrics(metrics)
        return metrics


@EVALUATOR_REGISTRY.register()
class ScanQAGenEval(ScanQAEval):
    """Free-form generation variant (reference :84-101)."""

    JIT_METRICS = False  # string answers — host-side math

    def batch_metrics(self, data_dict, include_count=False):
        from sceneverse_tpu.data.data_utils import clean_answer

        preds = [clean_answer(a) for a in data_dict["answer_pred"]]
        gts = [list(map(clean_answer, a)) for a in data_dict["answers"]]
        correct = sum(1 for p, g in zip(preds, gts) if p in g)
        metrics = {"ans1_acc": (correct, len(preds))}
        if not include_count:
            return {k: v / max(c, 1) for k, (v, c) in metrics.items()}
        return metrics
