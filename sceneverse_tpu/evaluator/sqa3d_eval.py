"""SQA3D evaluator (reference evaluator/sqa3d_eval.py:14-148):
ans1/ans10 + per-question-type (what/is/how/can/which/others) accuracies.

The reference class is NOT a BaseEvaluator (legacy standalone with a
``(cfg, task_name)`` signature quirk — build_eval passes the accelerator into
``task_name``, SURVEY.md §2.8). Here it follows the standard protocol while
keeping the metric semantics (type counts initialized to 1e-10, no cross-rank
gather in the reference — we do gather, which is strictly more correct).
"""

from __future__ import annotations

import collections
import json
import os

import jax.lax as lax
import jax.numpy as jnp

from sceneverse_tpu.evaluator.build import EVALUATOR_REGISTRY, BaseEvaluator, ratio_metrics
from sceneverse_tpu.evaluator.common import obj_cls_accs

NUM_SQA_TYPES = 6  # 0: what, 1: is, 2: how, 3: can, 4: which, 5: others


@EVALUATOR_REGISTRY.register()
class SQA3DEval(BaseEvaluator):

    JIT_METRICS = True
    target_metric = "ans1_acc"

    def __init__(self, cfg, accelerator=None, **kwargs):
        super().__init__(cfg, accelerator, **kwargs)
        self.answer_vocab = None
        base = cfg.select("data.scan_family_base")
        path = os.path.join(base or "", "annotations/sqa_task/answer_dict.json")
        if base and os.path.isfile(path):
            from sceneverse_tpu.data.data_utils import SQA3DAnswer

            answer_data = json.load(open(path, encoding="utf-8"))[0]
            counter = collections.Counter(sorted(answer_data.keys()))
            self.answer_vocab = SQA3DAnswer(counter.keys())

    def batch_metrics(self, data_dict, include_count=False):
        scores = data_dict["answer_scores"]
        labels = data_dict["answer_label"]
        total = scores.shape[0]
        rows = jnp.arange(total)
        choice_1 = jnp.argmax(scores, axis=-1)
        hit1 = labels[rows, choice_1] == 1
        _, choice_10 = lax.top_k(scores, min(10, scores.shape[-1]))
        hit10 = jnp.any(jnp.take_along_axis(labels, choice_10, axis=1) == 1, axis=1)

        metrics = {
            "ans1_acc": (jnp.sum(hit1), total),
            "ans10_acc": (jnp.sum(hit10), total),
        }
        sqa_type = data_dict["sqa_type"]
        for t in range(NUM_SQA_TYPES):
            sel = sqa_type == t
            metrics[f"type{t}_acc"] = (jnp.sum(hit1 & sel), jnp.sum(sel))
        metrics.update(obj_cls_accs(data_dict))

        if not include_count:
            return ratio_metrics(metrics, floor=1e-10)
        return metrics
