"""Pretraining evaluator (reference evaluator/pretrain_eval.py:8-90): average
of og / masked-LM / obj-cls (raw, pre, post x mask/unmask) accuracies; the
target metric is their mean, weighted per batch by batch size."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from sceneverse_tpu.evaluator.build import EVALUATOR_REGISTRY, BaseEvaluator


def _masked_acc(logits, labels, mask):
    m = mask.astype(bool)
    correct = jnp.sum((jnp.argmax(logits, axis=2) == labels) & m)
    return correct / (jnp.sum(m) + 1e-8)


@EVALUATOR_REGISTRY.register()
class PretrainEval(BaseEvaluator):
    """Batch-size-weighted mean accuracies (reference update/record:68-90)."""

    JIT_METRICS = True

    target_metric = "target_metric"

    def batch_metrics(self, data_dict, include_count=False):
        metrics = {}
        txt_mask = data_dict["masked_lm_labels"] != -1
        if "tgt_object_id" in data_dict:
            og_pred = jnp.argmax(data_dict["og3d_logits"], axis=-1)
            metrics["og_acc"] = jnp.mean(
                (og_pred == data_dict["tgt_object_id"][..., 0]).astype(jnp.float32)
            )
        lm_pred = jnp.argmax(data_dict["txt_lm_cls_logits"], axis=2)
        lm_labels = data_dict["masked_lm_labels"]
        if lm_labels.ndim == 3:
            lm_labels = lm_labels.reshape(-1, lm_labels.shape[-1])
            txt_mask = txt_mask.reshape(-1, txt_mask.shape[-1])
        metrics["lang_cls_acc_mask"] = jnp.sum(
            (lm_pred == lm_labels) & txt_mask
        ) / (jnp.sum(txt_mask) + 1e-8)

        obj_masks = data_dict["obj_masks"].astype(bool)
        sem = data_dict["obj_sem_masks"].astype(bool)
        labels = data_dict["obj_labels"]
        for name in ("obj_cls_post_logits", "obj_cls_pre_logits"):
            if name in data_dict:
                stem = name.replace("_logits", "")
                logits = data_dict[name]
                metrics[f"{stem}_acc"] = _masked_acc(logits, labels, obj_masks)
                metrics[f"{stem}_acc_unmask"] = _masked_acc(logits, labels, obj_masks & sem)
                metrics[f"{stem}_acc_mask"] = _masked_acc(logits, labels, obj_masks & ~sem)
        if "obj_cls_raw_logits" in data_dict:
            metrics["obj_cls_raw_acc"] = _masked_acc(
                data_dict["obj_cls_raw_logits"], labels, obj_masks
            )

        metrics["target_metric"] = sum(metrics.values()) / len(metrics)
        batch = data_dict["txt_lm_cls_logits"].shape[0]
        if include_count:
            return {k: (v * batch, batch) for k, v in metrics.items()}
        # per-batch means; kept as device scalars (trainer fetches in batches)
        return dict(metrics)

    def record(self):
        # reference :83-90: weighted average; best on target_metric; no gather
        # in the reference (per-rank metric) — gathering here is strictly
        # more correct and identical single-process.
        out = {}
        for k, (value, count) in self.eval_dict.items():
            out[k] = float(value) / max(float(count), 1)
        is_best = out["target_metric"] > self.best_result
        if is_best:
            self.best_result = out["target_metric"]
        out["best_result"] = self.best_result
        self.eval_dict = out
        return is_best, out
