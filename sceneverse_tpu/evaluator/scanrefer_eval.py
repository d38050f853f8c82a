"""ScanRefer grounding evaluator (reference evaluator/scanrefer_eval.py:10-87):
Acc@0.25/0.5 overall + unique/multiple splits, og/txt/obj-cls accuracies,
per-scene (B, L, O) logits flattening, optional bbox dump."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from sceneverse_tpu.evaluator.build import EVALUATOR_REGISTRY, BaseEvaluator, ratio_metrics
from sceneverse_tpu.evaluator.common import obj_cls_accs


@EVALUATOR_REGISTRY.register()
class ScanReferEval(BaseEvaluator):

    JIT_METRICS = True
    target_metric = "og_acc_iou25"

    def batch_metrics(self, data_dict, include_count=False):
        d = dict(data_dict)
        if d["tgt_object_id_iou25"].ndim == 3:  # per-scene: flatten (B, L)
            for k in ("tgt_object_id_iou25", "tgt_object_id_iou50", "is_multiple",
                      "og3d_logits"):
                d[k] = d[k].reshape(-1, *d[k].shape[2:])
            d["tgt_object_id"] = d["tgt_object_id"].reshape(-1, 1)

        og_pred = jnp.argmax(d["og3d_logits"], axis=-1)
        total = og_pred.shape[0]
        is_mult = d["is_multiple"].astype(bool)
        mult_count = jnp.sum(is_mult)
        uniq_count = total - mult_count

        rows = jnp.arange(total)
        iou25 = d["tgt_object_id_iou25"][rows, og_pred].astype(bool)
        iou50 = d["tgt_object_id_iou50"][rows, og_pred].astype(bool)

        metrics = {
            "og_acc_iou25": (jnp.sum(iou25), total),
            "og_acc_iou50": (jnp.sum(iou50), total),
            "og_acc_iou25_unique": (jnp.sum(iou25 & ~is_mult), uniq_count),
            "og_acc_iou50_unique": (jnp.sum(iou50 & ~is_mult), uniq_count),
            "og_acc_iou25_multiple": (jnp.sum(iou25 & is_mult), mult_count),
            "og_acc_iou50_multiple": (jnp.sum(iou50 & is_mult), mult_count),
            "og_acc": (jnp.sum(og_pred == d["tgt_object_id"][:, 0]), total),
        }
        if "txt_cls_logits" in d:
            metrics["txt_acc"] = (
                jnp.sum(
                    jnp.argmax(d["txt_cls_logits"], axis=1)
                    == d["tgt_object_label"][:, 0]
                ),
                total,
            )
        metrics.update(obj_cls_accs(d))

        if self.save and "data_idx" in data_dict:
            pred = np.asarray(og_pred)
            boxes = np.asarray(data_dict["obj_boxes"])
            tgt = np.asarray(d["tgt_object_id"])[:, 0]
            for i, item_id in enumerate(list(data_dict["data_idx"])):
                self.eval_results.append({
                    "scene_id": item_id if isinstance(item_id, str) else int(item_id),
                    "bbox": boxes[i][pred[i]].tolist(),
                    "correct": bool(pred[i] == tgt[i]),
                })

        if not include_count:
            return ratio_metrics(metrics)
        return metrics
