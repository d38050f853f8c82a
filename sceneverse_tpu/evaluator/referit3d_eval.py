"""Nr3D/Sr3D grounding evaluator (reference evaluator/referit3d_eval.py:10-83):
og_acc target + easy/hard and view-dep/indep splits."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from sceneverse_tpu.evaluator.build import EVALUATOR_REGISTRY, BaseEvaluator, ratio_metrics
from sceneverse_tpu.evaluator.common import obj_cls_accs


@EVALUATOR_REGISTRY.register()
class ReferIt3DEval(BaseEvaluator):

    JIT_METRICS = True
    target_metric = "og_acc"

    def batch_metrics(self, data_dict, include_count=False):
        d = dict(data_dict)
        if d["og3d_logits"].ndim == 3:  # per-scene
            for k in ("is_hard", "is_view_dependent", "og3d_logits"):
                d[k] = d[k].reshape(-1, *d[k].shape[2:])
            d["tgt_object_id"] = d["tgt_object_id"].reshape(-1, 1)

        og_pred = jnp.argmax(d["og3d_logits"], axis=-1)
        total = og_pred.shape[0]
        hard = d["is_hard"].astype(bool)
        viewdep = d["is_view_dependent"].astype(bool)
        hard_count = jnp.sum(hard)
        viewdep_count = jnp.sum(viewdep)
        correct = og_pred == d["tgt_object_id"][:, 0]

        metrics = {
            "og_acc_easy": (jnp.sum(correct & ~hard), total - hard_count),
            "og_acc_hard": (jnp.sum(correct & hard), hard_count),
            "og_acc_view_dep": (jnp.sum(correct & viewdep), viewdep_count),
            "og_acc_view_indep": (jnp.sum(correct & ~viewdep), total - viewdep_count),
            "og_acc": (jnp.sum(correct), total),
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
