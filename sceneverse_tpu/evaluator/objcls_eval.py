"""Object-classification pretrain evaluator
(reference evaluator/objcls_eval.py:8-23): masked accuracy.

Note the reference divides by labels.shape[0] — the number of VALID (masked-
selected) objects, since it indexes with the mask first. Reproduced exactly.
"""

from __future__ import annotations

import jax.numpy as jnp

from sceneverse_tpu.evaluator.build import EVALUATOR_REGISTRY, BaseEvaluator, ratio_metrics


@EVALUATOR_REGISTRY.register()
class PretrainObjEval(BaseEvaluator):

    JIT_METRICS = True
    target_metric = "accuracy"

    def batch_metrics(self, data_dict, include_count=False):
        mask = data_dict["obj_masks"].astype(bool)
        pred = jnp.argmax(data_dict["obj_logits"], axis=-1)
        correct = jnp.sum((pred == data_dict["obj_labels"]) & mask)
        count = jnp.sum(mask)
        metrics = {"accuracy": (correct, count)}
        if not include_count:
            return ratio_metrics(metrics)
        return metrics
