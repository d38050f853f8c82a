"""Shared jittable metric helpers."""

from __future__ import annotations

import jax.numpy as jnp


def obj_cls_accs(data_dict):
    """Masked per-object classification accuracies for every ``*_logits`` of
    shape (B, O, C) aligned with obj_labels (reference scanrefer_eval.py:56-62
    generic loop). Returns {name: (correct, count)}."""
    out = {}
    labels = data_dict.get("obj_labels")
    masks = data_dict.get("obj_masks")
    if labels is None or masks is None:
        return out
    m = masks.astype(bool)
    count = jnp.sum(m)
    for key, val in data_dict.items():
        if (
            key.endswith("logits")
            and hasattr(val, "ndim")
            and val.ndim == 3
            and val.shape[:2] == labels.shape
        ):
            pred = jnp.argmax(val, axis=2)
            correct = jnp.sum((pred == labels) & m)
            out[key.replace("logits", "acc")] = (correct, count)
    return out
