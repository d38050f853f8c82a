"""Contrastive losses (reference optim/loss/contra_loss.py).

TPU-native distributed design: the reference wraps features in an explicit
``torch.distributed`` all_gather before the B x B InfoNCE
(contra_loss.py:61-64,88-91). Here each loss is written over the GLOBAL batch;
when the train step is jit-compiled with the batch dim sharded over the data
mesh, XLA inserts the all-gather (and the reduce-scatter in the backward)
automatically — no collective calls in user code.

Note on ``logit_scale``: the reference initialises it to exp(ln(1/0.07)) as an
nn.Parameter, but the optimizer is built from ``model.get_opt_params()`` only
(reference trainer/build.py:101-102), so it is never actually updated. We
reproduce that: it is module state, loaded/saved with checkpoints, excluded
from the optimizer.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from flax import nnx

from sceneverse_tpu.optim.loss.loss import LOSS_REGISTRY, bce_with_logits, cross_entropy

Array = jax.Array

NEG_INF = float("-inf")


def _l2norm(x: Array) -> Array:
    return x / jnp.clip(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)


@LOSS_REGISTRY.register()
class TextObjWithinBatch(nnx.Module):
    """In-scene object InfoNCE: CLS-text vs this scene's objects
    (reference :11-39). BCE variant for ScanQA."""

    def __init__(self, cfg):
        self.bce = cfg.get("task") in ["ScanQA"]

    def __call__(self, data_dict):
        obj_feats = data_dict["intra_obj_embeds"]  # (B[, *L], O, D)
        text_feats = data_dict["intra_text_embed"]  # (B*, D)
        labels = data_dict["tgt_object_id"]
        masks = data_dict["obj_masks"]
        if obj_feats.shape[0] != masks.shape[0]:  # per-scene: B*L rows
            rep = obj_feats.shape[0] // masks.shape[0]
            masks = jnp.repeat(masks[:, None], rep, axis=1).reshape(-1, masks.shape[1])
            labels = labels.reshape(-1, 1)
        obj_feats = _l2norm(obj_feats)
        text_feats = _l2norm(text_feats)
        logits = jnp.einsum("bod,bd->bo", obj_feats, text_feats)
        labels = labels[..., -1] if labels.ndim > 1 else labels
        if self.bce:
            return jnp.sum(
                bce_with_logits(logits, labels.astype(jnp.float32),
                                weight=masks.astype(jnp.float32))
            ) / labels.shape[0]
        logits = jnp.where(masks.astype(bool), logits, NEG_INF)
        return jnp.mean(cross_entropy(logits, labels))


class _BetweenBatchBase(nnx.Module):
    def __init__(self):
        # exp(ln(1/0.07)); constant in practice (see module docstring)
        self.logit_scale = nnx.Variable(jnp.asarray(np.exp(np.log(1.0 / 0.07)), jnp.float32))

    def _symmetric_infonce(self, a: Array, b: Array) -> Array:
        """CLIP-style symmetric InfoNCE over the global batch."""
        scale = jnp.clip(self.logit_scale[...], max=100.0)
        labels = jnp.arange(a.shape[0])
        ab = scale * (b @ a.T)  # (B, B)
        ba = scale * (a @ b.T)
        return (jnp.mean(cross_entropy(ab, labels)) + jnp.mean(cross_entropy(ba, labels))) / 2


@LOSS_REGISTRY.register()
class TextObjBetweenBatch(_BetweenBatchBase):
    """Target-object vs text CLS symmetric InfoNCE (reference :42-71)."""

    def __init__(self, cfg):
        super().__init__()

    def __call__(self, data_dict):
        obj_feats = data_dict["inter_obj_embeds"]  # (B, O, D)
        text_feats = data_dict["inter_text_embed"]  # (B, D)
        labels = data_dict["tgt_object_id"]
        if obj_feats.shape[0] != labels.shape[0]:
            labels = labels.reshape(-1, 1)
        tgt = jnp.take_along_axis(obj_feats, labels[:, :1, None], axis=1)[:, 0]  # (B, D)
        return self._symmetric_infonce(_l2norm(tgt), _l2norm(text_feats))


@LOSS_REGISTRY.register()
class TextSceneBetweenBatch(_BetweenBatchBase):
    """Scene-pooled embed vs scene-caption embed InfoNCE (reference :74-98)."""

    def __init__(self, cfg):
        super().__init__()

    def __call__(self, data_dict):
        scene_feats = _l2norm(data_dict["scene_embed"])
        text_feats = _l2norm(data_dict["scene_text_embed"])
        return self._symmetric_infonce(scene_feats, text_feats)
