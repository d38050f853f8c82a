"""Grounding heads (reference modules/heads/grounding_head.py:7-55)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import nnx

from sceneverse_tpu.modules.build import HEADS_REGISTRY
from sceneverse_tpu.modules.utils import MlpHead

NEG_INF = float("-inf")


@HEADS_REGISTRY.register()
class GroundHeadV1(nnx.Module):
    def __init__(self, cfg=None, input_size=768, hidden_size=768,
                 sem_cls_size=607, dropout=0.3, detach_all_aux_loss=False,
                 *, rngs: nnx.Rngs):
        self.og3d_head = MlpHead(input_size, hidden_size, 1, dropout=dropout, rngs=rngs)
        self.txt_clf_head = MlpHead(input_size, hidden_size, sem_cls_size, dropout=dropout, rngs=rngs)
        self.obj3d_clf_head = MlpHead(input_size, hidden_size, sem_cls_size, dropout=dropout, rngs=rngs)
        self.obj3d_clf_pre_head = MlpHead(input_size, hidden_size, sem_cls_size, dropout=dropout, rngs=rngs)
        self.detach_all_aux_loss = detach_all_aux_loss

    def __call__(self, txt_embeds, obj_embeds, obj_pre_embeds, obj_masks, **kwargs):
        og3d_logits = self.og3d_head(obj_embeds)[..., 0]
        og3d_logits = jnp.where(obj_masks.astype(bool), og3d_logits, NEG_INF)
        if self.detach_all_aux_loss:
            txt_embeds = jax.lax.stop_gradient(txt_embeds)
            obj_embeds = jax.lax.stop_gradient(obj_embeds)
            obj_pre_embeds = jax.lax.stop_gradient(obj_pre_embeds)
        txt_cls_logits = self.txt_clf_head(txt_embeds[:, 0])
        obj_cls_logits = self.obj3d_clf_head(obj_embeds)
        obj_cls_pre_logits = self.obj3d_clf_pre_head(obj_pre_embeds)
        return txt_cls_logits, obj_cls_logits, obj_cls_pre_logits, og3d_logits


@HEADS_REGISTRY.register()
class GroundHead(nnx.Module):
    def __init__(self, cfg=None, input_size=768, hidden_size=768, dropout=0.3,
                 *, rngs: nnx.Rngs):
        self.og3d_head = MlpHead(input_size, hidden_size, 1, dropout=dropout, rngs=rngs)

    def __call__(self, obj_embeds, obj_masks=None, **kwargs):
        og3d_logits = self.og3d_head(obj_embeds)[..., 0]
        if obj_masks is not None:
            og3d_logits = jnp.where(obj_masks.astype(bool), og3d_logits, NEG_INF)
        return og3d_logits
