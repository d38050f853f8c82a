"""MCAN-style QA head (reference modules/heads/qa_head.py:8-91)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import nnx

from sceneverse_tpu.modules.build import HEADS_REGISTRY
from sceneverse_tpu.modules.weights import bert_linear_kernel_init, zeros_init


def _linear(din, dout, rngs):
    return nnx.Linear(
        din, dout, kernel_init=bert_linear_kernel_init, bias_init=zeros_init,
        rngs=rngs,
    )


class MLP(nnx.Module):
    """FC(gelu, dropout) -> Linear (reference :9-37)."""

    def __init__(self, in_size, mid_size, out_size, pdrop=0.0, *, rngs: nnx.Rngs):
        self.fc = _linear(in_size, mid_size, rngs)
        self.dropout = nnx.Dropout(pdrop, rngs=rngs)
        self.linear = _linear(mid_size, out_size, rngs)

    def __call__(self, x):
        return self.linear(self.dropout(jax.nn.gelu(self.fc(x), approximate=False)))


class AttFlat(nnx.Module):
    """Attention-flatten pooling (reference :40-69)."""

    def __init__(self, hidden_size, flat_mlp_size=512, flat_glimpses=1,
                 flat_out_size=1024, pdrop=0.1, *, rngs: nnx.Rngs):
        self.mlp = MLP(hidden_size, flat_mlp_size, flat_glimpses, pdrop=pdrop, rngs=rngs)
        self.flat_glimpses = flat_glimpses
        self.linear_merge = _linear(hidden_size * flat_glimpses, flat_out_size, rngs)

    def __call__(self, x, x_mask):
        """x: (B, T, D); x_mask: (B, T) True = PAD (reference passes
        ``logical_not`` of the valid mask)."""
        att = self.mlp(x)  # (B, T, glimpses)
        if x_mask is not None:
            att = jnp.where(x_mask[..., None], -1e9, att)
        att = jax.nn.softmax(att, axis=1)
        pooled = [
            jnp.sum(att[:, :, i : i + 1] * x, axis=1)
            for i in range(self.flat_glimpses)
        ]
        return self.linear_merge(jnp.concatenate(pooled, axis=1))


@HEADS_REGISTRY.register()
class QAHeadV1(nnx.Module):
    def __init__(self, cfg=None, hidden_size=768, mlp_size=256, glimpse=1,
                 flat_out_size=512, num_answers=8864, *, rngs: nnx.Rngs):
        self.attflat_visual = AttFlat(hidden_size, mlp_size, glimpse, flat_out_size, 0.1, rngs=rngs)
        self.attflat_lang = AttFlat(hidden_size, mlp_size, glimpse, flat_out_size, 0.1, rngs=rngs)
        self.answer_fc1 = _linear(flat_out_size, hidden_size, rngs)
        self.answer_dropout = nnx.Dropout(0.3, rngs=rngs)
        self.answer_fc2 = _linear(hidden_size, num_answers, rngs)
        self.fusion_norm = nnx.LayerNorm(flat_out_size, epsilon=1e-5, rngs=rngs)

    def __call__(self, obj_embeds, obj_masks, txt_embeds, txt_masks, **kwargs):
        object_feat = self.attflat_visual(obj_embeds, ~obj_masks.astype(bool))
        lang_feat = self.attflat_lang(txt_embeds, ~txt_masks.astype(bool))
        fuse = self.fusion_norm(lang_feat + object_feat)
        h = jax.nn.gelu(self.answer_fc1(fuse), approximate=False)
        return self.answer_fc2(self.answer_dropout(h))
