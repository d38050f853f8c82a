"""Masked-LM pretrain heads (reference modules/heads/pretrain_head.py)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import nnx

from sceneverse_tpu.modules.build import HEADS_REGISTRY
from sceneverse_tpu.modules.weights import bert_linear_kernel_init, zeros_init


class BertPredictionHeadTransform(nnx.Module):
    """dense -> gelu -> LayerNorm (reference :8-20)."""

    def __init__(self, hidden_size: int, *, rngs: nnx.Rngs):
        self.dense = nnx.Linear(
            hidden_size, hidden_size, kernel_init=bert_linear_kernel_init,
            bias_init=zeros_init, rngs=rngs,
        )
        self.LayerNorm = nnx.LayerNorm(hidden_size, epsilon=1e-5, rngs=rngs)

    def __call__(self, x):
        return self.LayerNorm(jax.nn.gelu(self.dense(x), approximate=False))


class BertLMPredictionHead(nnx.Module):
    """transform -> tied-style decoder (no bias) + standalone bias
    (reference :23-33)."""

    def __init__(self, hidden_size: int, vocab_size: int, *, rngs: nnx.Rngs):
        self.transform = BertPredictionHeadTransform(hidden_size, rngs=rngs)
        self.decoder = nnx.Linear(
            hidden_size, vocab_size, use_bias=False,
            kernel_init=bert_linear_kernel_init, rngs=rngs,
        )
        self.bias = nnx.Param(jnp.zeros((vocab_size,)))

    def __call__(self, x):
        h = self.decoder(self.transform(x))
        # Bias add in the decoder's compute dtype: under mixed precision the
        # (B,L,30522) logits stay bf16 instead of being promoted to f32 by
        # the f32 bias param (~780 MB/step of extra HBM traffic at B=128 —
        # device trace). The cross-entropy loss upcasts to f32 internally
        # (loss.py), so only logit storage is rounded — the same precision
        # contract as the bf16 attention scores. f32 runs are unchanged.
        # (torch autocast would promote this add; deliberate deviation,
        # reference modules/heads/pretrain_head.py:23-33.)
        return h + self.bias[...].astype(h.dtype)


@HEADS_REGISTRY.register()
class PretrainHeadV1(nnx.Module):
    """Masked-LM head over the 30522 BERT vocab (reference :36-43)."""

    def __init__(self, cfg=None, hidden_size=768, vocab_size=30522,
                 *, rngs: nnx.Rngs):
        self.lm_pred_head = BertLMPredictionHead(hidden_size, vocab_size, rngs=rngs)

    def __call__(self, txt_embeds, **kwargs):
        return self.lm_pred_head(txt_embeds)


@HEADS_REGISTRY.register()
class OVPretrainHead(nnx.Module):
    """LM head + 607-way object LM head (reference :46-56)."""

    def __init__(self, cfg=None, hidden_size=768, vocab_size=30522,
                 obj_vocab_size=607, *, rngs: nnx.Rngs):
        self.lm_pred_head = BertLMPredictionHead(hidden_size, vocab_size, rngs=rngs)
        self.obj_pred_head = BertLMPredictionHead(hidden_size, obj_vocab_size, rngs=rngs)

    def __call__(self, txt_embeds, obj_embeds, **kwargs):
        return self.lm_pred_head(txt_embeds), self.obj_pred_head(obj_embeds)
