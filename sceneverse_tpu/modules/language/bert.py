"""BERT text encoder, native NNX implementation.

Mirrors the reference's 4-layer truncated ``bert-base-uncased``
(reference modules/language/bert.py:7-26: HF BertModel with
num_hidden_layers=4, returns last_hidden_state). The module tree follows the
HF parameter naming (embeddings / encoder.layer.N.attention.self.query …) so
converted torch checkpoints map one-to-one (see sceneverse_tpu.ckpt.convert).

No network access is assumed: weights are randomly initialized unless a
converted checkpoint is loaded on top.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import jax
import jax.numpy as jnp
from flax import nnx

from sceneverse_tpu.modules.build import LANGUAGE_REGISTRY
from sceneverse_tpu.modules.weights import bert_embed_init, bert_linear_kernel_init, zeros_init

Array = jax.Array


@dataclass
class BertConfig:
    vocab_size: int = 30522
    hidden_size: int = 768
    num_hidden_layers: int = 4
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    hidden_dropout_prob: float = 0.1
    attention_probs_dropout_prob: float = 0.1
    layer_norm_eps: float = 1e-12


def _linear(din, dout, rngs):
    return nnx.Linear(
        din, dout, kernel_init=bert_linear_kernel_init, bias_init=zeros_init,
        rngs=rngs,
    )


class BertEmbeddings(nnx.Module):
    def __init__(self, cfg: BertConfig, *, rngs: nnx.Rngs):
        self.word_embeddings = nnx.Embed(
            cfg.vocab_size, cfg.hidden_size, embedding_init=bert_embed_init, rngs=rngs
        )
        self.position_embeddings = nnx.Embed(
            cfg.max_position_embeddings, cfg.hidden_size,
            embedding_init=bert_embed_init, rngs=rngs,
        )
        self.token_type_embeddings = nnx.Embed(
            cfg.type_vocab_size, cfg.hidden_size,
            embedding_init=bert_embed_init, rngs=rngs,
        )
        self.LayerNorm = nnx.LayerNorm(cfg.hidden_size, epsilon=cfg.layer_norm_eps, rngs=rngs)
        self.dropout = nnx.Dropout(cfg.hidden_dropout_prob, rngs=rngs)

    def __call__(self, input_ids: Array, token_type_ids: Array | None = None):
        B, L = input_ids.shape
        pos_ids = jnp.arange(L, dtype=jnp.int32)[None, :]
        if token_type_ids is None:
            token_type_ids = jnp.zeros_like(input_ids)
        x = (
            self.word_embeddings(input_ids)
            + self.position_embeddings(pos_ids)
            + self.token_type_embeddings(token_type_ids)
        )
        return self.dropout(self.LayerNorm(x))


class BertSelfAttention(nnx.Module):
    def __init__(self, cfg: BertConfig, *, rngs: nnx.Rngs):
        self.num_heads = cfg.num_attention_heads
        self.head_dim = cfg.hidden_size // cfg.num_attention_heads
        self.query = _linear(cfg.hidden_size, cfg.hidden_size, rngs)
        self.key = _linear(cfg.hidden_size, cfg.hidden_size, rngs)
        self.value = _linear(cfg.hidden_size, cfg.hidden_size, rngs)
        self.dropout = nnx.Dropout(cfg.attention_probs_dropout_prob, rngs=rngs)

    def __call__(self, x: Array, attn_bias: Array, q_rows: int | None = None):
        """``q_rows``: compute attention outputs for the first ``q_rows``
        query positions only (K/V stay full-length). Used by the cls_only
        final layer — see BertModel."""
        B, L, D = x.shape
        H, dh = self.num_heads, self.head_dim
        if q_rows is not None:
            # tiny-Lq cross-attention: the fused/flash kernels are square
            # (Lq == Lkv) and at Lq=1 the XLA einsum path is already cheap
            xq = x[:, :q_rows]
            q = self.query(xq).reshape(B, q_rows, H, dh).transpose(0, 2, 1, 3)
            k = self.key(x).reshape(B, L, H, dh).transpose(0, 2, 1, 3)
            v = self.value(x).reshape(B, L, H, dh).transpose(0, 2, 1, 3)
            logits = jnp.einsum(
                "bhqd,bhkd->bhqk", q, k, preferred_element_type=q.dtype
            ) / jnp.asarray(math.sqrt(dh), q.dtype)
            logits = logits + attn_bias.astype(logits.dtype)
            from sceneverse_tpu.ops.softmax import softmax_lowp

            attn = self.dropout(softmax_lowp(logits, v.dtype))
            out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
            return out.transpose(0, 2, 1, 3).reshape(B, q_rows, D)
        q2, k2, v2 = self.query(x), self.key(x), self.value(x)
        # bespoke fused path (ops/pallas/mha.py): consumes the HF additive
        # mask row directly; prob-dropout runs in-kernel (same distribution,
        # different stream than nnx.Dropout). q/k/v ride PACKED (B, L, H*dh)
        # — no head-split transposes on this path.
        from sceneverse_tpu.ops.pallas.mha import (
            fused_mha,
            fused_mha_enabled,
            fused_mha_supported,
        )

        if fused_mha_enabled() and fused_mha_supported(D, H):
            from sceneverse_tpu.modules.layers.transformers import _dropout_seed

            rate = (0.0 if self.dropout.deterministic else self.dropout.rate)
            seed = _dropout_seed(self.dropout) if rate > 0.0 else None
            return fused_mha(q2, k2, v2, H,
                             pad_additive=attn_bias[:, 0, 0, :],
                             dropout_rate=rate, seed=seed,
                             scale=1.0 / math.sqrt(dh)).astype(v2.dtype)
        split = lambda t: t.reshape(B, L, H, dh).transpose(0, 2, 1, 3)
        q, k, v = split(q2), split(k2), split(v2)
        # fused (flash) path when prob-dropout is inactive (the kernel has
        # none; training keeps HF dropout semantics). attn_bias is the HF
        # additive mask (large negative at pads, (B,1,1,L)) — recover the
        # pad set; -1e4 vs -inf is indistinguishable post-softmax in f32
        # (exp underflows at -88).
        from sceneverse_tpu.ops.pallas.attention import flash_enabled

        if (self.dropout.rate == 0.0 or self.dropout.deterministic) \
                and flash_enabled():
            from sceneverse_tpu.ops.pallas.attention import masked_mha

            key_pad = attn_bias[:, 0, 0, :] < -1.0  # (B, L) True = pad
            out = masked_mha(q, k, v, key_pad, sm_scale=1.0 / math.sqrt(dh))
            return out.transpose(0, 2, 1, 3).reshape(B, L, D)
        # compute-dtype logits (bf16 under mixed precision — torch-autocast
        # semantics; MXU accumulation is f32 regardless), f32 softmax below
        logits = jnp.einsum(
            "bhqd,bhkd->bhqk", q, k, preferred_element_type=q.dtype
        ) / jnp.asarray(math.sqrt(dh), q.dtype)
        # additive mask, HF semantics (-1e4 at pads survives bf16 rounding)
        logits = logits + attn_bias.astype(logits.dtype)
        # f32 softmax, v.dtype-only backward residual (ops/softmax.py)
        from sceneverse_tpu.ops.softmax import softmax_lowp

        attn = softmax_lowp(logits, v.dtype)
        attn = self.dropout(attn)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        return out.transpose(0, 2, 1, 3).reshape(B, L, D)


class BertSelfOutput(nnx.Module):
    def __init__(self, cfg: BertConfig, *, rngs: nnx.Rngs):
        self.dense = _linear(cfg.hidden_size, cfg.hidden_size, rngs)
        self.LayerNorm = nnx.LayerNorm(cfg.hidden_size, epsilon=cfg.layer_norm_eps, rngs=rngs)
        self.dropout = nnx.Dropout(cfg.hidden_dropout_prob, rngs=rngs)

    def __call__(self, hidden: Array, residual: Array):
        from sceneverse_tpu.modules.layers.transformers import _ln_split

        return self.LayerNorm(
            _ln_split(self.dropout(self.dense(hidden)) + residual))


class BertAttention(nnx.Module):
    def __init__(self, cfg: BertConfig, *, rngs: nnx.Rngs):
        self.self = BertSelfAttention(cfg, rngs=rngs)
        self.output = BertSelfOutput(cfg, rngs=rngs)

    def __call__(self, x: Array, attn_bias: Array, q_rows: int | None = None):
        residual = x if q_rows is None else x[:, :q_rows]
        return self.output(self.self(x, attn_bias, q_rows), residual)


class BertLayer(nnx.Module):
    def __init__(self, cfg: BertConfig, *, rngs: nnx.Rngs):
        self.attention = BertAttention(cfg, rngs=rngs)
        self.intermediate_dense = _linear(cfg.hidden_size, cfg.intermediate_size, rngs)
        self.output_dense = _linear(cfg.intermediate_size, cfg.hidden_size, rngs)
        self.output_LayerNorm = nnx.LayerNorm(cfg.hidden_size, epsilon=cfg.layer_norm_eps, rngs=rngs)
        self.output_dropout = nnx.Dropout(cfg.hidden_dropout_prob, rngs=rngs)

    def __call__(self, x: Array, attn_bias: Array, q_rows: int | None = None):
        from sceneverse_tpu.modules.layers.transformers import _ln_split

        x = self.attention(x, attn_bias, q_rows)
        h = jax.nn.gelu(self.intermediate_dense(x), approximate=False)
        return self.output_LayerNorm(
            _ln_split(self.output_dropout(self.output_dense(h)) + x))


class BertModel(nnx.Module):
    def __init__(self, cfg: BertConfig, *, rngs: nnx.Rngs):
        self.cfg = cfg
        self.embeddings = BertEmbeddings(cfg, rngs=rngs)
        self.layer = nnx.List([BertLayer(cfg, rngs=rngs) for _ in range(cfg.num_hidden_layers)])

    def __call__(self, input_ids: Array, attention_mask: Array,
                 token_type_ids: Array | None = None,
                 cls_only: bool = False) -> Array:
        """Returns last_hidden_state (B, L, D). ``attention_mask``: 1 = keep.

        ``cls_only=True`` returns (B, 1, D): the final layer computes ONLY
        the [CLS] query row (same math as full compute then ``[:, :1]`` —
        K/V stay full-length, so every layer's attention sees all tokens).
        Used for towers whose output is consumed only at position 0 (the
        scene-caption tower, model/openvocab.py): at the production
        max_scene_cap_len=300 this removes the last layer's 300-row FFN +
        LN + their backwards, and turns the dead-299-row cotangent matmuls
        into 1-row ones — XLA cannot sink the downstream slice through the
        dots itself."""
        x = self.embeddings(input_ids, token_type_ids)
        # HF extended attention mask: (1 - mask) * finfo.min, additive.
        bias = (1.0 - attention_mask.astype(jnp.float32))[:, None, None, :]
        bias = bias * jnp.finfo(jnp.float32).min
        last = len(self.layer) - 1
        for i, layer in enumerate(self.layer):
            x = layer(x, bias, q_rows=1 if (cls_only and i == last) else None)
        return x


@LANGUAGE_REGISTRY.register()
class BERTLanguageEncoder(nnx.Module):
    """reference modules/language/bert.py:7-26."""

    def __init__(self, cfg=None, weights: str = "bert-base-uncased",
                 hidden_size: int = 768, num_hidden_layers: int = 4,
                 num_attention_heads: int = 12, type_vocab_size: int = 2,
                 *, rngs: nnx.Rngs):
        del weights  # no network access; converted ckpts load on top
        self.model = BertModel(
            BertConfig(
                hidden_size=hidden_size,
                num_hidden_layers=num_hidden_layers,
                num_attention_heads=num_attention_heads,
                type_vocab_size=type_vocab_size,
            ),
            rngs=rngs,
        )

    def __call__(self, txt_ids: Array, txt_masks: Array,
                 cls_only: bool = False, **kwargs) -> Array:
        return self.model(txt_ids, txt_masks, cls_only=cls_only)
