"""CLIP text encoder — native NNX implementation of the real architecture.

The reference wraps HF ``CLIPTextModelWithProjection``
(reference modules/language/clip.py:11-28) and, at forward time, projects the
FULL ``last_hidden_state`` through ``text_projection`` then L2-normalizes per
token (reference modules/language/clip.py:22-25). This module reproduces that
architecture natively: causal self-attention, pre-LN blocks, quickGELU MLP,
final layer norm, bias-free text projection — NOT a BERT tower.

The parameter tree follows the HF naming
(``text_model.encoder.layers.N.self_attn.q_proj`` …) so
:mod:`sceneverse_tpu.ckpt.convert` maps an HF CLIP checkpoint one-to-one;
forward parity vs ``transformers.CLIPTextModelWithProjection`` is asserted in
``tests/test_convert.py``. No network access is assumed: weights are random
unless a converted checkpoint is loaded on top.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
from flax import nnx

from sceneverse_tpu.modules.build import LANGUAGE_REGISTRY
from sceneverse_tpu.modules.utils import MlpHead

Array = jax.Array


@dataclass
class CLIPTextConfig:
    """Defaults = openai/clip-vit-large-patch14 text tower."""

    vocab_size: int = 49408
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 77
    projection_dim: int = 768
    layer_norm_eps: float = 1e-5
    eos_token_id: int = 49407


def quick_gelu(x: Array) -> Array:
    """HF ``quick_gelu``: x * sigmoid(1.702 x) (CLIP's activation)."""
    return x * jax.nn.sigmoid(1.702 * x)


class CLIPTextEmbeddings(nnx.Module):
    def __init__(self, cfg: CLIPTextConfig, *, rngs: nnx.Rngs):
        init = nnx.initializers.normal(0.02)
        self.token_embedding = nnx.Embed(
            cfg.vocab_size, cfg.hidden_size, embedding_init=init, rngs=rngs)
        self.position_embedding = nnx.Embed(
            cfg.max_position_embeddings, cfg.hidden_size,
            embedding_init=init, rngs=rngs)

    def __call__(self, input_ids: Array) -> Array:
        L = input_ids.shape[1]
        pos = jnp.arange(L, dtype=jnp.int32)[None, :]
        return self.token_embedding(input_ids) + self.position_embedding(pos)


class CLIPAttention(nnx.Module):
    """HF CLIPAttention: per-head scale on q, additive mask."""

    def __init__(self, cfg: CLIPTextConfig, *, rngs: nnx.Rngs):
        D = cfg.hidden_size
        self.num_heads = cfg.num_attention_heads
        self.head_dim = D // cfg.num_attention_heads
        self.q_proj = nnx.Linear(D, D, rngs=rngs)
        self.k_proj = nnx.Linear(D, D, rngs=rngs)
        self.v_proj = nnx.Linear(D, D, rngs=rngs)
        self.out_proj = nnx.Linear(D, D, rngs=rngs)

    def __call__(self, x: Array, attn_bias: Array) -> Array:
        B, L, D = x.shape
        H, dh = self.num_heads, self.head_dim
        split = lambda t: t.reshape(B, L, H, dh).transpose(0, 2, 1, 3)
        q = split(self.q_proj(x)) * (dh ** -0.5)
        k, v = split(self.k_proj(x)), split(self.v_proj(x))
        # compute-dtype logits (torch-autocast semantics), f32 softmax below
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                            preferred_element_type=q.dtype)
        logits = logits + attn_bias.astype(logits.dtype)
        # f32 softmax, v.dtype-only backward residual (ops/softmax.py)
        from sceneverse_tpu.ops.softmax import softmax_lowp

        attn = softmax_lowp(logits, v.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        return self.out_proj(out.transpose(0, 2, 1, 3).reshape(B, L, D))


class CLIPMLP(nnx.Module):
    def __init__(self, cfg: CLIPTextConfig, *, rngs: nnx.Rngs):
        self.fc1 = nnx.Linear(cfg.hidden_size, cfg.intermediate_size, rngs=rngs)
        self.fc2 = nnx.Linear(cfg.intermediate_size, cfg.hidden_size, rngs=rngs)

    def __call__(self, x: Array) -> Array:
        return self.fc2(quick_gelu(self.fc1(x)))


class CLIPEncoderLayer(nnx.Module):
    """Pre-LN block (HF CLIPEncoderLayer)."""

    def __init__(self, cfg: CLIPTextConfig, *, rngs: nnx.Rngs):
        eps = cfg.layer_norm_eps
        self.self_attn = CLIPAttention(cfg, rngs=rngs)
        self.layer_norm1 = nnx.LayerNorm(cfg.hidden_size, epsilon=eps, rngs=rngs)
        self.mlp = CLIPMLP(cfg, rngs=rngs)
        self.layer_norm2 = nnx.LayerNorm(cfg.hidden_size, epsilon=eps, rngs=rngs)

    def __call__(self, x: Array, attn_bias: Array) -> Array:
        x = x + self.self_attn(self.layer_norm1(x), attn_bias)
        return x + self.mlp(self.layer_norm2(x))


class CLIPEncoder(nnx.Module):
    def __init__(self, cfg: CLIPTextConfig, *, rngs: nnx.Rngs):
        self.layers = nnx.List(
            [CLIPEncoderLayer(cfg, rngs=rngs)
             for _ in range(cfg.num_hidden_layers)])

    def __call__(self, x: Array, attn_bias: Array) -> Array:
        for layer in self.layers:
            x = layer(x, attn_bias)
        return x


class CLIPTextTransformer(nnx.Module):
    def __init__(self, cfg: CLIPTextConfig, *, rngs: nnx.Rngs):
        self.cfg = cfg
        self.embeddings = CLIPTextEmbeddings(cfg, rngs=rngs)
        self.encoder = CLIPEncoder(cfg, rngs=rngs)
        self.final_layer_norm = nnx.LayerNorm(
            cfg.hidden_size, epsilon=cfg.layer_norm_eps, rngs=rngs)

    def __call__(self, input_ids: Array,
                 attention_mask: Array | None = None) -> Array:
        """Returns last_hidden_state (B, L, D); ``attention_mask``: 1 = keep.

        HF combines a causal mask with the expanded padding mask additively
        (transformers CLIPTextTransformer.forward).
        """
        x = self.embeddings(input_ids)
        L = input_ids.shape[1]
        neg = jnp.finfo(jnp.float32).min
        causal = jnp.where(
            jnp.tril(jnp.ones((L, L), bool)), 0.0, neg)[None, None]
        bias = causal
        if attention_mask is not None:
            pad = (1.0 - attention_mask.astype(jnp.float32)) * neg
            bias = bias + pad[:, None, None, :]
        return self.final_layer_norm(self.encoder(x, bias))

    def pooled(self, input_ids: Array, last_hidden: Array) -> Array:
        """EOS-token pooling (HF: hidden state at the eos_token_id position)."""
        eos_pos = jnp.argmax(
            (input_ids == self.cfg.eos_token_id).astype(jnp.int32), axis=-1)
        return last_hidden[jnp.arange(last_hidden.shape[0]), eos_pos]


class CLIPTextModelWithProjection(nnx.Module):
    """HF-shape wrapper: ``text_model`` + bias-free ``text_projection``."""

    def __init__(self, cfg: CLIPTextConfig, *, rngs: nnx.Rngs):
        self.text_model = CLIPTextTransformer(cfg, rngs=rngs)
        self.text_projection = nnx.Linear(
            cfg.hidden_size, cfg.projection_dim, use_bias=False, rngs=rngs)

    def __call__(self, input_ids: Array, attention_mask: Array | None = None):
        """Returns (last_hidden_state, text_embeds)."""
        last_hidden = self.text_model(input_ids, attention_mask)
        pooled = self.text_model.pooled(input_ids, last_hidden)
        return last_hidden, self.text_projection(pooled)


@LANGUAGE_REGISTRY.register()
class CLIPLanguageEncoder(nnx.Module):
    """reference modules/language/clip.py:11-28 (unused by the 37 final
    configs, kept for API parity). Forward contract: project the full
    last_hidden_state per token, L2-normalize, optional MLP projection;
    freeze_backbone wraps the CLIP part in stop_gradient (ref torch.no_grad).
    """

    def __init__(self, cfg=None, weights="openai/clip-vit-large-patch14",
                 output_dim=768, freeze_backbone=True, use_projection=False,
                 dropout=0.1, num_hidden_layers=12, *, rngs: nnx.Rngs):
        del weights  # no network access; converted ckpts load on top
        self.freeze_backbone = freeze_backbone
        clip_cfg = CLIPTextConfig(projection_dim=output_dim,
                                  num_hidden_layers=num_hidden_layers)
        self.model = CLIPTextModelWithProjection(clip_cfg, rngs=rngs)
        self.use_projection = use_projection
        if use_projection:
            self.projection = MlpHead(clip_cfg.hidden_size, output_dim,
                                      output_dim, dropout=dropout, rngs=rngs)

    def __call__(self, txt_ids, txt_masks):
        txt = self.model.text_model(txt_ids, txt_masks)
        txt = self.model.text_projection(txt)
        txt = txt / jnp.linalg.norm(txt, axis=2, keepdims=True).clip(1e-12)
        if self.freeze_backbone:
            txt = jax.lax.stop_gradient(txt)
        if self.use_projection:
            txt = self.projection(txt)
        return txt
