"""Transformer layer library, NNX rewrite of reference
modules/layers/transformers.py (CrossAttentionLayer :12-63,
TransformerDecoderLayer :66-112, TransformerEncoderLayer :115-154,
MultiHeadAttentionSpatial :157-239, spatial enc/dec variants :242-316).

Conventions:
  * masks follow the reference: ``key_padding_mask`` is True where a key is
    PADDING (callers pass ``~valid``),
  * attention projections are packed q|k|v in one (D, 3D) matmul — one big
    MXU op instead of three — matching torch ``nn.MultiheadAttention``'s
    ``in_proj_weight`` packing so checkpoint conversion is a reshape,
  * all softmaxes run in float32 regardless of compute dtype.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from flax import nnx

from sceneverse_tpu.modules.utils import get_activation_fn
from sceneverse_tpu.modules.weights import bert_linear_kernel_init, zeros_init
from sceneverse_tpu.ops.softmax import softmax_lowp

Array = jax.Array

NEG_INF = float("-inf")


def _ln_split(x):
    """Optionally split a post-norm LayerNorm off its producing fusion.

    XLA fuses the residual-producing matmul (FFN down-proj / attention
    out-proj) together with the LN-stats epilogue, and the b192 device trace
    put those combined fusions at ~20% of MXU peak. SCENEVERSE_LN_BARRIER=1
    inserts an optimization_barrier between the residual sum and the LN so
    the matmul compiles into its own fusion. Numerically a no-op.

    MEASURED NEUTRAL on the full step (off 1191.0 vs on 1184.9 scenes/s at
    batch 192, round 4) — the epilogue was not the drag; the combined
    fusion is already balanced against its HBM traffic. Default off; kept
    as a profiling knob."""
    import os

    if os.environ.get("SCENEVERSE_LN_BARRIER"):
        return jax.lax.optimization_barrier(x)
    return x


def _dropout_seed(dropout: nnx.Dropout):
    """Per-call int32 seed for the fused kernel's in-kernel prob-dropout,
    drawn from the module's own dropout stream (stateful: each call — and
    each scanned train step — advances it)."""
    key = dropout.rngs()
    return jax.random.key_data(key).reshape(-1)[-1:].astype(jnp.int32)


def _linear(din, dout, rngs, use_bias=True):
    return nnx.Linear(
        din, dout, use_bias=use_bias,
        kernel_init=bert_linear_kernel_init, bias_init=zeros_init, rngs=rngs,
    )


class MultiHeadAttention(nnx.Module):
    """torch ``nn.MultiheadAttention`` equivalent (batch_first).

    Packed in-proj when q/k/v dims agree (torch's ``in_proj_weight``),
    separate projections otherwise (torch's ``q/k/v_proj_weight``).
    """

    def __init__(self, d_model: int, n_head: int, dropout: float = 0.0,
                 kdim: Optional[int] = None, vdim: Optional[int] = None,
                 *, rngs: nnx.Rngs):
        assert d_model % n_head == 0
        self.d_model, self.n_head = d_model, n_head
        self.d_head = d_model // n_head
        self.same_dims = (kdim is None or kdim == d_model) and (
            vdim is None or vdim == d_model
        )
        if self.same_dims:
            self.in_proj = _linear(d_model, 3 * d_model, rngs)
        else:
            self.q_proj = _linear(d_model, d_model, rngs)
            self.k_proj = _linear(kdim or d_model, d_model, rngs)
            self.v_proj = _linear(vdim or d_model, d_model, rngs)
        self.out_proj = _linear(d_model, d_model, rngs)
        self.attn_dropout = nnx.Dropout(dropout, rngs=rngs)

    def _split(self, x: Array) -> Array:  # (B,T,D) -> (B,H,T,dh)
        B, T, _ = x.shape
        return x.reshape(B, T, self.n_head, self.d_head).transpose(0, 2, 1, 3)

    def __call__(self, query: Array, key: Array, value: Array,
                 key_padding_mask: Optional[Array] = None,
                 attn_mask: Optional[Array] = None):
        if self.same_dims:
            # manual packed matmul (mirrors torch in_proj_weight), so the
            # nnx.Linear compute dtype set by enable_mixed_precision must be
            # applied by hand — without this the whole layer (and every
            # transformer built on it) silently runs f32 dots
            dt = self.in_proj.dtype or query.dtype
            w = self.in_proj.kernel[...].astype(dt)  # (D, 3D)
            b = self.in_proj.bias[...].astype(dt)
            d = self.d_model
            if query is key and key is value:
                qkv = query.astype(dt) @ w + b
                q, k, v = jnp.split(qkv, 3, axis=-1)
            else:
                q = query.astype(dt) @ w[:, :d] + b[:d]
                k = key.astype(dt) @ w[:, d : 2 * d] + b[d : 2 * d]
                v = value.astype(dt) @ w[:, 2 * d :] + b[2 * d :]
        else:
            q, k, v = self.q_proj(query), self.k_proj(key), self.v_proj(value)
        dropout_off = (self.attn_dropout.rate == 0.0
                       or self.attn_dropout.deterministic)
        # bespoke fused path (ops/pallas/mha.py): scores/probs/dropout masks
        # stay in VMEM; prob-dropout runs on the in-kernel PRNG (identical
        # distribution, different stream than nnx.Dropout's threefry).
        # q/k/v ride PACKED (B, T, H*dh) — the kernel slices heads off lane
        # blocks, so no (B, H, T, dh) transpose copies exist on this path.
        from sceneverse_tpu.ops.pallas.mha import (
            fused_mha,
            fused_mha_enabled,
            fused_mha_supported,
        )

        if (attn_mask is None and fused_mha_enabled()
                and fused_mha_supported(q.shape[-1], self.n_head)):
            rate = 0.0 if dropout_off else self.attn_dropout.rate
            seed = _dropout_seed(self.attn_dropout) if rate > 0.0 else None
            out = fused_mha(q, k, v, self.n_head,
                            key_padding_mask=key_padding_mask,
                            dropout_rate=rate, seed=seed,
                            scale=1.0 / math.sqrt(self.d_head))
            return self.out_proj(out), None
        q, k, v = self._split(q), self._split(k), self._split(v)
        # generic flash path: only when attention dropout is inactive — that
        # kernel has no prob-dropout, and training must keep the reference's
        # dropout semantics (reference transformers.py:139-141)
        from sceneverse_tpu.ops.pallas.attention import flash_enabled

        if dropout_off and attn_mask is None and flash_enabled():
            from sceneverse_tpu.ops.pallas.attention import masked_mha

            out = masked_mha(q, k, v, key_padding_mask,
                             sm_scale=1.0 / math.sqrt(self.d_head))
            B, H, T, dh = out.shape
            out = out.transpose(0, 2, 1, 3).reshape(B, T, H * dh)
            return self.out_proj(out), None
        # logits materialize in the COMPUTE dtype (bf16 under mixed
        # precision) — the MXU still accumulates f32 internally, only the
        # stored result is rounded. This matches torch-autocast semantics
        # (einsum emits bf16, softmax upcasts to f32) and halves the (L,T)
        # score-tensor HBM traffic, which a device profile showed as the
        # top per-layer copy cost. f32 runs are unchanged.
        logits = jnp.einsum(
            "bhqd,bhkd->bhqk", q, k, preferred_element_type=q.dtype
        ) / jnp.asarray(math.sqrt(self.d_head), q.dtype)
        if attn_mask is not None:
            logits = jnp.where(attn_mask, jnp.asarray(NEG_INF, logits.dtype),
                               logits)
        if key_padding_mask is not None:
            logits = jnp.where(key_padding_mask[:, None, None, :],
                               jnp.asarray(NEG_INF, logits.dtype), logits)
        # f32 softmax; only the v.dtype probs are kept for backward
        # (ops/softmax.py — in f32 mode this is exactly jax.nn.softmax)
        attn = softmax_lowp(logits, v.dtype)
        attn = self.attn_dropout(attn)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v,
                         preferred_element_type=jnp.float32)
        B, H, T, dh = out.shape
        out = out.transpose(0, 2, 1, 3).reshape(B, T, H * dh)
        return self.out_proj(out), attn


class CrossAttentionLayer(nnx.Module):
    """reference transformers.py:12-63 (pre/post-norm cross-attn + FFN).

    Note: faithfully reproduces the reference's prenorm quirk where the FFN
    input is ``norm3(tgt)`` computed *before* the residual add at :58-60.
    """

    def __init__(self, d_model, nhead, dim_feedforward=2048, dropout=0.1,
                 activation="relu", k_dim=None, v_dim=None, prenorm=True,
                 *, rngs: nnx.Rngs):
        self.prenorm = prenorm
        self.multihead_attn = MultiHeadAttention(
            d_model, nhead, dropout=dropout, kdim=k_dim, vdim=v_dim, rngs=rngs
        )
        self.linear1 = _linear(d_model, dim_feedforward, rngs)
        self.dropout = nnx.Dropout(dropout, rngs=rngs)
        self.linear2 = _linear(dim_feedforward, d_model, rngs)
        self.norm1 = nnx.LayerNorm(d_model, epsilon=1e-5, rngs=rngs)
        self.norm2 = nnx.LayerNorm(d_model, epsilon=1e-5, rngs=rngs)
        self.norm3 = nnx.LayerNorm(d_model, epsilon=1e-5, rngs=rngs)
        self.dropout1 = nnx.Dropout(dropout, rngs=rngs)
        self.dropout2 = nnx.Dropout(dropout, rngs=rngs)
        self.dropout3 = nnx.Dropout(dropout, rngs=rngs)
        self.activation = get_activation_fn(activation)

    def __call__(self, tgt, memory, memory_key_padding_mask=None,
                 memory_mask=None):
        tgt2 = tgt
        if self.prenorm:
            tgt2 = self.norm1(tgt2)
        tgt2, cross_attn = self.multihead_attn(
            tgt2, memory, memory,
            key_padding_mask=memory_key_padding_mask, attn_mask=memory_mask,
        )
        tgt = tgt + self.dropout2(tgt2)
        if not self.prenorm:
            tgt = self.norm1(_ln_split(tgt))
        if self.prenorm:
            tgt2 = self.norm3(tgt)
        tgt2 = self.linear2(self.dropout(self.activation(self.linear1(tgt2))))
        tgt = tgt + self.dropout3(tgt2)
        if not self.prenorm:
            tgt = self.norm3(_ln_split(tgt))
        return tgt, cross_attn


class TransformerDecoderLayer(nnx.Module):
    """reference transformers.py:66-112 (prenorm self-attn + cross-attn + FFN)."""

    def __init__(self, d_model, nhead, dim_feedforward=2048, dropout=0.1,
                 activation="relu", *, rngs: nnx.Rngs):
        self.self_attn = MultiHeadAttention(d_model, nhead, dropout=dropout, rngs=rngs)
        self.multihead_attn = MultiHeadAttention(d_model, nhead, dropout=dropout, rngs=rngs)
        self.linear1 = _linear(d_model, dim_feedforward, rngs)
        self.dropout = nnx.Dropout(dropout, rngs=rngs)
        self.linear2 = _linear(dim_feedforward, d_model, rngs)
        self.norm1 = nnx.LayerNorm(d_model, epsilon=1e-5, rngs=rngs)
        self.norm2 = nnx.LayerNorm(d_model, epsilon=1e-5, rngs=rngs)
        self.norm3 = nnx.LayerNorm(d_model, epsilon=1e-5, rngs=rngs)
        self.dropout1 = nnx.Dropout(dropout, rngs=rngs)
        self.dropout2 = nnx.Dropout(dropout, rngs=rngs)
        self.dropout3 = nnx.Dropout(dropout, rngs=rngs)
        self.activation = get_activation_fn(activation)

    def __call__(self, tgt, memory, tgt_key_padding_mask=None,
                 memory_key_padding_mask=None):
        tgt2 = self.norm1(tgt)
        tgt2, self_attn = self.self_attn(
            tgt2, tgt2, tgt2, key_padding_mask=tgt_key_padding_mask
        )
        tgt = tgt + self.dropout1(tgt2)
        tgt2 = self.norm2(tgt)
        tgt2, cross_attn = self.multihead_attn(
            tgt2, memory, memory, key_padding_mask=memory_key_padding_mask
        )
        tgt = tgt + self.dropout2(tgt2)
        tgt2 = self.norm3(tgt)
        tgt2 = self.linear2(self.dropout(self.activation(self.linear1(tgt2))))
        tgt = tgt + self.dropout3(tgt2)
        return tgt, self_attn, cross_attn


class TransformerEncoderLayer(nnx.Module):
    """reference transformers.py:115-154 (post-norm by default)."""

    def __init__(self, d_model, nhead, dim_feedforward=2048, dropout=0.1,
                 activation="relu", prenorm=False, *, rngs: nnx.Rngs):
        self.self_attn = MultiHeadAttention(d_model, nhead, dropout=dropout, rngs=rngs)
        self.linear1 = _linear(d_model, dim_feedforward, rngs)
        self.dropout = nnx.Dropout(dropout, rngs=rngs)
        self.linear2 = _linear(dim_feedforward, d_model, rngs)
        self.norm1 = nnx.LayerNorm(d_model, epsilon=1e-5, rngs=rngs)
        self.norm2 = nnx.LayerNorm(d_model, epsilon=1e-5, rngs=rngs)
        self.dropout1 = nnx.Dropout(dropout, rngs=rngs)
        self.dropout2 = nnx.Dropout(dropout, rngs=rngs)
        self.activation = get_activation_fn(activation)
        self.prenorm = prenorm

    def __call__(self, tgt, tgt_key_padding_mask=None):
        tgt2 = tgt
        if self.prenorm:
            tgt2 = self.norm1(tgt2)
        tgt2, self_attn = self.self_attn(
            tgt2, tgt2, tgt2, key_padding_mask=tgt_key_padding_mask
        )
        tgt = tgt + self.dropout1(tgt2)
        if not self.prenorm:
            tgt = self.norm1(_ln_split(tgt))
        if self.prenorm:
            tgt = self.norm2(tgt)
        tgt2 = self.linear2(self.dropout(self.activation(self.linear1(tgt))))
        tgt = tgt + self.dropout2(tgt2)
        if not self.prenorm:
            tgt = self.norm2(_ln_split(tgt))
        return tgt, self_attn


class MultiHeadAttentionSpatial(nnx.Module):
    """Attention fused with pairwise spatial features
    (reference transformers.py:157-239), all four fusion modes:

      * ``mul``: relu(loc_fc(pairwise)) per head; log-domain fusion
      * ``bias``: loc_fc(pairwise) added to logits
      * ``add``: (softmax(attn) + softmax(loc))/2
      * ``cond`` (GPS default): language-conditioned spatial gate —
        per-query weights from the *pre-projection* query embedding
        (``lang_cond_fc``), sigmoid, then log(loc)+attn (:206-232).
    """

    def __init__(self, d_model, n_head, dropout=0.1, spatial_multihead=True,
                 spatial_dim=5, spatial_attn_fusion="mul", *, rngs: nnx.Rngs):
        assert d_model % n_head == 0
        self.n_head = n_head
        self.d_model = d_model
        self.d_per_head = d_model // n_head
        self.spatial_multihead = spatial_multihead
        self.spatial_dim = spatial_dim
        self.spatial_attn_fusion = spatial_attn_fusion

        self.w_qs = _linear(d_model, d_model, rngs)
        self.w_ks = _linear(d_model, d_model, rngs)
        self.w_vs = _linear(d_model, d_model, rngs)
        self.fc = _linear(d_model, d_model, rngs)

        self.spatial_n_head = n_head if spatial_multihead else 1
        if spatial_attn_fusion in ["mul", "bias", "add"]:
            self.pairwise_loc_fc = _linear(spatial_dim, self.spatial_n_head, rngs)
        elif spatial_attn_fusion == "ctx":
            self.pairwise_loc_fc = _linear(spatial_dim, d_model, rngs)
        elif spatial_attn_fusion == "cond":
            self.lang_cond_fc = _linear(
                d_model, self.spatial_n_head * (spatial_dim + 1), rngs
            )
        else:
            raise NotImplementedError(
                f"unsupported spatial_attn_fusion {spatial_attn_fusion}"
            )

    def __call__(self, q_in, k_in, v_in, pairwise_locs,
                 key_padding_mask=None, txt_embeds=None):
        B, L, _ = q_in.shape
        H, dh = self.n_head, self.d_per_head
        residual = q_in
        q2, k2, v2 = self.w_qs(q_in), self.w_ks(k_in), self.w_vs(v_in)
        # bespoke fused path for the GPS 'cond' fusion: the spatial gate is
        # computed IN-KERNEL from the (B, H, L, 6) conditional weights and
        # the pairwise locations — the (B, H, L, T) gate/score/prob tensors
        # never leave VMEM (ops/pallas/mha.py). q/k/v ride PACKED
        # (B, T, H*dh): no head-split transposes on this path.
        from sceneverse_tpu.ops.pallas.mha import (
            fused_mha,
            fused_mha_enabled,
            fused_mha_supported,
        )

        if (self.spatial_attn_fusion == "cond" and self.spatial_multihead
                and self.spatial_dim == 5 and fused_mha_enabled()
                and fused_mha_supported(q2.shape[-1], H)):
            sw = self.lang_cond_fc(residual)
            sw = sw.reshape(B, L, H, self.spatial_dim + 1).transpose(0, 2, 1, 3)
            out = fused_mha(q2, k2, v2, H, key_padding_mask=key_padding_mask,
                            gate_sw=sw, locs=pairwise_locs,
                            scale=1.0 / math.sqrt(dh)).astype(v2.dtype)
            return self.fc(out), None
        # (B, T, D) -> (B, H, T, dh)
        q = q2.reshape(B, L, H, dh).transpose(0, 2, 1, 3)
        k = k2.reshape(B, -1, H, dh).transpose(0, 2, 1, 3)
        v = v2.reshape(B, -1, H, dh).transpose(0, 2, 1, 3)
        # compute-dtype logits (see MultiHeadAttention note): bf16 under
        # mixed precision, f32 otherwise; softmax below upcasts to f32
        attn = jnp.einsum(
            "bhlk,bhtk->bhlt", q, k, preferred_element_type=q.dtype
        ) / jnp.asarray(math.sqrt(dh), q.dtype)

        if self.spatial_attn_fusion in ["mul", "bias", "add"]:
            loc_attn = self.pairwise_loc_fc(pairwise_locs)  # (B,L,T,sh)
            loc_attn = loc_attn.transpose(0, 3, 1, 2)  # (B,sh,L,T)
            if self.spatial_attn_fusion == "mul":
                loc_attn = jax.nn.relu(loc_attn)
            if not self.spatial_multihead:
                loc_attn = jnp.repeat(loc_attn, H, axis=1)
        elif self.spatial_attn_fusion == "ctx":
            loc = self.pairwise_loc_fc(pairwise_locs)  # (B,L,T,D)
            loc = loc.reshape(*loc.shape[:3], H, dh)  # (B,L,T,H,dh)
            loc_attn = jnp.einsum(
                "bhlk,blthk->bhlt", q, loc, preferred_element_type=q.dtype
            ) / jnp.asarray(math.sqrt(dh), q.dtype)
        elif self.spatial_attn_fusion == "cond":
            sw = self.lang_cond_fc(residual)  # (B,L,sh*(sd+1))
            sw = sw.reshape(B, L, self.spatial_n_head, self.spatial_dim + 1)
            sw = sw.transpose(0, 2, 1, 3)  # (B,sh,L,sd+1)
            if self.spatial_n_head == 1:
                sw = jnp.repeat(sw, H, axis=1)
            spatial_bias = sw[..., :1]  # (B,H,L,1)
            spatial_weights = sw[..., 1:]  # (B,H,L,sd)
            loc_attn = (
                jnp.einsum("bhld,bltd->bhlt", spatial_weights, pairwise_locs)
                + spatial_bias
            )
            # log-domain directly: log(clip(sigmoid(x), 1e-6)) ==
            # max(log_sigmoid(x), log 1e-6) exactly (monotone log; sigmoid<=1
            # so only the lower clip binds). One transcendental instead of
            # sigmoid+log over the (B,H,L,T) tensor, and log_sigmoid is the
            # numerically stabler form for saturated gates.
            loc_attn = jnp.maximum(
                jax.nn.log_sigmoid(loc_attn),
                jnp.asarray(math.log(1e-6), loc_attn.dtype),
            )

        # NOTE: a fused-attention (flash, ab=spatial bias) variant of this
        # layer was measured SLOWER than XLA at GPS shapes (L=80: 840 -> 748
        # scenes/s): the additive bias must materialize f32 lane-padded for
        # the kernel, which costs more HBM traffic than XLA's fused mask-add
        # saves. The XLA path stays; masked_mha(ab=...) remains available
        # for long-sequence configs where the L x L blocks dominate.
        if key_padding_mask is not None:
            mask = key_padding_mask[:, None, None, :]  # (B,1,1,T)
            attn = jnp.where(mask, NEG_INF, attn)
            if self.spatial_attn_fusion == "cond":
                # already log-domain: masked reference value is
                # log(clip(0, 1e-6)) = log 1e-6
                loc_attn = jnp.where(
                    mask, jnp.asarray(math.log(1e-6), loc_attn.dtype), loc_attn
                )
            elif self.spatial_attn_fusion == "mul":
                loc_attn = jnp.where(mask, 0.0, loc_attn)
            else:
                loc_attn = jnp.where(mask, NEG_INF, loc_attn)

        if self.spatial_attn_fusion == "add":
            fused_attn = (
                jax.nn.softmax(attn.astype(jnp.float32), axis=3)
                + jax.nn.softmax(loc_attn.astype(jnp.float32), axis=3)
            ) / 2
        else:
            if self.spatial_attn_fusion == "mul":
                fused_attn = (
                    jnp.log(jnp.clip(loc_attn, min=1e-6)).astype(attn.dtype) + attn
                )
            elif self.spatial_attn_fusion == "cond":
                fused_attn = loc_attn.astype(attn.dtype) + attn
            else:
                fused_attn = loc_attn + attn
            # f32 softmax, v.dtype-only backward residual (ops/softmax.py)
            fused_attn = softmax_lowp(fused_attn, v.dtype)
        fused_attn = fused_attn.astype(v.dtype)

        output = jnp.einsum("bhlt,bhtv->bhlv", fused_attn, v)
        output = output.transpose(0, 2, 1, 3).reshape(B, L, self.d_model)
        return self.fc(output), fused_attn


class TransformerSpatialDecoderLayer(TransformerDecoderLayer):
    """reference transformers.py:242-282 — decoder with spatial self-attn."""

    def __init__(self, d_model, nhead, dim_feedforward=2048, dropout=0.1,
                 activation="relu", spatial_multihead=True, spatial_dim=5,
                 spatial_attn_fusion="mul", *, rngs: nnx.Rngs):
        super().__init__(
            d_model, nhead, dim_feedforward=dim_feedforward, dropout=dropout,
            activation=activation, rngs=rngs,
        )
        self.self_attn = MultiHeadAttentionSpatial(
            d_model, nhead, dropout=dropout, spatial_multihead=spatial_multihead,
            spatial_dim=spatial_dim, spatial_attn_fusion=spatial_attn_fusion,
            rngs=rngs,
        )

    def __call__(self, tgt, memory, tgt_pairwise_locs,
                 tgt_key_padding_mask=None, memory_key_padding_mask=None):
        tgt2 = self.norm1(tgt)
        tgt2, self_attn = self.self_attn(
            tgt2, tgt2, tgt2, tgt_pairwise_locs,
            key_padding_mask=tgt_key_padding_mask,
        )
        tgt = tgt + self.dropout1(tgt2)
        tgt2 = self.norm2(tgt)
        tgt2, cross_attn = self.multihead_attn(
            tgt2, memory, memory, key_padding_mask=memory_key_padding_mask
        )
        tgt = tgt + self.dropout2(tgt2)
        tgt2 = self.norm3(tgt)
        tgt2 = self.linear2(self.dropout(self.activation(self.linear1(tgt2))))
        tgt = tgt + self.dropout3(tgt2)
        return tgt, self_attn, cross_attn


class TransformerSpatialEncoderLayer(TransformerEncoderLayer):
    """reference transformers.py:285-316 — post-norm encoder with spatial
    self-attn (note: unlike the base encoder it is ALWAYS post-norm and the
    FFN consumes the normed residual, :301-316)."""

    def __init__(self, d_model, nhead, dim_feedforward=2048, dropout=0.1,
                 activation="relu", spatial_multihead=True, spatial_dim=5,
                 spatial_attn_fusion="mul", *, rngs: nnx.Rngs):
        super().__init__(
            d_model, nhead, dim_feedforward=dim_feedforward, dropout=dropout,
            activation=activation, rngs=rngs,
        )
        self.self_attn = MultiHeadAttentionSpatial(
            d_model, nhead, dropout=dropout, spatial_multihead=spatial_multihead,
            spatial_dim=spatial_dim, spatial_attn_fusion=spatial_attn_fusion,
            rngs=rngs,
        )

    def __call__(self, tgt, tgt_pairwise_locs, tgt_key_padding_mask=None):
        tgt2, self_attn = self.self_attn(
            tgt, tgt, tgt, tgt_pairwise_locs,
            key_padding_mask=tgt_key_padding_mask,
        )
        tgt = tgt + self.dropout1(tgt2)
        tgt = self.norm1(_ln_split(tgt))
        tgt2 = self.linear2(self.dropout(self.activation(self.linear1(tgt))))
        tgt = tgt + self.dropout2(tgt2)
        tgt = self.norm2(_ln_split(tgt))
        return tgt, self_attn
