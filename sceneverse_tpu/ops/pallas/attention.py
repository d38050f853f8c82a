"""Fused masked multi-head attention for the transformer towers.

XLA compiles softmax(QK^T)V as separate dot fusions, so the (B, H, L, L)
score tensor round-trips HBM twice per layer (~100 MB at GPS batch-128
shapes, L=130) and the L dimension lane-pads 130->256. The TPU flash
attention kernel (jax.experimental.pallas.ops.tpu.flash_attention — public
JAX, grid over (batch, head, q-blocks)) keeps the scores in VMEM and comes
with a custom VJP, so it drops into training.

Key-padding is expressed through ``segment_ids`` (valid tokens = segment 1,
pads = segment 0): valid queries attend exactly the valid keys — identical
to the towers' additive -inf masking (reference transformers.py:129-135) —
and pad-row outputs are garbage-but-finite, masked downstream exactly as in
the XLA path.

Sequence lengths must divide the kernel block sizes; GPS lengths (50/64/80/
130) are padded here to the next multiple of 128 and sliced back.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

_GATE_ENV = "SCENEVERSE_FLASH_ATTN"


def flash_enabled() -> bool:
    """Fused attention gate. Default OFF: at GPS sequence lengths (50-130)
    the XLA path wins — measured on v5e, flash in the towers cost 840 -> 748
    scenes/s on the train step and +4 ms on batch-1 grounding latency (tiny
    per-(batch, head) grid blocks + lane padding dominate; there is no big
    L x L score tensor to save). Set SCENEVERSE_FLASH_ATTN=on for
    long-context configs (scene captions at max_scene_cap_len >= 512) where
    the score tensors outgrow VMEM-friendly XLA fusions."""
    v = os.environ.get(_GATE_ENV, "off").lower()
    if v in ("1", "on", "true"):
        return jax.default_backend() == "tpu"
    return False


@functools.partial(jax.jit, static_argnames=("sm_scale",))
def masked_mha(q, k, v, key_pad_mask=None, ab=None, *, sm_scale: float):
    """softmax(q @ k^T * sm_scale [+ ab] + pad mask) @ v, TPU flash kernel.

    Args:
      q, k, v: (B, H, L, dh) float arrays (computed bf16, f32 softmax
        inside the kernel).
      key_pad_mask: optional (B, Lk) bool, True = PAD key (torch
        masked_fill convention used throughout the towers); reproduced
        through segment ids, which the kernel applies as -inf.
      ab: optional (B, H, Lq, Lk) additive logit bias (the spatial towers'
        location prior), applied AFTER sm_scale like the XLA path.
      sm_scale: logit scale (1/sqrt(dh)).
    Returns:
      (B, H, Lq, dh) f32.
    """
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes,
        SegmentIds,
        flash_attention,
    )

    B, H, Lq, dh = q.shape
    Lk = k.shape[2]
    pq = (-Lq) % 128
    pk = (-Lk) % 128
    # the kernel applies sm_scale AFTER adding ab ((qk+ab)*s); the towers'
    # semantics are qk*s + ab — pre-scale q and run the kernel at scale 1
    qp = jnp.pad(q * sm_scale, ((0, 0), (0, 0), (0, pq), (0, 0)))
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, pk), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, 0), (0, pk), (0, 0)))

    if key_pad_mask is None:
        kv_seg = jnp.pad(jnp.ones((B, Lk), jnp.int32), ((0, 0), (0, pk)))
    else:
        kv_seg = jnp.pad(1 - key_pad_mask.astype(jnp.int32),
                         ((0, 0), (0, pk)))
    # every real query is segment 1 (it attends exactly the valid keys);
    # padded query rows get segment 0 — their output is garbage-but-finite
    # (or 0 on empty softmax) and is sliced off below
    q_seg = jnp.pad(jnp.ones((B, Lq), jnp.int32), ((0, 0), (0, pq)))
    if ab is not None:
        ab = jnp.pad(ab.astype(jnp.float32),
                     ((0, 0), (0, 0), (0, pq), (0, pk)))

    Lqp, Lkp = Lq + pq, Lk + pk

    def blk(L):  # largest power-of-two block <= 512 that divides L
        for b in (512, 256, 128):
            if L % b == 0:
                return b
        raise AssertionError(f"padded length {L} not a multiple of 128")

    bq, bk = blk(Lqp), blk(Lkp)
    bs = BlockSizes(
        block_q=bq, block_k_major=bk, block_k=bk, block_b=1,
        block_q_major_dkv=bq, block_k_major_dkv=bk,
        block_k_dkv=bk, block_q_dkv=bq,
        block_k_major_dq=bk, block_k_dq=bk, block_q_dq=bq,
    )
    out = flash_attention(
        qp.astype(jnp.bfloat16), kp.astype(jnp.bfloat16),
        vp.astype(jnp.bfloat16), ab=ab,
        segment_ids=SegmentIds(q=q_seg, kv=kv_seg),
        sm_scale=1.0, block_sizes=bs,
    )
    return out[:, :, :Lq, :].astype(jnp.float32)
