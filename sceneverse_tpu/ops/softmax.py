"""Memory-lean attention softmax.

``softmax_lowp(logits, out_dtype)`` computes a float32 softmax over the last
axis and returns it cast to ``out_dtype`` — with a custom VJP that saves ONLY
the low-precision output as the backward residual.

Why: under autodiff, ``softmax(f32).astype(bf16)`` stores the **float32**
probabilities for the softmax VJP *in addition to* the bf16 copy consumed by
the attention-value matmul. At GPS shapes a single unified-encoder layer's
probability tensor is f32[B,12,130,130] ≈ 104 MB at B=128; a device profile
of the train step (profile_analyze.py) showed these residual stores and their
backward reads as the largest single HBM consumer after the matmuls
themselves. The softmax gradient ``p * (g - <p, g>)`` needs only ``p`` — and
bf16 probabilities are plenty (p ∈ [0,1]; this is the same precision contract
as every bf16 flash-attention backward, e.g. the reference's torch AMP
attention keeps probs in half precision too, reference transformers.py:139).

When ``out_dtype`` is float32 the forward is bit-identical to
``jax.nn.softmax`` and the backward computes the same standard VJP formula
``p * (g - <p, g>)`` from full-precision probs (differing from JAX's built-in
rule only in float op-ordering, ≤ ~1 ulp), so full-precision parity paths are
unaffected.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def _softmax_lowp(logits, out_dtype, in_dtype):
    p = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    return p.astype(out_dtype)


def _fwd(logits, out_dtype, in_dtype):
    p = _softmax_lowp(logits, out_dtype, in_dtype)
    return p, p


def _bwd(out_dtype, in_dtype, p, g):
    pf = p.astype(jnp.float32)
    gf = g.astype(jnp.float32)
    s = jnp.sum(pf * gf, axis=-1, keepdims=True)
    # cotangent MUST carry the primal logits dtype (bf16 logits under mixed
    # precision) — upstream VJPs (e.g. lax.div of the scale) require it
    return ((pf * (gf - s)).astype(in_dtype),)


_softmax_lowp.defvjp(_fwd, _bwd)


def softmax_lowp(logits, out_dtype):
    """f32 softmax over the last axis, result cast to ``out_dtype``; backward
    keeps only the ``out_dtype`` probabilities."""
    return _softmax_lowp(logits, jnp.dtype(out_dtype), logits.dtype)
