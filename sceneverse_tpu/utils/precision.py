"""Mixed-precision control.

TPU-native training runs matmul-heavy compute in bfloat16 while keeping
parameters, optimizer state, normalization statistics, and softmax in
float32. NNX layers carry a ``dtype`` (computation dtype) attribute; this
walks the module graph and sets it on matmul layers (Linear/Embed/Conv),
leaving LayerNorm/BatchNorm in f32. Attention softmax is already forced to
f32 in our layers.
"""

from __future__ import annotations

import os

import jax.numpy as jnp
from flax import nnx

_MATMUL_LAYERS = (nnx.Linear, nnx.Embed, nnx.Conv, nnx.LinearGeneral)
_NORM_LAYERS = (nnx.LayerNorm, nnx.BatchNorm, nnx.RMSNorm, nnx.GroupNorm)


def _ln_output_dtype(default=jnp.float32):
    """Output dtype for LayerNorm under mixed precision. flax's
    ``_compute_stats`` ALWAYS computes mean/var in f32 ("at least float32
    for stability"); the layer ``dtype`` only sets what the normalized
    result is cast to (``_normalize``) — bf16 halves the LN HBM write plus
    the residual the VJP saves, and the next matmul casts to bf16 anyway.
    Gate: SCENEVERSE_LN_BF16. Default ON (round 5): neutral at cap_len=64
    (1216.8 off vs 1212.2 on — those short-L LN fusions are compute-bound)
    but +9.5% at the production cap_len=300 headline shape (840.8 -> 920.3
    scenes/s, MFU 0.519): the 300-token caption tower's LN-rooted fusions
    stream f32[128,300,768] tuples and ARE bandwidth-bound."""
    v = os.environ.get("SCENEVERSE_LN_BF16", "on").lower()
    return jnp.bfloat16 if v in ("1", "on", "true") else default


def _bn_output_dtype(default=jnp.float32):
    """Output dtype for BatchNorm under mixed precision; stats stay f32
    exactly as for LayerNorm (see ``_ln_output_dtype``). Matters for the
    trainable-vision (unfreeze) path, where BN normalizes the grouped
    (B*num_obj, m, nsample, C) streams — the largest tensors in that step —
    and the f32 normalize/backward pipes were 27.5 ms of the 128.9 ms b64
    step. Default ON (measured +3.6% unfreeze: 469.2 -> 486.3 scenes/s,
    BASELINE.md round 4): every BN consumer casts to bf16 anyway under
    mixed precision, so the forward only moves that rounding one op
    earlier. Gate: SCENEVERSE_BN_BF16 (on|off)."""
    v = os.environ.get("SCENEVERSE_BN_BF16", "on").lower()
    return jnp.bfloat16 if v in ("1", "on", "true") else default


def set_compute_dtype(model: nnx.Module, dtype=jnp.bfloat16) -> int:
    """Set the computation dtype of every matmul layer in ``model``.

    Params stay in their param_dtype (f32); flax casts inputs/params to
    ``dtype`` for the forward computation. Returns the number of layers
    switched.
    """
    n = 0
    ln_dtype = _ln_output_dtype()
    for _path, module in nnx.iter_graph(model):
        if isinstance(module, _MATMUL_LAYERS):
            module.dtype = dtype
            n += 1
        elif isinstance(module, nnx.LayerNorm):
            module.dtype = ln_dtype
        elif isinstance(module, nnx.BatchNorm):
            module.dtype = _bn_output_dtype()
        elif isinstance(module, _NORM_LAYERS):
            module.dtype = jnp.float32
    return n


def enable_mixed_precision(model: nnx.Module) -> int:
    return set_compute_dtype(model, jnp.bfloat16)
