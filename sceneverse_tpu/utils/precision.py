"""Mixed-precision control.

TPU-native training runs matmul-heavy compute in bfloat16 while keeping
parameters, optimizer state, normalization statistics, and softmax in
float32. NNX layers carry a ``dtype`` (computation dtype) attribute; this
walks the module graph and sets it on matmul layers (Linear/Embed/Conv),
leaving LayerNorm/BatchNorm in f32. Attention softmax is already forced to
f32 in our layers.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import nnx

_MATMUL_LAYERS = (nnx.Linear, nnx.Embed, nnx.Conv, nnx.LinearGeneral)
_NORM_LAYERS = (nnx.LayerNorm, nnx.BatchNorm, nnx.RMSNorm, nnx.GroupNorm)


def set_compute_dtype(model: nnx.Module, dtype=jnp.bfloat16) -> int:
    """Set the computation dtype of every matmul layer in ``model``.

    Params stay in their param_dtype (f32); flax casts inputs/params to
    ``dtype`` for the forward computation. Returns the number of layers
    switched.
    """
    n = 0
    for _path, module in nnx.iter_graph(model):
        if isinstance(module, _MATMUL_LAYERS):
            module.dtype = dtype
            n += 1
        elif isinstance(module, _NORM_LAYERS):
            module.dtype = jnp.float32
    return n


def enable_mixed_precision(model: nnx.Module) -> int:
    return set_compute_dtype(model, jnp.bfloat16)
