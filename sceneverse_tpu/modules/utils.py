"""Module helpers (reference modules/utils.py).

``calc_pairwise_locs`` lives in :mod:`sceneverse_tpu.ops.geometry` (it is a
pure array op); re-exported here to keep the reference's import surface.
"""

from __future__ import annotations

import jax
from flax import nnx

from sceneverse_tpu.ops.geometry import calc_pairwise_locs, calc_pairwise_locs_mv  # noqa: F401
from sceneverse_tpu.modules.weights import bert_linear_kernel_init, zeros_init


def get_activation_fn(activation_type: str):
    """reference modules/utils.py:12-15 (relu/gelu/glu)."""
    if activation_type not in ["relu", "gelu", "glu"]:
        raise RuntimeError(
            f"activation function currently support relu/gelu, not {activation_type}"
        )
    if activation_type == "relu":
        return jax.nn.relu
    if activation_type == "gelu":
        return jax.nn.gelu
    return jax.nn.glu


class MlpHead(nnx.Module):
    """Linear -> ReLU -> LayerNorm(eps 1e-12) -> Dropout -> Linear
    (reference modules/utils.py:18-25 ``get_mlp_head``)."""

    def __init__(self, input_size: int, hidden_size: int, output_size: int,
                 dropout: float = 0.0, *, rngs: nnx.Rngs):
        lin = lambda i, o: nnx.Linear(
            i, o, kernel_init=bert_linear_kernel_init, bias_init=zeros_init, rngs=rngs
        )
        self.fc1 = lin(input_size, hidden_size)
        self.norm = nnx.LayerNorm(hidden_size, epsilon=1e-12, rngs=rngs)
        self.dropout = nnx.Dropout(dropout, rngs=rngs)
        self.fc2 = lin(hidden_size, output_size)

    def __call__(self, x):
        x = self.norm(jax.nn.relu(self.fc1(x)))
        return self.fc2(self.dropout(x))


def get_mlp_head(input_size, hidden_size, output_size, dropout=0.0, *, rngs):
    return MlpHead(input_size, hidden_size, output_size, dropout, rngs=rngs)


def layer_repeat(factory, n: int, share_layer: bool = False):
    """Build n independent layers from a zero-arg factory (reference
    modules/utils.py:28-32 deep-copies a prototype; in JAX fresh construction
    with fresh RNG streams is the equivalent)."""
    if share_layer:
        layer = factory()
        return [layer] * n
    return [factory() for _ in range(n)]
