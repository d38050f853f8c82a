"""Module helpers (reference modules/utils.py).

``calc_pairwise_locs`` lives in :mod:`sceneverse_tpu.ops.geometry` (it is a
pure array op); re-exported here to keep the reference's import surface.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
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
        # reference modules/utils.py:15 resolves to torch F.gelu, which is
        # the EXACT erf GELU (jax.nn.gelu defaults to the tanh approximation)
        return lambda x: jax.nn.gelu(x, approximate=False)
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


# ---------------------------------------------------------------------------
# Label-mixup schedules (reference modules/utils.py:117-165). The reference
# encoder keeps these commented out of its forward path
# (pcd_openvocab_encoder.py:94-96,144-155) but ships them; both are provided
# here as vectorized, jit-safe functions (the reference loops per object).
# ---------------------------------------------------------------------------


def get_mixup_function(mixup_strategy, mixup_stage1=None, mixup_stage2=None):
    """reference modules/utils.py:117-125."""
    if mixup_strategy is None:
        return None
    assert mixup_strategy in ("linear_decay", "all_mixup")
    if mixup_strategy == "linear_decay":
        return LinearDecayMixup(mixup_stage1, mixup_stage2)
    return AllMixup()


class AllMixup:
    """Replace every labelled object's class distribution with its one-hot
    ground truth (reference modules/utils.py:128-138)."""

    def __call__(self, obj_sem_cls_pred, obj_labels, cur_step=None,
                 total_steps=None, rng_key=None):
        num_cls = obj_sem_cls_pred.shape[-1]
        onehot = jax.nn.one_hot(jnp.clip(obj_labels, 0), num_cls,
                                dtype=obj_sem_cls_pred.dtype)
        valid = (obj_labels >= 0)[..., None]
        return jnp.where(valid, onehot, jnp.zeros_like(obj_sem_cls_pred))


class LinearDecayMixup:
    """Mixup ratio 1.0 until ``stage1``·total steps, linearly decaying to 0 at
    ``stage2``·total (reference modules/utils.py:141-165). Random per-object
    Bernoulli(ratio) selects which labelled objects get their one-hot label."""

    def __init__(self, mixup_stage1, mixup_stage2):
        assert mixup_stage2 > mixup_stage1
        self.stage1_rate = mixup_stage1
        self.stage2_rate = mixup_stage2

    def __call__(self, obj_sem_cls_pred, obj_labels, cur_step, total_steps,
                 rng_key=None):
        s1 = total_steps * self.stage1_rate
        s2 = total_steps * self.stage2_rate
        ratio = jnp.clip((s2 - cur_step) / (s2 - s1), 0.0, 1.0)
        if rng_key is None:
            rng_key = jax.random.PRNGKey(0)
        rand = jax.random.uniform(rng_key, obj_sem_cls_pred.shape[:2])
        pick = (rand < ratio) & (obj_labels >= 0)
        num_cls = obj_sem_cls_pred.shape[-1]
        onehot = jax.nn.one_hot(jnp.clip(obj_labels, 0), num_cls,
                                dtype=obj_sem_cls_pred.dtype)
        return jnp.where(pick[..., None], onehot, obj_sem_cls_pred)
