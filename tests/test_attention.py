"""Fused masked attention op (ops/pallas/attention.py): numerics vs the
plain softmax(QK^T+mask)V formulation, interpret mode on CPU."""

import math

import jax
import jax.numpy as jnp
import numpy as np

from sceneverse_tpu.ops.pallas.attention import masked_mha

B, H, L, DH = 1, 2, 130, 64
rng = np.random.RandomState(0)


def manual(q, k, v, pad, ab=None, scale=1.0):
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale
    if ab is not None:
        logits = logits + ab
    logits = jnp.where(pad[:, None, None, :], -1e9, logits)
    attn = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", attn, v)


def test_masked_mha_matches_manual():
    from jax.experimental.pallas import tpu as pltpu

    q = jnp.asarray(rng.randn(B, H, L, DH).astype(np.float32))
    k = jnp.asarray(rng.randn(B, H, L, DH).astype(np.float32))
    v = jnp.asarray(rng.randn(B, H, L, DH).astype(np.float32))
    pad = jnp.asarray(rng.rand(B, L) > 0.7)
    scale = 1.0 / math.sqrt(DH)

    with pltpu.force_tpu_interpret_mode():
        out = masked_mha(q, k, v, pad, sm_scale=scale)
    want = manual(q, k, v, pad, scale=scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               rtol=2e-2, atol=2e-2)  # bf16 kernel compute


def test_masked_mha_ab_bias():
    from jax.experimental.pallas import tpu as pltpu

    q = jnp.asarray(rng.randn(B, H, L, DH).astype(np.float32))
    k = jnp.asarray(rng.randn(B, H, L, DH).astype(np.float32))
    v = jnp.asarray(rng.randn(B, H, L, DH).astype(np.float32))
    pad = jnp.asarray(rng.rand(B, L) > 0.7)
    ab = jnp.asarray(rng.randn(B, H, L, L).astype(np.float32))
    scale = 1.0 / math.sqrt(DH)

    with pltpu.force_tpu_interpret_mode():
        out = masked_mha(q, k, v, pad, ab=ab, sm_scale=scale)
    want = manual(q, k, v, pad, ab=ab, scale=scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               rtol=2e-2, atol=2e-2)
