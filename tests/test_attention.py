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


# ---------------------------------------------------------------------------
# softmax_lowp (ops/softmax.py): memory-lean attention softmax
# ---------------------------------------------------------------------------

def test_softmax_lowp_f32_bit_identical():
    """In f32 mode: forward bit-identical to jax.nn.softmax; backward equals
    the standard VJP up to float op-ordering (≤ ~1 ulp per element)."""
    import numpy as np
    from sceneverse_tpu.ops.softmax import softmax_lowp

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 3, 8, 8)).astype(np.float32))
    g = jnp.asarray(rng.normal(size=x.shape).astype(np.float32))

    ref, ref_vjp = jax.vjp(lambda a: jax.nn.softmax(a, axis=-1), x)
    got, got_vjp = jax.vjp(lambda a: softmax_lowp(a, jnp.float32), x)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))
    np.testing.assert_allclose(
        np.asarray(ref_vjp(g)[0]), np.asarray(got_vjp(g)[0]),
        atol=1e-6, rtol=1e-4,
    )


def test_softmax_lowp_bf16_grad_close():
    """bf16 residual mode: forward equals softmax-then-cast; backward is the
    exact softmax VJP evaluated on bf16-rounded probs (within bf16 tol of the
    f32 gradient)."""
    import numpy as np
    from sceneverse_tpu.ops.softmax import softmax_lowp

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(4, 16)).astype(np.float32) * 3)
    g = jnp.asarray(rng.normal(size=x.shape).astype(np.float32))

    got, got_vjp = jax.vjp(lambda a: softmax_lowp(a, jnp.bfloat16), x)
    ref_fwd = jax.nn.softmax(x.astype(jnp.float32), axis=-1).astype(jnp.bfloat16)
    np.testing.assert_array_equal(np.asarray(ref_fwd, np.float32),
                                  np.asarray(got, np.float32))

    (dx,) = got_vjp(got.astype(jnp.bfloat16) * 0 + g.astype(jnp.bfloat16))
    # reference gradient from f32 probs
    p = jax.nn.softmax(x, axis=-1)
    s = jnp.sum(p * g, axis=-1, keepdims=True)
    ref_dx = p * (g - s)
    np.testing.assert_allclose(np.asarray(dx), np.asarray(ref_dx),
                               atol=2e-2, rtol=2e-2)
    assert dx.dtype == jnp.float32
