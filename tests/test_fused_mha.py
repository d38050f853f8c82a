"""Bespoke fused attention kernel (ops/pallas/mha.py): forward + custom-VJP
numerics vs the towers' XLA math, interpret mode on CPU, f32 (the kernel is
dtype-faithful, so f32-in means exact-formula compute).

The kernel consumes PACKED (B, L, H*dh) q/k/v (see mha.py module docstring);
the references below compute the classic per-head math on the unpacked view,
so grads compare directly in packed space.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sceneverse_tpu.ops.pallas.mha import fused_mha

LOG1E6 = math.log(1e-6)
rng = np.random.RandomState(7)


def unpack(x, H):  # (B, L, H*dh) -> (B, H, L, dh)
    B, L, D = x.shape
    return x.reshape(B, L, H, D // H).transpose(0, 2, 1, 3)


def ref_plain(q, k, v, pad, scale, H):
    q, k, v = unpack(q, H), unpack(k, H), unpack(v, H)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale
    logits = jnp.where(pad[:, None, None, :], -1e30, logits)
    attn = jax.nn.softmax(logits, axis=-1)
    o = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
    B, _, L, dh = o.shape
    return o.transpose(0, 2, 1, 3).reshape(B, L, H * dh)


def ref_cond(q, k, v, sw, locs, pad, scale, H):
    """MultiHeadAttentionSpatial 'cond' math (transformers.py)."""
    q, k, v = unpack(q, H), unpack(k, H), unpack(v, H)
    attn = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale
    bias = sw[..., 0:1]
    weights = sw[..., 1:]
    loc = jnp.einsum("bhld,bltd->bhlt", weights, locs) + bias
    loc = jnp.maximum(jax.nn.log_sigmoid(loc), LOG1E6)
    mask = pad[:, None, None, :]
    attn = jnp.where(mask, -1e30, attn)
    loc = jnp.where(mask, LOG1E6, loc)
    p = jax.nn.softmax(attn + loc, axis=-1)
    o = jnp.einsum("bhqk,bhkd->bhqd", p, v)
    B, _, L, dh = o.shape
    return o.transpose(0, 2, 1, 3).reshape(B, L, H * dh)


def _rand(*shape):
    return jnp.asarray(rng.randn(*shape).astype(np.float32))


@pytest.mark.parametrize("L,T", [(13, 13), (10, 26)])
def test_fused_mha_plain_fwd_bwd(L, T):
    B, H, dh = 2, 3, 8
    q, k, v = _rand(B, L, H * dh), _rand(B, T, H * dh), _rand(B, T, H * dh)
    w = _rand(B, L, H * dh)
    pad = jnp.asarray(rng.rand(B, T) > 0.7)
    pad = pad.at[:, 0].set(False)  # at least one valid key
    scale = 1.0 / math.sqrt(dh)

    def loss_fused(q, k, v):
        o = fused_mha(q, k, v, H, key_padding_mask=pad, scale=scale,
                      interpret=True)
        return jnp.sum(o * w)

    def loss_ref(q, k, v):
        return jnp.sum(ref_plain(q, k, v, pad, scale, H) * w)

    got, grads = jax.value_and_grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    want, wgrads = jax.value_and_grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5)
    for g, wg in zip(grads, wgrads):
        np.testing.assert_allclose(np.asarray(g), np.asarray(wg),
                                   rtol=1e-4, atol=1e-5)


def test_fused_mha_additive_bias_matches_bool_mask():
    B, H, L, dh = 2, 2, 9, 8
    q, k, v = (_rand(B, L, H * dh) for _ in range(3))
    pad = jnp.asarray(rng.rand(B, L) > 0.6).at[:, 0].set(False)
    scale = 1.0 / math.sqrt(dh)
    o1 = fused_mha(q, k, v, H, key_padding_mask=pad, scale=scale,
                   interpret=True)
    o2 = fused_mha(q, k, v, H, pad_additive=jnp.where(pad, -1e30, 0.0),
                   scale=scale, interpret=True)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2))


def test_fused_mha_cond_gate_fwd_bwd():
    B, H, L, dh = 2, 3, 11, 8
    q, k, v = (_rand(B, L, H * dh) for _ in range(3))
    sw = _rand(B, H, L, 6) * 2.0
    locs = _rand(B, L, L, 5)
    w = _rand(B, L, H * dh)
    pad = jnp.asarray(rng.rand(B, L) > 0.7).at[:, 0].set(False)
    scale = 1.0 / math.sqrt(dh)

    def loss_fused(q, k, v, sw):
        o = fused_mha(q, k, v, H, key_padding_mask=pad, gate_sw=sw,
                      locs=locs, scale=scale, interpret=True)
        return jnp.sum(o * w)

    def loss_ref(q, k, v, sw):
        return jnp.sum(ref_cond(q, k, v, sw, locs, pad, scale, H) * w)

    got, grads = jax.value_and_grad(loss_fused, argnums=(0, 1, 2, 3))(
        q, k, v, sw)
    want, wgrads = jax.value_and_grad(loss_ref, argnums=(0, 1, 2, 3))(
        q, k, v, sw)
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5)
    for g, wg in zip(grads, wgrads):
        np.testing.assert_allclose(np.asarray(g), np.asarray(wg),
                                   rtol=1e-4, atol=1e-5)


def test_fused_mha_bf16_inputs_close_to_f32():
    B, H, L, dh = 1, 2, 13, 8
    q, k, v = (_rand(B, L, H * dh) for _ in range(3))
    pad = jnp.zeros((B, L), bool)
    scale = 1.0 / math.sqrt(dh)
    o32 = fused_mha(q, k, v, H, key_padding_mask=pad, scale=scale,
                    interpret=True)
    o16 = fused_mha(q.astype(jnp.bfloat16), k.astype(jnp.bfloat16),
                    v.astype(jnp.bfloat16), H, key_padding_mask=pad,
                    scale=scale, interpret=True)
    np.testing.assert_allclose(np.asarray(o16), np.asarray(o32),
                               rtol=2e-2, atol=2e-2)


def test_modules_fused_vs_xla_paths(monkeypatch):
    """MultiHeadAttention / MultiHeadAttentionSpatial('cond') / BERT
    self-attention produce the same outputs through the fused kernel as
    through the XLA path (f32, eval mode — dropout off)."""
    from flax import nnx

    import sceneverse_tpu.modules.language.bert as bert_mod
    import sceneverse_tpu.modules.layers.transformers as tr
    from sceneverse_tpu.ops.pallas import mha as mha_mod

    orig_fused = mha_mod.fused_mha
    fused_interp = lambda *a, **kw: orig_fused(*a, **{**kw, "interpret": True})

    def run(enabled):
        # tr and bert import fused_mha/fused_mha_enabled INSIDE the call, so
        # patching the source-module symbols covers every integration site
        monkeypatch.setattr(mha_mod, "fused_mha_enabled",
                            (lambda: True) if enabled else (lambda: False))
        monkeypatch.setattr(mha_mod, "fused_mha",
                            fused_interp if enabled else orig_fused)

        outs = []
        B, L, D, H = 2, 9, 24, 4
        mha = tr.MultiHeadAttention(D, H, dropout=0.3, rngs=nnx.Rngs(0))
        mha.eval()
        x = _rand(B, L, D)
        pad = jnp.asarray(rng.rand(B, L) > 0.6).at[:, 0].set(False)
        outs.append(mha(x, x, x, key_padding_mask=pad)[0])

        sp = tr.MultiHeadAttentionSpatial(
            D, H, spatial_attn_fusion="cond", rngs=nnx.Rngs(1))
        sp.eval()
        locs = _rand(B, L, L, 5)
        outs.append(sp(x, x, x, locs, key_padding_mask=pad)[0])

        cfg = bert_mod.BertConfig(hidden_size=D, num_hidden_layers=1,
                                  num_attention_heads=H,
                                  intermediate_size=2 * D)
        att = bert_mod.BertSelfAttention(cfg, rngs=nnx.Rngs(2))
        att.eval()
        bias = jnp.where(pad, -1e4, 0.0)[:, None, None, :]
        outs.append(att(x, bias))
        return outs

    rng.seed(11)
    fused = run(True)
    rng.seed(11)
    plain = run(False)
    for f, p in zip(fused, plain):
        np.testing.assert_allclose(np.asarray(f), np.asarray(p),
                                   rtol=2e-5, atol=2e-6)


@pytest.mark.parametrize("L,gate", [(130, False), (80, True), (50, False)])
def test_fused_mha_gps_shapes(L, gate):
    """Real GPS tower shapes (H=12, dh=64 -> two heads per 128-lane block;
    unified L=130, spatial L=80 with gate, lang L=50) through the kernel in
    interpret mode."""
    B, H, dh = 2, 12, 64
    q, k, v = (_rand(B, L, H * dh) for _ in range(3))
    pad = jnp.asarray(rng.rand(B, L) > 0.85).at[:, 0].set(False)
    scale = 1.0 / math.sqrt(dh)
    kw = {}
    if gate:
        kw = dict(gate_sw=_rand(B, H, L, 6), locs=_rand(B, L, L, 5))
    o = fused_mha(q, k, v, H, key_padding_mask=pad, scale=scale,
                  interpret=True, **kw)
    if gate:
        want = ref_cond(q, k, v, kw["gate_sw"], kw["locs"], pad, scale, H)
    else:
        want = ref_plain(q, k, v, pad, scale, H)
    np.testing.assert_allclose(np.asarray(o), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


def test_fused_mha_gps_shapes_bwd():
    """Packed-layout grads at the real geometry (two dh=64 heads per
    128-lane block): dq/dk/dv must land on the correct head lanes."""
    B, H, L, dh = 1, 4, 16, 64
    q, k, v = (_rand(B, L, H * dh) for _ in range(3))
    w = _rand(B, L, H * dh)
    pad = jnp.asarray(rng.rand(B, L) > 0.8).at[:, 0].set(False)
    scale = 1.0 / math.sqrt(dh)

    def loss_fused(q, k, v):
        o = fused_mha(q, k, v, H, key_padding_mask=pad, scale=scale,
                      interpret=True)
        return jnp.sum(o * w)

    def loss_ref(q, k, v):
        return jnp.sum(ref_plain(q, k, v, pad, scale, H) * w)

    got, grads = jax.value_and_grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    want, wgrads = jax.value_and_grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5)
    for g, wg in zip(grads, wgrads):
        np.testing.assert_allclose(np.asarray(g), np.asarray(wg),
                                   rtol=1e-4, atol=1e-5)


def test_fused_mha_block_batch_bit_identical(monkeypatch):
    """SCENEVERSE_MHA_BLOCK_B > 1 packs several batch elements per grid step
    (mha.py _block_batch); per-element math and dropout-seed derivation
    (b = pid*bob + bi = global batch index) are unchanged, so outputs and
    grads must match bob=1 to reduction-reassociation tolerance (a few ulp
    — interpret mode compiles each bob variant as a different XLA program,
    so f32 accumulation orders differ) — with the cond gate and with
    dropout active (same masks: seed derivation is by GLOBAL batch
    index)."""
    B, H, L, dh = 4, 3, 11, 8
    q, k, v = (_rand(B, L, H * dh) for _ in range(3))
    sw = _rand(B, H, L, 6)
    locs = _rand(B, L, L, 5)
    pad = jnp.asarray(rng.rand(B, L) > 0.6).at[:, 0].set(False)
    w = _rand(B, L, H * dh)
    seed = jnp.asarray([5], jnp.int32)
    scale = 1.0 / math.sqrt(dh)

    def run():
        def loss(q, k, v, sw):
            o = fused_mha(q, k, v, H, key_padding_mask=pad, gate_sw=sw,
                          locs=locs, dropout_rate=0.2, seed=seed,
                          scale=scale, interpret=True)
            return jnp.sum(o * w)

        val, grads = jax.value_and_grad(loss, argnums=(0, 1, 2, 3))(
            q, k, v, sw)
        return val, grads

    monkeypatch.delenv("SCENEVERSE_MHA_BLOCK_B", raising=False)
    v1, g1 = run()
    for bob in ("2", "4", "3"):  # 3: B % 3 != 0 -> falls back to 2
        monkeypatch.setenv("SCENEVERSE_MHA_BLOCK_B", bob)
        v2, g2 = run()
        np.testing.assert_allclose(float(v1), float(v2), rtol=1e-6)
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=2e-6)
