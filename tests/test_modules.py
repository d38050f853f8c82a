"""Construction + forward smoke/shape/semantics tests for the module library,
including a torch cross-check of the attention math."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

from sceneverse_tpu.modules import build_module
from sceneverse_tpu.modules.layers.pointnet import PointNetPP
from sceneverse_tpu.modules.layers.transformers import (
    MultiHeadAttention,
    MultiHeadAttentionSpatial,
    TransformerEncoderLayer,
    TransformerSpatialEncoderLayer,
)
from sceneverse_tpu.modules.language.bert import BERTLanguageEncoder


def rngs():
    return nnx.Rngs(0)


def test_multihead_attention_matches_torch():
    """Our packed-qkv attention must reproduce torch nn.MultiheadAttention."""
    import torch

    d, h, B, L = 32, 4, 2, 5
    mha = MultiHeadAttention(d, h, dropout=0.0, rngs=rngs())
    mha.eval()
    tmha = torch.nn.MultiheadAttention(d, h, dropout=0.0, batch_first=True)
    tmha.eval()
    # copy our params into torch (in_proj packing must agree)
    with torch.no_grad():
        tmha.in_proj_weight.copy_(torch.tensor(np.asarray(mha.in_proj.kernel.value).T))
        tmha.in_proj_bias.copy_(torch.tensor(np.asarray(mha.in_proj.bias.value)))
        tmha.out_proj.weight.copy_(torch.tensor(np.asarray(mha.out_proj.kernel.value).T))
        tmha.out_proj.bias.copy_(torch.tensor(np.asarray(mha.out_proj.bias.value)))
    x = np.random.RandomState(0).randn(B, L, d).astype(np.float32)
    pad = np.zeros((B, L), bool)
    pad[:, -1] = True
    ours, _ = mha(jnp.asarray(x), jnp.asarray(x), jnp.asarray(x),
                  key_padding_mask=jnp.asarray(pad))
    theirs, _ = tmha(torch.tensor(x), torch.tensor(x), torch.tensor(x),
                     key_padding_mask=torch.tensor(pad))
    np.testing.assert_allclose(np.asarray(ours), theirs.detach().numpy(),
                               rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("fusion", ["mul", "bias", "add", "cond", "ctx"])
def test_spatial_attention_fusions_run(fusion):
    B, L, D, H, S = 2, 6, 24, 4, 5
    m = MultiHeadAttentionSpatial(D, H, spatial_attn_fusion=fusion, rngs=rngs())
    m.eval()
    x = jnp.asarray(np.random.RandomState(1).randn(B, L, D).astype(np.float32))
    pl = jnp.asarray(np.random.RandomState(2).randn(B, L, L, S).astype(np.float32))
    pad = jnp.zeros((B, L), bool).at[:, -2:].set(True)
    out, attn = m(x, x, x, pl, key_padding_mask=pad)
    assert out.shape == (B, L, D)
    attn = np.asarray(attn)
    assert np.isfinite(np.asarray(out)).all()
    # attention to padded keys must be zero, rows sum to 1
    assert np.allclose(attn[..., -2:], 0.0, atol=1e-6)
    np.testing.assert_allclose(attn.sum(-1), 1.0, rtol=1e-5)


def test_spatial_attention_single_head_spatial():
    m = MultiHeadAttentionSpatial(
        24, 4, spatial_multihead=False, spatial_attn_fusion="cond", rngs=rngs()
    )
    m.eval()
    x = jnp.ones((2, 6, 24))
    pl = jnp.ones((2, 6, 6, 5))
    out, _ = m(x, x, x, pl)
    assert out.shape == (2, 6, 24)


def test_encoder_layer_padding_invariance():
    """Padded-key content must not affect valid-token outputs (post-norm)."""
    layer = TransformerEncoderLayer(16, 4, dim_feedforward=32, dropout=0.0, rngs=rngs())
    layer.eval()
    rng = np.random.RandomState(3)
    x1 = rng.randn(1, 5, 16).astype(np.float32)
    x2 = x1.copy()
    x2[:, -1] = rng.randn(16)  # change only the padded position
    pad = jnp.zeros((1, 5), bool).at[:, -1].set(True)
    y1, _ = layer(jnp.asarray(x1), tgt_key_padding_mask=pad)
    y2, _ = layer(jnp.asarray(x2), tgt_key_padding_mask=pad)
    np.testing.assert_allclose(np.asarray(y1)[:, :-1], np.asarray(y2)[:, :-1],
                               rtol=1e-5, atol=1e-6)


def test_pointnet_pp_shapes_and_grad():
    model = PointNetPP(
        sa_n_points=[16, 8, None],
        sa_n_samples=[8, 8, None],
        sa_radii=[0.2, 0.4, None],
        sa_mlps=[[3, 8, 8, 16], [16, 16, 16, 32], [32, 32, 32, 48]],
        rngs=rngs(),
    )
    model.train()
    pc = jnp.asarray(np.random.RandomState(0).randn(4, 64, 6).astype(np.float32))
    out = model(pc)
    assert out.shape == (4, 48)
    assert np.isfinite(np.asarray(out)).all()

    def loss(m, pc):
        return jnp.sum(m(pc) ** 2)

    grads = nnx.grad(loss)(model, pc)
    leaves = jax.tree.leaves(grads)
    assert leaves and all(np.isfinite(np.asarray(l)).all() for l in leaves)


def test_bert_encoder_mask_semantics():
    enc = BERTLanguageEncoder(hidden_size=32, num_hidden_layers=2,
                              num_attention_heads=4, rngs=rngs())
    enc.eval()
    ids = jnp.asarray(np.random.RandomState(0).randint(0, 30522, (2, 7)))
    mask = jnp.ones((2, 7), jnp.int32).at[:, -2:].set(0)
    out = enc(ids, mask)
    assert out.shape == (2, 7, 32)
    # changing a masked token's id must not affect unmasked outputs
    ids2 = ids.at[:, -1].set(1)
    out2 = enc(ids2, mask)
    np.testing.assert_allclose(np.asarray(out)[:, :5], np.asarray(out2)[:, :5],
                               rtol=1e-5, atol=1e-6)


def test_build_module_from_config_dicts():
    cfg = {
        "name": "UnifiedSpatialCrossEncoderV2",
        "args": {"hidden_size": 32, "num_attention_heads": 4, "num_layers": 2,
                 "dim_feedforward": 64, "dim_loc": 6},
    }
    enc = build_module("grounding", cfg, rngs=rngs())
    enc.eval()
    B, L, O = 2, 5, 4
    txt = jnp.ones((B, L, 32))
    obj = jnp.ones((B, O, 32))
    locs = jnp.ones((B, O, 6))
    tmask = jnp.ones((B, L), bool)
    omask = jnp.ones((B, O), bool)
    t, o = enc(txt, tmask, obj, locs, omask)
    assert t.shape == (B, L, 32) and o.shape == (B, O, 32)

    head = build_module(
        "heads",
        {"name": "GroundHeadV1",
         "args": {"input_size": 32, "hidden_size": 32, "sem_cls_size": 10}},
        rngs=rngs(),
    )
    head.eval()
    txt_cls, obj_cls, obj_cls_pre, og3d = head(t, o, o, omask)
    assert og3d.shape == (B, O) and txt_cls.shape == (B, 10)

    qa = build_module(
        "heads",
        {"name": "QAHeadV1",
         "args": {"hidden_size": 32, "mlp_size": 16, "flat_out_size": 24,
                  "num_answers": 11}},
        rngs=rngs(),
    )
    qa.eval()
    assert qa(o, omask, t, tmask).shape == (B, 11)

    pre = build_module(
        "heads",
        {"name": "OVPretrainHead",
         "args": {"hidden_size": 32, "vocab_size": 100, "obj_vocab_size": 17}},
        rngs=rngs(),
    )
    pre.eval()
    lm, obj_lm = pre(t, o)
    assert lm.shape == (B, L, 100) and obj_lm.shape == (B, O, 17)


def test_spatial_encoder_layer_runs():
    layer = TransformerSpatialEncoderLayer(
        24, 4, dim_feedforward=48, dropout=0.0, activation="gelu",
        spatial_dim=5, spatial_attn_fusion="cond", rngs=rngs(),
    )
    layer.eval()
    x = jnp.ones((2, 6, 24))
    pl = jnp.ones((2, 6, 6, 5))
    pad = jnp.zeros((2, 6), bool)
    out, _ = layer(x, pl, tgt_key_padding_mask=pad)
    assert out.shape == (2, 6, 24)


def test_bert_cls_only_matches_full_forward_and_grads(monkeypatch):
    """cls_only=True (final layer computes only the [CLS] query row —
    model/openvocab.py scene-caption tower) must equal the full forward's
    ``[:, :1]``, in outputs AND in parameter gradients of a loss that reads
    only position 0 (the only way the caption tower is consumed). Fused MHA
    off: its custom VJP has different float noise than the einsum path the
    cls_only row takes, which would dominate the comparison."""
    monkeypatch.setenv("SCENEVERSE_FUSED_MHA", "off")
    enc = BERTLanguageEncoder(hidden_size=48, num_hidden_layers=3,
                              num_attention_heads=4, rngs=nnx.Rngs(11))
    enc.eval()
    r = np.random.RandomState(5)
    ids = jnp.asarray(r.randint(0, 1000, (3, 17)))
    masks = jnp.asarray((np.arange(17)[None] < np.array([17, 9, 4])[:, None])
                        .astype(np.int32))

    full = enc(ids, masks)
    cls = enc(ids, masks, cls_only=True)
    assert cls.shape == (3, 1, 48)
    np.testing.assert_allclose(np.asarray(cls), np.asarray(full[:, :1]),
                               rtol=1e-6, atol=1e-6)

    def loss(model, cls_only):
        out = model(ids, masks, cls_only=cls_only)
        return jnp.sum(out[:, 0] ** 2)

    g_full = nnx.grad(lambda m: loss(m, False))(enc)
    g_cls = nnx.grad(lambda m: loss(m, True))(enc)
    lf = jax.tree_util.tree_leaves(nnx.to_pure_dict(g_full))
    lc = jax.tree_util.tree_leaves(nnx.to_pure_dict(g_cls))
    assert len(lf) == len(lc)
    # Noise floor is set by the WHOLE gradient's scale (O(40) here), not
    # each leaf's: leaves whose true grad nearly cancels (LN-absorbed
    # biases ~1e-6, embedding grads ~2e-5 assembled from O(1) terms) are
    # pure f32 reduction-order residue — the differently-shaped final-layer
    # matmuls round differently — and their diffs rival their own values.
    gmax = max(float(np.abs(np.asarray(x)).max()) for x in lf)
    for a, b in zip(lf, lc):
        a, b = np.asarray(a), np.asarray(b)
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4 * gmax)
