"""Full-GPS-tree checkpoint conversion coverage (VERDICT round-1 item 3).

Assembles a torch module tree carrying EVERY parameter name of the reference
``OpenVocab`` GPS model (reference model/openvocab.py:16-21 module tree:
``lang_encoder`` HF BertModel wrapper modules/language/bert.py:7-26,
``point_encoder`` modules/vision/pcd_openvocab_encoder.py:26-96,
``unified_encoder`` modules/grounding/unified_encoder.py:121-146, and the
heads modules/heads/{pretrain,grounding,qa}_head.py) and asserts the
converter loads the whole tree into our NNX ``OpenVocab`` with zero missing
and zero unexpected names (beyond the unused HF pooler, which the reference
also never reads — openvocab.py:34 uses last_hidden_state only).

Also proves forward parity of a torch-built spatial-attention layer in 'cond'
fusion mode (reference modules/layers/transformers.py:157-239) against our
``MultiHeadAttentionSpatial`` after conversion.
"""

import math

import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as tnn
from flax import nnx

import sceneverse_tpu.model  # noqa: F401
from sceneverse_tpu.ckpt.convert import apply_to_model, convert_torch_state_dict
from sceneverse_tpu.config import Config
from sceneverse_tpu.model import build_model

HID, HEADS, FF, LAYERS = 32, 4, 64, 2
SPATIAL_DIM, DIM_LOC = 5, 6
VOCAB, OBJ_VOCAB, N_ANSWERS = 30522, 607, 50


# ---------------------------------------------------------------- torch tree
# Shapes/names per the reference; implementations are only carriers for the
# state_dict (no forward needed except the spatial attention parity below).

class _BNWrap(tnn.Module):
    """pytorch_utils-style BatchNorm wrapper: outer 'bn' holds inner '.bn'
    (reference modules/third_party/pointnet2/pytorch_utils.py)."""

    def __init__(self, c):
        super().__init__()
        self.bn = tnn.BatchNorm2d(c)


class _SharedMLPLayer(tnn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.conv = tnn.Conv2d(cin, cout, kernel_size=1, bias=False)
        self.bn = _BNWrap(cout)


class _SAModule(tnn.Module):
    """PointnetSAModule: 'mlps' ModuleList with named 'layer{k}' children
    (reference pointnet2_modules.py:78 + pytorch_utils SharedMLP)."""

    def __init__(self, spec, use_xyz=True):
        super().__init__()
        scale = tnn.Module()
        cin = spec[0] + (3 if use_xyz else 0)
        for k, cout in enumerate(spec[1:]):
            setattr(scale, f"layer{k}", _SharedMLPLayer(cin, cout))
            cin = cout
        self.mlps = tnn.ModuleList([scale])


class TorchPointNetPP(tnn.Module):
    """reference modules/layers/pointnet.py:22-63 (encoder ModuleList + fc)."""

    def __init__(self, sa_mlps, hid):
        super().__init__()
        self.encoder = tnn.ModuleList([_SAModule(spec) for spec in sa_mlps])
        self.fc = tnn.Linear(hid, hid)


class TorchMHASpatialCond(tnn.Module):
    """'cond'-fusion spatial attention, reference transformers.py:157-239."""

    def __init__(self, d, h, spatial_dim=SPATIAL_DIM):
        super().__init__()
        self.h, self.spatial_dim = h, spatial_dim
        self.w_qs = tnn.Linear(d, d)
        self.w_ks = tnn.Linear(d, d)
        self.w_vs = tnn.Linear(d, d)
        self.fc = tnn.Linear(d, d)
        self.lang_cond_fc = tnn.Linear(d, h * (spatial_dim + 1))

    def forward(self, x, pairwise_locs, key_padding_mask=None):
        B, L, D = x.shape
        h, dh = self.h, D // self.h
        q = self.w_qs(x).view(B, L, h, dh).permute(0, 2, 1, 3)
        k = self.w_ks(x).view(B, L, h, dh).permute(0, 2, 1, 3)
        v = self.w_vs(x).view(B, L, h, dh).permute(0, 2, 1, 3)
        attn = q @ k.transpose(-1, -2) / math.sqrt(dh)

        sw = self.lang_cond_fc(x).view(B, L, h, self.spatial_dim + 1)
        sw = sw.permute(0, 2, 1, 3)  # (B,h,L,sd+1)
        loc = torch.einsum("bhld,bltd->bhlt", sw[..., 1:], pairwise_locs)
        loc = torch.sigmoid(loc + sw[..., :1])
        if key_padding_mask is not None:
            m = key_padding_mask[:, None, None, :]
            attn = attn.masked_fill(m, -float("inf"))
            loc = loc.masked_fill(m, 0.0)
        fused = torch.softmax(torch.log(torch.clamp(loc, min=1e-6)) + attn, 3)
        out = (fused @ v).permute(0, 2, 1, 3).reshape(B, L, D)
        return self.fc(out), fused


class TorchSpatialEncLayer(tnn.Module):
    """Post-norm spatial encoder layer, reference transformers.py:286-316."""

    def __init__(self, d, h, ff):
        super().__init__()
        self.self_attn = TorchMHASpatialCond(d, h)
        self.linear1 = tnn.Linear(d, ff)
        self.linear2 = tnn.Linear(ff, d)
        self.norm1 = tnn.LayerNorm(d)
        self.norm2 = tnn.LayerNorm(d)

    def forward(self, x, pairwise_locs, key_padding_mask=None):
        h, attn = self.self_attn(x, pairwise_locs, key_padding_mask)
        x = self.norm1(x + h)
        h2 = self.linear2(torch.nn.functional.gelu(self.linear1(x)))
        return self.norm2(x + h2), attn


class TorchPointEncoder(tnn.Module):
    """reference modules/vision/pcd_openvocab_encoder.py:26-96."""

    def __init__(self):
        super().__init__()
        self.point_feature_extractor = TorchPointNetPP(
            [[3, 64, 64, 128], [128, 128, 128, 256], [256, 256, 512, HID]], HID
        )
        self.register_buffer("text_features", torch.randn(OBJ_VOCAB, HID))
        self.sem_cls_embed_layer = tnn.Sequential(
            tnn.Linear(HID, HID), tnn.LayerNorm(HID), tnn.Dropout(0.1)
        )
        self.sem_mask_embeddings = tnn.Embedding(1, 768)  # hardcoded 768 in ref
        self.spatial_encoder = tnn.ModuleList(
            [TorchSpatialEncLayer(HID, HEADS, FF) for _ in range(LAYERS)]
        )
        self.loc_layers = tnn.ModuleList(
            [tnn.Sequential(tnn.Linear(DIM_LOC, HID), tnn.LayerNorm(HID))]
        )


class TorchEncLayer(tnn.Module):
    """Plain post-norm encoder layer, reference transformers.py:115-154."""

    def __init__(self, d, h, ff):
        super().__init__()
        self.self_attn = tnn.MultiheadAttention(d, h, batch_first=True)
        self.linear1 = tnn.Linear(d, ff)
        self.linear2 = tnn.Linear(ff, d)
        self.norm1 = tnn.LayerNorm(d)
        self.norm2 = tnn.LayerNorm(d)


class TorchUnifiedEncoder(tnn.Module):
    """reference modules/grounding/unified_encoder.py:121-146."""

    def __init__(self):
        super().__init__()
        self.unified_encoder = tnn.ModuleList(
            [TorchEncLayer(HID, HEADS, FF) for _ in range(LAYERS)]
        )
        self.loc_layers = tnn.ModuleList(
            [tnn.Sequential(tnn.Linear(DIM_LOC, HID), tnn.LayerNorm(HID))]
        )
        self.token_type_embeddings = tnn.Embedding(2, HID)


class TorchLMPredHead(tnn.Module):
    """BertLMPredictionHead, reference modules/heads/pretrain_head.py:23-32."""

    def __init__(self, vocab):
        super().__init__()
        transform = tnn.Module()
        transform.dense = tnn.Linear(HID, HID)
        transform.LayerNorm = tnn.LayerNorm(HID)
        self.transform = transform
        self.decoder = tnn.Linear(HID, vocab, bias=False)
        self.bias = tnn.Parameter(torch.zeros(vocab))


class TorchOVPretrainHead(tnn.Module):
    def __init__(self):
        super().__init__()
        self.lm_pred_head = TorchLMPredHead(VOCAB)
        self.obj_pred_head = TorchLMPredHead(OBJ_VOCAB)


def _mlp_head(dout):
    """get_mlp_head Sequential, reference modules/utils.py:18-25."""
    return tnn.Sequential(
        tnn.Linear(HID, HID), tnn.ReLU(), tnn.LayerNorm(HID, eps=1e-12),
        tnn.Dropout(0.3), tnn.Linear(HID, dout),
    )


class TorchGroundHeadV1(tnn.Module):
    """reference modules/heads/grounding_head.py:7-28."""

    def __init__(self):
        super().__init__()
        self.og3d_head = _mlp_head(1)
        self.txt_clf_head = _mlp_head(OBJ_VOCAB)
        self.obj3d_clf_head = _mlp_head(OBJ_VOCAB)
        self.obj3d_clf_pre_head = _mlp_head(OBJ_VOCAB)


class TorchAttFlat(tnn.Module):
    """MCAN AttFlat, reference modules/heads/qa_head.py:40-54."""

    def __init__(self, mlp_size, flat_out):
        super().__init__()
        mlp = tnn.Module()
        fc = tnn.Module()
        fc.linear = tnn.Linear(HID, mlp_size)
        mlp.fc = fc
        mlp.linear = tnn.Linear(mlp_size, 1)
        self.mlp = mlp
        self.linear_merge = tnn.Linear(HID, flat_out)


class TorchQAHeadV1(tnn.Module):
    """reference modules/heads/qa_head.py:72-85."""

    def __init__(self, mlp_size=16, flat_out=24):
        super().__init__()
        self.attflat_visual = TorchAttFlat(mlp_size, flat_out)
        self.attflat_lang = TorchAttFlat(mlp_size, flat_out)
        self.answer_cls = tnn.Sequential(
            tnn.Linear(flat_out, HID), tnn.GELU(), tnn.Dropout(0.3),
            tnn.Linear(HID, N_ANSWERS),
        )
        self.fusion_norm = tnn.LayerNorm(flat_out)


class TorchGPS(tnn.Module):
    """Full reference module tree, model/openvocab.py:16-21."""

    def __init__(self):
        super().__init__()
        from transformers import BertConfig as HFBertConfig
        from transformers import BertModel as HFBertModel

        lang = tnn.Module()
        # reference bert.py:15-23: only these four config fields are set
        lang.model = HFBertModel(HFBertConfig(
            hidden_size=HID, num_hidden_layers=LAYERS,
            num_attention_heads=HEADS, type_vocab_size=2,
            intermediate_size=3072,
        ))
        self.lang_encoder = lang
        self.point_encoder = TorchPointEncoder()
        self.unified_encoder = TorchUnifiedEncoder()
        self.pretrain_head = TorchOVPretrainHead()
        self.ground_head = TorchGroundHeadV1()
        self.qa_head = TorchQAHeadV1()


# ------------------------------------------------------------------ our tree

def _our_cfg():
    return Config({
        "num_gpu": 1,
        "task": "Pretrain",
        "data": {"args": {"use_scene_cap": True}},
        "model": {
            "name": "OpenVocab",
            "inter": "before",
            "language": {"name": "BERTLanguageEncoder",
                         "args": {"hidden_size": HID, "num_hidden_layers": LAYERS,
                                  "num_attention_heads": HEADS}},
            "vision": {"name": "PointOpenVocabEncoder",
                       "args": {"hidden_size": HID, "freeze": True,
                                "num_attention_heads": HEADS,
                                "num_layers": LAYERS, "dim_feedforward": FF,
                                "spatial_dim": SPATIAL_DIM, "dim_loc": DIM_LOC,
                                "attn_type": "spatial",
                                "pairwise_rel_type": "center"}},
            "grounding": {"name": "UnifiedSpatialCrossEncoderV2",
                          "args": {"hidden_size": HID,
                                   "num_attention_heads": HEADS,
                                   "num_layers": LAYERS,
                                   "dim_feedforward": FF,
                                   "dim_loc": DIM_LOC}},
            "heads": {
                "head_list": ["pretrain_head", "ground_head", "qa_head"],
                "pretrain_head": {"name": "OVPretrainHead",
                                  "args": {"hidden_size": HID,
                                           "vocab_size": VOCAB}},
                "ground_head": {"name": "GroundHeadV1",
                                "args": {"input_size": HID, "hidden_size": HID,
                                         "sem_cls_size": OBJ_VOCAB,
                                         "dropout": 0.3}},
                "qa_head": {"name": "QAHeadV1",
                            "args": {"hidden_size": HID, "mlp_size": 16,
                                     "glimpse": 1, "flat_out_size": 24,
                                     "num_answers": N_ANSWERS}},
            },
            "loss_list": [],
            "vis_loss_list": [],
        },
    })


def test_full_gps_tree_converts_with_zero_missing():
    torch.manual_seed(0)
    torch_gps = TorchGPS()
    ours = build_model(_our_cfg(), rngs=nnx.Rngs(0))

    converted = convert_torch_state_dict(torch_gps.state_dict())
    loaded, missing, unexpected = apply_to_model(ours, converted)

    # the HF pooler is the only tolerated leftover: the reference builds it
    # but only ever reads last_hidden_state (reference bert.py:25-26)
    assert all("pooler" in u for u in unexpected), unexpected
    assert not missing, missing
    assert loaded == len(converted) - len(unexpected)
    # sanity: the big named tensors landed where expected
    state = nnx.state(ours)
    assert np.allclose(
        np.asarray(state["point_encoder"]["text_features"][...]),
        torch_gps.point_encoder.text_features.numpy(),
    )
    got_dec = np.asarray(
        state["pretrain_head"]["lm_pred_head"]["decoder"]["kernel"][...]
    )
    assert got_dec.shape == (HID, VOCAB)
    assert np.allclose(
        got_dec, torch_gps.pretrain_head.lm_pred_head.decoder.weight.detach().numpy().T
    )


def test_spatial_attention_cond_forward_parity():
    """Converted torch 'cond' spatial attention == ours, with padding mask
    (reference transformers.py:188-239 fusion math)."""
    from sceneverse_tpu.modules.layers.transformers import (
        MultiHeadAttentionSpatial,
    )

    torch.manual_seed(3)
    t = TorchMHASpatialCond(HID, HEADS)
    t.eval()
    ours = MultiHeadAttentionSpatial(
        HID, HEADS, dropout=0.0, spatial_multihead=True,
        spatial_dim=SPATIAL_DIM, spatial_attn_fusion="cond", rngs=nnx.Rngs(0),
    )
    ours.eval()
    loaded, missing, unexpected = apply_to_model(
        ours, convert_torch_state_dict(t.state_dict())
    )
    assert not missing and not unexpected

    rng = np.random.RandomState(7)
    B, L = 2, 9
    x = rng.randn(B, L, HID).astype(np.float32)
    locs = rng.randn(B, L, L, SPATIAL_DIM).astype(np.float32)
    pad = np.zeros((B, L), bool)
    pad[:, -2:] = True
    with torch.no_grad():
        want, want_attn = t(torch.tensor(x), torch.tensor(locs),
                            torch.tensor(pad))
    got, got_attn = ours(jnp.asarray(x), jnp.asarray(x), jnp.asarray(x),
                         jnp.asarray(locs), key_padding_mask=jnp.asarray(pad))
    np.testing.assert_allclose(np.asarray(got), want.numpy(),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(got_attn), want_attn.numpy(),
                               rtol=2e-4, atol=2e-5)


def test_spatial_encoder_layer_forward_parity():
    """Full post-norm spatial encoder layer parity
    (reference transformers.py:286-316)."""
    from sceneverse_tpu.modules.layers.transformers import (
        TransformerSpatialEncoderLayer,
    )

    torch.manual_seed(4)
    t = TorchSpatialEncLayer(HID, HEADS, FF)
    t.eval()
    ours = TransformerSpatialEncoderLayer(
        HID, HEADS, dim_feedforward=FF, dropout=0.0, activation="gelu",
        spatial_dim=SPATIAL_DIM, spatial_multihead=True,
        spatial_attn_fusion="cond", rngs=nnx.Rngs(0),
    )
    ours.eval()
    loaded, missing, unexpected = apply_to_model(
        ours, convert_torch_state_dict(t.state_dict())
    )
    assert not missing and not unexpected

    rng = np.random.RandomState(8)
    B, L = 2, 7
    x = rng.randn(B, L, HID).astype(np.float32)
    locs = rng.randn(B, L, L, SPATIAL_DIM).astype(np.float32)
    pad = np.zeros((B, L), bool)
    pad[1, -3:] = True
    with torch.no_grad():
        want, _ = t(torch.tensor(x), torch.tensor(locs), torch.tensor(pad))
    got, _ = ours(jnp.asarray(x), jnp.asarray(locs),
                  tgt_key_padding_mask=jnp.asarray(pad))
    np.testing.assert_allclose(np.asarray(got), want.numpy(),
                               rtol=2e-4, atol=2e-5)
