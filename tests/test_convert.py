"""Checkpoint-converter parity tests: torch state_dicts (HF BERT, torch
MultiheadAttention layers) convert into the NNX modules and reproduce the
torch forward outputs numerically."""

import numpy as np
import pytest
from flax import nnx
import jax.numpy as jnp

from sceneverse_tpu.ckpt.convert import apply_to_model, convert_torch_state_dict


def test_hf_bert_roundtrip_forward_parity():
    import torch
    from transformers import BertConfig as HFBertConfig, BertModel as HFBertModel

    hf_cfg = HFBertConfig(
        vocab_size=211, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=64, type_vocab_size=2,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    torch.manual_seed(0)
    hf = HFBertModel(hf_cfg)
    hf.eval()

    from sceneverse_tpu.modules.language.bert import BertConfig, BertModel

    ours = BertModel(
        BertConfig(vocab_size=211, hidden_size=32, num_hidden_layers=2,
                   num_attention_heads=4, intermediate_size=64,
                   max_position_embeddings=64),
        rngs=nnx.Rngs(0),
    )
    ours.eval()

    sd = {k: v for k, v in hf.state_dict().items()}
    converted = convert_torch_state_dict(sd)
    loaded, missing, unexpected = apply_to_model(ours, converted)
    assert loaded > 0
    # only the (unused) pooler should fail to map
    assert all("pooler" in u for u in unexpected), unexpected
    assert not missing, missing

    rng = np.random.RandomState(0)
    ids = rng.randint(0, 211, (2, 9))
    mask = np.ones((2, 9), np.int64)
    mask[:, -3:] = 0
    with torch.no_grad():
        want = hf(torch.tensor(ids), torch.tensor(mask)).last_hidden_state.numpy()
    got = np.asarray(ours(jnp.asarray(ids), jnp.asarray(mask)))
    np.testing.assert_allclose(got[:, :6], want[:, :6], rtol=2e-4, atol=2e-5)


def test_hf_clip_text_roundtrip_forward_parity():
    """Real CLIP text architecture (causal mask, quickGELU, EOS pooling,
    text_projection) converts from the HF tree and matches forward output
    (VERDICT r2 item 4; reference modules/language/clip.py:11-28)."""
    import torch
    from transformers import (CLIPTextConfig as HFCLIPTextConfig,
                              CLIPTextModelWithProjection as HFCLIPText)

    hf_cfg = HFCLIPTextConfig(
        vocab_size=99, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=16, projection_dim=24,
        eos_token_id=98, bos_token_id=97, attn_implementation="eager",
    )
    torch.manual_seed(0)
    hf = HFCLIPText(hf_cfg)
    hf.eval()

    from sceneverse_tpu.modules.language.clip import (
        CLIPTextConfig, CLIPTextModelWithProjection)

    ours = CLIPTextModelWithProjection(
        CLIPTextConfig(vocab_size=99, hidden_size=32, num_hidden_layers=2,
                       num_attention_heads=4, intermediate_size=64,
                       max_position_embeddings=16, projection_dim=24,
                       eos_token_id=98),
        rngs=nnx.Rngs(0))
    ours.eval()

    converted = convert_torch_state_dict(dict(hf.state_dict()))
    loaded, missing, unexpected = apply_to_model(ours, converted)
    assert not missing, missing
    assert not unexpected, unexpected
    assert loaded == len(converted)

    rng = np.random.RandomState(0)
    ids = rng.randint(1, 97, (2, 10))
    ids[0, 7] = 98
    ids[1, 9] = 98
    mask = np.ones((2, 10), np.int64)
    mask[0, 8:] = 0
    with torch.no_grad():
        out = hf(torch.tensor(ids), torch.tensor(mask))
    last, embeds = ours(jnp.asarray(ids), jnp.asarray(mask))
    np.testing.assert_allclose(
        np.asarray(last), out.last_hidden_state.numpy(), rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(embeds), out.text_embeds.numpy(), rtol=2e-4, atol=2e-5)


def test_clip_language_encoder_contract():
    """Registered encoder: per-token projection + L2 norm + stop_gradient,
    matching the reference forward (reference modules/language/clip.py:22-27)."""
    from sceneverse_tpu.modules.language.clip import (
        CLIPLanguageEncoder, CLIPTextConfig)

    enc = CLIPLanguageEncoder(output_dim=24, num_hidden_layers=2, rngs=nnx.Rngs(0))
    # shrink for test speed
    small = CLIPTextConfig(vocab_size=99, hidden_size=32, num_hidden_layers=2,
                           num_attention_heads=4, intermediate_size=64,
                           max_position_embeddings=16, projection_dim=24,
                           eos_token_id=98)
    from sceneverse_tpu.modules.language.clip import CLIPTextModelWithProjection
    enc.model = CLIPTextModelWithProjection(small, rngs=nnx.Rngs(0))
    enc.eval()
    ids = np.random.RandomState(1).randint(1, 97, (2, 10))
    mask = np.ones((2, 10), np.int64)
    out = enc(jnp.asarray(ids), jnp.asarray(mask))
    assert out.shape == (2, 10, 24)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(out), axis=2), 1.0, rtol=1e-5)


def test_torch_encoder_layer_conversion():
    """A torch module tree shaped like the reference TransformerEncoderLayer
    converts and matches forward output."""
    import torch
    import torch.nn as tnn

    class TorchEnc(tnn.Module):
        def __init__(self, d=32, h=4, ff=64):
            super().__init__()
            self.self_attn = tnn.MultiheadAttention(d, h, dropout=0.0, batch_first=True)
            self.linear1 = tnn.Linear(d, ff)
            self.linear2 = tnn.Linear(ff, d)
            self.norm1 = tnn.LayerNorm(d)
            self.norm2 = tnn.LayerNorm(d)

        def forward(self, x):
            h, _ = self.self_attn(x, x, x)
            x = self.norm1(x + h)
            h2 = self.linear2(torch.relu(self.linear1(x)))
            return self.norm2(x + h2)

    torch.manual_seed(1)
    t = TorchEnc()
    t.eval()

    from sceneverse_tpu.modules.layers.transformers import TransformerEncoderLayer

    ours = TransformerEncoderLayer(32, 4, dim_feedforward=64, dropout=0.0, rngs=nnx.Rngs(0))
    ours.eval()
    converted = convert_torch_state_dict(t.state_dict())
    loaded, missing, unexpected = apply_to_model(ours, converted)
    assert loaded == len(converted), (loaded, unexpected)
    assert not missing and not unexpected

    x = np.random.RandomState(2).randn(2, 5, 32).astype(np.float32)
    with torch.no_grad():
        want = t(torch.tensor(x)).numpy()
    got, _ = ours(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-5)


def test_mlp_head_and_pointnet_name_mapping():
    """get_mlp_head Sequential + SharedMLP conv/bn names map correctly."""
    import torch
    import torch.nn as tnn

    head = tnn.Sequential(
        tnn.Linear(16, 8), tnn.ReLU(), tnn.LayerNorm(8, eps=1e-12),
        tnn.Dropout(0.0), tnn.Linear(8, 3),
    )
    sd = {f"og3d_head.{k}": v for k, v in head.state_dict().items()}
    conv = tnn.Conv2d(6, 12, kernel_size=1, bias=False)
    bn = tnn.BatchNorm2d(12)
    sd.update({
        "point_feature_extractor.encoder.0.mlps.0.layer0.conv.weight": conv.weight,
        "point_feature_extractor.encoder.0.mlps.0.layer0.bn.bn.weight": bn.weight,
        "point_feature_extractor.encoder.0.mlps.0.layer0.bn.bn.bias": bn.bias,
        "point_feature_extractor.encoder.0.mlps.0.layer0.bn.bn.running_mean": bn.running_mean,
        "point_feature_extractor.encoder.0.mlps.0.layer0.bn.bn.running_var": bn.running_var,
        "point_feature_extractor.encoder.0.mlps.0.layer0.bn.bn.num_batches_tracked": bn.num_batches_tracked,
    })
    converted = convert_torch_state_dict(sd)
    assert "og3d_head.fc1.kernel" in converted
    assert "og3d_head.norm.scale" in converted
    assert "og3d_head.fc2.bias" in converted
    assert converted["og3d_head.fc1.kernel"].shape == (16, 8)
    k = "point_feature_extractor.encoder.0.mlp.layers.0"
    assert converted[f"{k}.conv.kernel"].shape == (6, 12)
    assert f"{k}.bn.scale" in converted
    assert f"{k}.bn.mean" in converted and f"{k}.bn.var" in converted
