"""CLIP text encoder (reference modules/language/clip.py:11-28).

Registered for API parity but — like the reference, which none of the 37
final configs use — it is an optional path. With no network access the HF
CLIP weights cannot be fetched, so this module is a BERT-shaped text tower
with a projection + L2-norm matching the reference's output contract;
converted checkpoints can load real CLIP weights on top.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import nnx

from sceneverse_tpu.modules.build import LANGUAGE_REGISTRY
from sceneverse_tpu.modules.language.bert import BertConfig, BertModel
from sceneverse_tpu.modules.utils import MlpHead


@LANGUAGE_REGISTRY.register()
class CLIPLanguageEncoder(nnx.Module):
    def __init__(self, cfg=None, weights="openai/clip-vit-large-patch14",
                 output_dim=768, freeze_backbone=True, use_projection=False,
                 dropout=0.1, *, rngs: nnx.Rngs):
        self.freeze_backbone = freeze_backbone
        self.model = BertModel(BertConfig(hidden_size=output_dim), rngs=rngs)
        self.text_projection = nnx.Linear(output_dim, output_dim, use_bias=False, rngs=rngs)
        self.use_projection = use_projection
        if use_projection:
            self.projection = MlpHead(output_dim, output_dim, output_dim, dropout=dropout, rngs=rngs)

    def __call__(self, txt_ids, txt_masks):
        import jax

        txt = self.model(txt_ids, txt_masks)
        txt = self.text_projection(txt)
        txt = txt / jnp.linalg.norm(txt, axis=2, keepdims=True).clip(1e-12)
        if self.freeze_backbone:
            txt = jax.lax.stop_gradient(txt)
        if self.use_projection:
            txt = self.projection(txt)
        return txt
