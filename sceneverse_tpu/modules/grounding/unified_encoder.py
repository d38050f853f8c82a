"""Cross-modal fusion encoders (reference modules/grounding/unified_encoder.py).

Three registered variants:
  * ``EntitySpatialCrossEncoder`` (:12-57) — object-side spatial decoder
    attending to text,
  * ``UnifiedSpatialCrossEncoderV1`` (:60-118) — parallel pc/lang decoder
    streams,
  * ``UnifiedSpatialCrossEncoderV2`` (:121-177) — the one every final config
    uses: concat text+obj tokens with token-type + loc embeddings, shared
    self-attention layers, split back. (The reference hardcodes ``.cuda()`` at
    :157,162; here device placement is XLA's job.)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import nnx

from sceneverse_tpu.modules.build import GROUNDING_REGISTRY
from sceneverse_tpu.modules.layers.transformers import (
    TransformerDecoderLayer,
    TransformerEncoderLayer,
    TransformerSpatialDecoderLayer,
)
from sceneverse_tpu.modules.utils import calc_pairwise_locs
from sceneverse_tpu.modules.vision.pcd_openvocab_encoder import LocLayer
from sceneverse_tpu.modules.weights import bert_embed_init

Array = jax.Array


@GROUNDING_REGISTRY.register()
class EntitySpatialCrossEncoder(nnx.Module):
    def __init__(self, cfg=None, hidden_size=768, num_attention_heads=12,
                 spatial_dim=5, num_layers=4, dim_loc=6,
                 pairwise_rel_type="center", *, rngs: nnx.Rngs):
        self.layers = nnx.List([
            TransformerSpatialDecoderLayer(
                hidden_size, num_attention_heads, dim_feedforward=2048,
                dropout=0.1, activation="gelu", spatial_dim=spatial_dim,
                spatial_multihead=True, spatial_attn_fusion="cond", rngs=rngs,
            )
            for _ in range(num_layers)
        ])
        self.loc_layers = nnx.List([LocLayer(dim_loc, hidden_size, rngs=rngs)])
        self.pairwise_rel_type = pairwise_rel_type
        self.spatial_dim = spatial_dim

    def __call__(self, txt_embeds, txt_masks, obj_embeds, obj_locs, obj_masks,
                 **kwargs):
        pairwise_locs = calc_pairwise_locs(
            obj_locs[:, :, :3], obj_locs[:, :, 3:],
            pairwise_rel_type=self.pairwise_rel_type,
        )
        out_embeds = obj_embeds
        obj_pad = ~obj_masks.astype(bool)
        txt_pad = ~txt_masks.astype(bool)
        for layer in self.layers:
            query_pos = self.loc_layers[0](obj_locs)
            out_embeds = out_embeds + query_pos
            out_embeds, _, _ = layer(
                out_embeds, txt_embeds, pairwise_locs,
                tgt_key_padding_mask=obj_pad,
                memory_key_padding_mask=txt_pad,
            )
        return txt_embeds, out_embeds


@GROUNDING_REGISTRY.register()
class UnifiedSpatialCrossEncoderV1(nnx.Module):
    def __init__(self, cfg=None, hidden_size=768, num_attention_heads=12,
                 spatial_dim=5, num_layers=4, dim_loc=6,
                 pairwise_rel_type="center", *, rngs: nnx.Rngs):
        self.pc_encoder = nnx.List([
            TransformerSpatialDecoderLayer(
                hidden_size, num_attention_heads, dim_feedforward=2048,
                dropout=0.1, activation="gelu", spatial_dim=spatial_dim,
                spatial_multihead=True, spatial_attn_fusion="cond", rngs=rngs,
            )
            for _ in range(num_layers)
        ])
        self.lang_encoder = nnx.List([
            TransformerDecoderLayer(hidden_size, num_attention_heads, rngs=rngs)
            for _ in range(num_layers)
        ])
        self.loc_layers = nnx.List([LocLayer(dim_loc, hidden_size, rngs=rngs)])
        self.pairwise_rel_type = pairwise_rel_type
        self.spatial_dim = spatial_dim

    def __call__(self, txt_embeds, txt_masks, obj_embeds, obj_locs, obj_masks,
                 **kwargs):
        pairwise_locs = calc_pairwise_locs(
            obj_locs[:, :, :3], obj_locs[:, :, 3:],
            pairwise_rel_type=self.pairwise_rel_type,
        )
        obj_pad = ~obj_masks.astype(bool)
        txt_pad = ~txt_masks.astype(bool)
        for pc_layer, lang_layer in zip(self.pc_encoder, self.lang_encoder):
            query_pos = self.loc_layers[0](obj_locs)
            obj_embeds = obj_embeds + query_pos
            obj_embeds_out, _, _ = pc_layer(
                obj_embeds, txt_embeds, pairwise_locs,
                tgt_key_padding_mask=obj_pad,
                memory_key_padding_mask=txt_pad,
            )
            txt_embeds_out, _, _ = lang_layer(
                txt_embeds, obj_embeds,
                tgt_key_padding_mask=txt_pad,
                memory_key_padding_mask=obj_pad,
            )
            obj_embeds = obj_embeds_out
            txt_embeds = txt_embeds_out
        return txt_embeds, obj_embeds


@GROUNDING_REGISTRY.register()
class UnifiedSpatialCrossEncoderV2(nnx.Module):
    """The GPS fusion encoder (reference :121-177)."""

    def __init__(self, cfg=None, hidden_size=768, dim_feedforward=2048,
                 num_attention_heads=12, num_layers=4, dim_loc=6,
                 *, rngs: nnx.Rngs):
        self.unified_encoder = nnx.List([
            TransformerEncoderLayer(
                hidden_size, num_attention_heads,
                dim_feedforward=dim_feedforward, rngs=rngs,
            )
            for _ in range(num_layers)
        ])
        self.loc_layers = nnx.List([LocLayer(dim_loc, hidden_size, rngs=rngs)])
        self.token_type_embeddings = nnx.Embed(
            2, hidden_size, embedding_init=bert_embed_init, rngs=rngs
        )

    def __call__(self, txt_embeds, txt_masks, obj_embeds, obj_locs, obj_masks,
                 **kwargs):
        txt_len = txt_embeds.shape[1]

        joint_pad = ~jnp.concatenate(
            [txt_masks.astype(bool), obj_masks.astype(bool)], axis=1
        )
        type_ids = jnp.concatenate(
            [
                jnp.zeros(txt_embeds.shape[:2], jnp.int32),
                jnp.ones(obj_embeds.shape[:2], jnp.int32),
            ],
            axis=1,
        )
        type_embeds = self.token_type_embeddings(type_ids)

        for unified_layer in self.unified_encoder:
            # reference re-adds loc + token-type embeddings before EVERY layer
            query_pos = self.loc_layers[0](obj_locs)
            obj_embeds = obj_embeds + query_pos
            joint = jnp.concatenate([txt_embeds, obj_embeds], axis=1) + type_embeds
            joint, _ = unified_layer(joint, tgt_key_padding_mask=joint_pad)
            txt_embeds = joint[:, :txt_len]
            obj_embeds = joint[:, txt_len:]
        return txt_embeds, obj_embeds
