"""GPS vision tower: per-object PointNet++ + spatial-attention transformer.

NNX rewrite of reference modules/vision/pcd_openvocab_encoder.py:16-184:
  * PointNet++ backbone with SA specs [32,16,None]/[32,32,None]/r[.2,.4,None]
    ending at 768-d (:27-32),
  * frozen open-vocab cls head = dot product with a precomputed 607-class
    text-embedding buffer (:46-48),
  * optional full freeze (stop-gradient + frozen BN, :54-57,121-129),
  * 4-layer spatial transformer with 'cond' fusion and a shared loc layer
    re-applied before every block (:77-88,171-180),
  * returns (post_embeds, pre_embeds, softmax obj_sem_cls) (:169,142,184).

The reference also names a ``PointNextEncoder`` that does not exist in its
repo (:33-43 would NameError) — reproduced here as an explicit error.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from sceneverse_tpu.modules.build import VISION_REGISTRY
from sceneverse_tpu.modules.layers.pointnet import PointNetPP
from sceneverse_tpu.modules.layers.transformers import TransformerSpatialEncoderLayer
from sceneverse_tpu.modules.utils import calc_pairwise_locs
from sceneverse_tpu.modules.weights import bert_embed_init, bert_linear_kernel_init, zeros_init

Array = jax.Array


def _load_text_features(lang_path: Optional[str], lang_type: str,
                        hidden_size: int) -> np.ndarray:
    """Load the 607-class text embedding table
    (reference pcd_openvocab_encoder.py:46-47 loads
    ``scannet_607_{bert-base-uncased|clip-ViT-B16}_id.pth``)."""
    dim = hidden_size if lang_type == "bert" else 512
    if lang_path:
        name = f"scannet_607_{'bert-base-uncased' if lang_type == 'bert' else 'clip-ViT-B16'}_id.pth"
        for candidate in (os.path.join(lang_path, name), lang_path):
            if os.path.isfile(candidate):
                import torch

                t = torch.load(candidate, map_location="cpu")
                return np.asarray(t.float().numpy(), dtype=np.float32)
    # No table on disk: deterministic placeholder (converted ckpts overwrite).
    rng = np.random.RandomState(0)
    return rng.normal(0, 0.02, size=(607, dim)).astype(np.float32)


class LocLayer(nnx.Module):
    """Linear(dim_loc -> hidden) + LayerNorm (reference :84-87)."""

    def __init__(self, dim_loc: int, hidden_size: int, *, rngs: nnx.Rngs):
        self.linear = nnx.Linear(
            dim_loc, hidden_size, kernel_init=bert_linear_kernel_init,
            bias_init=zeros_init, rngs=rngs,
        )
        self.norm = nnx.LayerNorm(hidden_size, epsilon=1e-5, rngs=rngs)

    def __call__(self, x):
        return self.norm(self.linear(x))


@VISION_REGISTRY.register()
class PointOpenVocabEncoder(nnx.Module):
    def __init__(self, cfg=None, backbone="pointnet++", hidden_size=768,
                 path=None, freeze=False, dim_feedforward=2048,
                 num_attention_heads=12, spatial_dim=5, num_layers=4,
                 dim_loc=6, pairwise_rel_type="center", use_matmul_label=False,
                 mixup_strategy=None, mixup_stage1=None, mixup_stage2=None,
                 lang_type="bert", lang_path=None, attn_type="spatial",
                 *, rngs: nnx.Rngs):
        if backbone != "pointnet++":
            # reference :33-43 references an undefined PointNextEncoder;
            # surfaced here as an explicit error rather than a NameError.
            raise NotImplementedError(
                f"backbone {backbone!r}: the reference only ships pointnet++"
            )
        self.point_feature_extractor = PointNetPP(
            sa_n_points=[32, 16, None],
            sa_n_samples=[32, 32, None],
            sa_radii=[0.2, 0.4, None],
            sa_mlps=[[3, 64, 64, 128], [128, 128, 128, 256], [256, 256, 512, hidden_size]],
            rngs=rngs,
        )
        # Open-vocab grounding head: frozen text-embedding buffer (:46-48).
        self.text_features = nnx.Variable(
            jnp.asarray(_load_text_features(lang_path, lang_type, hidden_size))
        )
        self.dropout = nnx.Dropout(0.1, rngs=rngs)
        self.attn_type = attn_type
        self.freeze = freeze
        if freeze:
            # frozen backbone -> BN stats are fixed -> the fully-fused
            # SA+MLP+maxpool Pallas kernel applies
            self.point_feature_extractor.set_fused_frozen(True)

        # semantic cls embed layer (:60-62) — built for ckpt parity, unused in
        # the live forward path (reference forward keeps it commented out).
        self.sem_cls_embed_layer_linear = nnx.Linear(
            hidden_size, hidden_size, kernel_init=bert_linear_kernel_init,
            bias_init=zeros_init, rngs=rngs,
        )
        self.sem_cls_embed_layer_norm = nnx.LayerNorm(hidden_size, epsilon=1e-5, rngs=rngs)
        self.use_matmul_label = use_matmul_label
        self.sem_mask_embeddings = nnx.Embed(
            1, 768, embedding_init=bert_embed_init, rngs=rngs
        )

        if attn_type == "spatial":
            self.spatial_encoder = nnx.List([
                TransformerSpatialEncoderLayer(
                    hidden_size, num_attention_heads,
                    dim_feedforward=dim_feedforward, dropout=0.1,
                    activation="gelu", spatial_dim=spatial_dim,
                    spatial_multihead=True, spatial_attn_fusion="cond",
                    rngs=rngs,
                )
                for _ in range(num_layers)
            ])
            self.loc_layers = nnx.List([LocLayer(dim_loc, hidden_size, rngs=rngs)])
            self.pairwise_rel_type = pairwise_rel_type
            self.spatial_dim = spatial_dim
        self.path = path  # pretrained weights merged by the checkpoint loader

    def __call__(self, obj_pcds: Array, obj_locs: Array, obj_masks: Array,
                 obj_sem_masks: Array, obj_labels=None, cur_step=None,
                 max_steps=None, **kwargs):
        """obj_pcds: (B, O, P, 3+C); obj_locs: (B, O, 6); masks: (B, O) bool.

        Returns (obj_embeds (B,O,D), obj_embeds_pre (B,O,D), obj_sem_cls (B,O,607)).
        """
        B, O = obj_pcds.shape[:2]
        flat = obj_pcds.reshape(B * O, *obj_pcds.shape[2:])
        obj_embeds = self.point_feature_extractor(flat).reshape(B, O, -1)
        obj_embeds = self.dropout(obj_embeds)
        if self.freeze:
            obj_embeds = jax.lax.stop_gradient(obj_embeds)

        # open-vocab semantic class distribution (:142), detached
        logits = obj_embeds @ self.text_features[...].T
        obj_sem_cls = jax.lax.stop_gradient(jax.nn.softmax(logits, axis=2))

        obj_embeds_pre = obj_embeds

        if self.attn_type == "spatial":
            pairwise_locs = calc_pairwise_locs(
                obj_locs[:, :, :3], obj_locs[:, :, 3:],
                pairwise_rel_type=self.pairwise_rel_type,
                spatial_dist_norm=True, spatial_dim=self.spatial_dim,
            )
            pad = ~obj_masks.astype(bool)
            for layer in self.spatial_encoder:
                query_pos = self.loc_layers[0](obj_locs)
                obj_embeds = obj_embeds + query_pos
                obj_embeds, _ = layer(
                    obj_embeds, pairwise_locs, tgt_key_padding_mask=pad
                )
        return obj_embeds, obj_embeds_pre, obj_sem_cls
