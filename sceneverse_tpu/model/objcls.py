"""Standalone object classifier — PointNet++ encoder pretraining
(reference model/objcls.py:16-97).

Closed-vocab mode: MLP classification head; open-vocab mode: dot product with
a frozen 607-class text-embedding table. BatchNorm sync across the data mesh
replaces SyncBatchNorm (reference :33-34) via the ``axis_name`` plumbed into
PointNetPP.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from sceneverse_tpu.model.build import MODEL_REGISTRY, BaseModel
from sceneverse_tpu.modules.layers.pointnet import PointNetPP
from sceneverse_tpu.modules.utils import MlpHead
from sceneverse_tpu.modules.vision.pcd_openvocab_encoder import _load_text_features


@MODEL_REGISTRY.register()
class ObjCls(BaseModel):
    def __init__(self, cfg, *, rngs: nnx.Rngs, axis_name=None):
        super().__init__(cfg)
        self.cfg = cfg
        self.model_name = cfg.model.get("model_name", "pointnet++")
        self.language_type = cfg.model.get("language_type", "clip")
        self.open_vocab = cfg.model.get("open_vocab", False)
        cls_in_channel = 512 if self.language_type == "clip" else 768
        self.point_feature_extractor = PointNetPP(
            sa_n_points=[32, 16, None],
            sa_n_samples=[32, 32, None],
            sa_radii=[0.2, 0.4, None],
            sa_mlps=[[3, 64, 64, 128], [128, 128, 128, 256],
                     [256, 256, 512, cls_in_channel]],
            axis_name=axis_name,
            rngs=rngs,
        )
        if not self.open_vocab:
            cls_hidden = cfg.model.get("cls_hidden", 1024)
            self.cls_head = MlpHead(
                cls_in_channel, cls_hidden, cfg.model.num_classes, rngs=rngs
            )
        else:
            self.text_embeds = nnx.Variable(
                jnp.asarray(
                    _load_text_features(
                        cfg.model.get("pre_extract_path"),
                        self.language_type,
                        cls_in_channel,
                    )
                )
            )
        self.dropout = nnx.Dropout(0.1, rngs=rngs)

    def __call__(self, data_dict: dict) -> dict:
        out = dict(data_dict)
        obj_pcds = data_dict["obj_fts"]
        B, O = obj_pcds.shape[:2]
        flat = obj_pcds.reshape(B * O, *obj_pcds.shape[2:])
        obj_embeds = self.dropout(self.point_feature_extractor(flat))
        if self.open_vocab:
            logits = obj_embeds @ self.text_embeds[...].T
        else:
            logits = self.cls_head(obj_embeds)
        out["obj_logits"] = logits.reshape(B, O, -1)
        return out

    def get_opt_params(self):
        # reference :89-96: a single param group at solver.lr with
        # solver.weight_decay (default 0) and no no-decay split.
        return [{
            "prefix": (),
            "lr": self.cfg.solver.lr,
            "weight_decay": self.cfg.solver.get("weight_decay", 0.0),
            "no_decay_split": False,
        }]
