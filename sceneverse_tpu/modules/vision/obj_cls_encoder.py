"""Trivial MLP classification head over precomputed object features
(reference modules/vision/obj_cls_encoder.py:5-14)."""

from flax import nnx

from sceneverse_tpu.modules.build import VISION_REGISTRY
from sceneverse_tpu.modules.utils import MlpHead


@VISION_REGISTRY.register()
class ObjClsEncoder(nnx.Module):
    def __init__(self, cfg=None, input_feat_size=768, hidden_size=768,
                 tgt_cls_num=607, *, rngs: nnx.Rngs):
        self.vis_cls_head = MlpHead(
            input_feat_size, hidden_size // 2, tgt_cls_num, dropout=0.3, rngs=rngs
        )

    def __call__(self, obj_feats, **kwargs):
        return self.vis_cls_head(obj_feats)
