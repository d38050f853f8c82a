"""Neural module library. Importing this package populates the four module
registries (vision/language/grounding/heads), mirroring the reference's
import-time registration."""

from sceneverse_tpu.modules.build import (  # noqa: F401
    GROUNDING_REGISTRY,
    HEADS_REGISTRY,
    LANGUAGE_REGISTRY,
    VISION_REGISTRY,
    build_module,
    build_module_by_name,
)
from sceneverse_tpu.modules.language import bert as _bert  # noqa: F401
from sceneverse_tpu.modules.language import clip as _clip  # noqa: F401
from sceneverse_tpu.modules.vision import obj_cls_encoder as _obj_cls  # noqa: F401
from sceneverse_tpu.modules.vision import pcd_openvocab_encoder as _pcd  # noqa: F401
from sceneverse_tpu.modules.grounding import unified_encoder as _unified  # noqa: F401
from sceneverse_tpu.modules.heads import grounding_head as _ghead  # noqa: F401
from sceneverse_tpu.modules.heads import pretrain_head as _phead  # noqa: F401
from sceneverse_tpu.modules.heads import qa_head as _qhead  # noqa: F401
