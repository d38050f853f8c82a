"""Task-level model assemblies. Importing populates MODEL_REGISTRY."""

from sceneverse_tpu.model.build import MODEL_REGISTRY, BaseModel, build_model  # noqa: F401
from sceneverse_tpu.model import openvocab as _openvocab  # noqa: F401
from sceneverse_tpu.model import objcls as _objcls  # noqa: F401
