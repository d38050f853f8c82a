"""Evaluators. Importing populates EVALUATOR_REGISTRY."""

from sceneverse_tpu.evaluator.build import (  # noqa: F401
    EVALUATOR_REGISTRY,
    BaseEvaluator,
    build_eval,
    get_eval,
)
from sceneverse_tpu.evaluator import scanrefer_eval as _sr  # noqa: F401
from sceneverse_tpu.evaluator import referit3d_eval as _r3d  # noqa: F401
from sceneverse_tpu.evaluator import scanqa_eval as _sqa  # noqa: F401
from sceneverse_tpu.evaluator import sqa3d_eval as _sqa3d  # noqa: F401
from sceneverse_tpu.evaluator import pretrain_eval as _pre  # noqa: F401
from sceneverse_tpu.evaluator import objcls_eval as _obj  # noqa: F401
