"""Trainers. Importing populates TRAINER_REGISTRY."""

from sceneverse_tpu.trainer.build import (  # noqa: F401
    TRAINER_REGISTRY,
    BaseTrainer,
    Tracker,
    build_trainer,
)
from sceneverse_tpu.trainer import default_trainer as _d  # noqa: F401
from sceneverse_tpu.trainer import openvocab_trainer as _o  # noqa: F401
from sceneverse_tpu.trainer import objpretrain_trainer as _p  # noqa: F401
from sceneverse_tpu.trainer import debug_trainer as _g  # noqa: F401
