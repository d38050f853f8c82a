"""Object-classification pretraining trainer
(reference trainer/objpretrain_trainer.py:9-110): the DefaultTrainer loop
without the cur_step/total_steps injection (the reference's loop body omits
it). Inherits the steps-per-dispatch scan path unchanged."""

from __future__ import annotations

from sceneverse_tpu.trainer.build import TRAINER_REGISTRY
from sceneverse_tpu.trainer.default_trainer import DefaultTrainer


@TRAINER_REGISTRY.register()
class ObjPretrainTrainer(DefaultTrainer):
    def _annotate_batch(self, data_dict, cur_step):
        return data_dict
