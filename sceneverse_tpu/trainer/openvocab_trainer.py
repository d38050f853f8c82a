"""GPS pretraining trainer (reference trainer/openvocab_trainer.py:10-113):
same loop as DefaultTrainer but the evaluator is a {"train", "val"} dict
(PretrainEval during train, ScanReferEval at val) and checkpoints save only
best + every-N (no latest)."""

from __future__ import annotations

from sceneverse_tpu.trainer.build import TRAINER_REGISTRY
from sceneverse_tpu.trainer.default_trainer import DefaultTrainer


@TRAINER_REGISTRY.register()
class OpenVocabTrainer(DefaultTrainer):
    def _train_evaluator(self):
        return self.evaluator["train"]

    def _val_evaluator(self):
        return self.evaluator["val"]

    def run(self):
        if self.mode == "train":
            start_epoch = self.exp_tracker.epoch
            self.global_step = start_epoch * len(self.data_loaders["train"])
            for epoch in range(start_epoch, self.epochs):
                self.exp_tracker.step()
                self.train_step(epoch)
                if self.epochs_per_eval and (epoch + 1) % self.epochs_per_eval == 0:
                    is_best = self.eval_step(epoch)
                    print(f"[Epoch {epoch + 1}/{self.epochs}] finished eval, is_best: {is_best}")
                else:
                    is_best = False
                # reference :104-109: best + every-N only
                if is_best:
                    self.save("best.pth")
                if self.epochs_per_save and (epoch + 1) % self.epochs_per_save == 0:
                    self.save(f"ckpt_{epoch + 1}.pth")
        results = self.test_step()
        if self.mode == "train":
            self.logger.finish()
        from sceneverse_tpu.ckpt.checkpoint import wait_for_checkpoints

        wait_for_checkpoints()  # async best/ckpt_N saves must be durable
        return results
