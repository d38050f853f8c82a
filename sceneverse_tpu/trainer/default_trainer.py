"""Epoch-loop trainer (reference trainer/default_trainer.py:10-104)."""

from __future__ import annotations

from tqdm import tqdm

from sceneverse_tpu.trainer.build import TRAINER_REGISTRY, BaseTrainer


@TRAINER_REGISTRY.register()
class DefaultTrainer(BaseTrainer):
    def __init__(self, cfg):
        super().__init__(cfg)
        self.best_metric = -1

    def _train_evaluator(self):
        return self.evaluator

    def _val_evaluator(self):
        return self.evaluator

    def train_step(self, epoch):
        self.model.train()
        loader = self.data_loaders["train"]
        n = len(loader)
        pbar = tqdm(range(n), desc=f"[Epoch {epoch + 1}/{self.epochs}]",
                    disable=self.hard_debug)
        evaluator = self._train_evaluator()
        for i, data_dict in enumerate(loader):
            # mixup-style schedules read cur_step/total_steps
            # (reference default_trainer.py:32-33)
            data_dict["cur_step"] = epoch * n + i
            data_dict["total_steps"] = self.total_steps
            out, losses = self.train_forward_backward(data_dict)
            metrics = evaluator.batch_metrics({**data_dict, **jax_to_host(out)})
            self.global_step += 1
            log_dict = {"step": self.global_step}
            log_dict.update(losses)
            log_dict.update(metrics)
            self.log(log_dict, mode="train")
            pbar.update(1)
        pbar.close()

    def eval_step(self, epoch):
        self.model.eval()
        evaluator = self._val_evaluator()
        for data_dict in self.data_loaders["val"]:
            out = self.forward(data_dict)
            evaluator.update({**data_dict, **jax_to_host(out)})
        is_best, results = evaluator.record()
        if is_best:
            self.best_metric = results["target_metric"]
        self.log(results, mode="val")
        evaluator.reset()
        return is_best

    def test_step(self):
        self.model.eval()
        evaluator = self._val_evaluator()
        for data_dict in self.data_loaders["test"]:
            out = self.forward(data_dict)
            evaluator.update({**data_dict, **jax_to_host(out)})
        is_best, results = evaluator.record()
        self.log(results, mode="test")
        evaluator.reset()
        return results

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
                self.save("latest.pth")
                if is_best:
                    self.save("best.pth")
                if self.epochs_per_save and (epoch + 1) % self.epochs_per_save == 0:
                    self.save(f"ckpt_{epoch + 1}.pth")
        results = self.test_step()
        if self.mode == "train":
            self.logger.finish()
        return results


def jax_to_host(out: dict) -> dict:
    """Model outputs stay as device arrays (evaluator math is jnp); this hook
    exists so subclasses can force host transfer when needed."""
    return out
