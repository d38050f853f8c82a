"""Object-classification pretraining trainer
(reference trainer/objpretrain_trainer.py:9-110): DefaultTrainer loop without
the cur_step/total_steps injection."""

from __future__ import annotations

from tqdm import tqdm

from sceneverse_tpu.trainer.build import TRAINER_REGISTRY
from sceneverse_tpu.trainer.default_trainer import DefaultTrainer, jax_to_host


@TRAINER_REGISTRY.register()
class ObjPretrainTrainer(DefaultTrainer):
    def train_step(self, epoch):
        self.model.train()
        loader = self.data_loaders["train"]
        pbar = tqdm(range(len(loader)), desc=f"[Epoch {epoch + 1}/{self.epochs}]",
                    disable=self.hard_debug)
        evaluator = self._train_evaluator()
        log_every = max(1, int(self.cfg.solver.get("log_every", 10)))
        pending = []
        fused_metrics = self._fusable_metrics(evaluator)
        for data_dict in loader:
            if fused_metrics is not None:
                metrics, losses = self.train_forward_backward(
                    data_dict, metrics_fn=fused_metrics
                )
            else:
                out, losses = self.train_forward_backward(data_dict)
                metrics = evaluator.batch_metrics({**data_dict, **jax_to_host(out)})
            self.global_step += 1
            pending.append((self.global_step, {**losses, **metrics}))
            if len(pending) >= log_every:
                self.flush_train_logs(pending)
                pending = []
            pbar.update(1)
        self.flush_train_logs(pending)
        pbar.close()
