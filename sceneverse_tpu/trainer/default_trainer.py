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

    def _annotate_batch(self, data_dict, cur_step):
        # mixup-style schedules read cur_step/total_steps
        # (reference default_trainer.py:32-33)
        data_dict["cur_step"] = cur_step
        data_dict["total_steps"] = self.total_steps
        return data_dict

    def train_step(self, epoch):
        from sceneverse_tpu.utils.profiling import trace

        self.model.train()
        loader = self.data_loaders["train"]
        n = len(loader)
        pbar = tqdm(range(n), desc=f"[Epoch {epoch + 1}/{self.epochs}]",
                    disable=self.hard_debug)
        evaluator = self._train_evaluator()
        profiling = self.profile_enabled and epoch == 0
        exp_dir = self.cfg.get("exp_dir") or "."
        # losses/metrics stay as device scalars; one host fetch per
        # `log_every` steps keeps the hot loop free of pipeline syncs
        # (see BaseTrainer.flush_train_logs)
        log_every = max(1, int(self.cfg.solver.get("log_every", 10)))
        # steps_per_dispatch > 1 runs K steps per XLA dispatch (lax.scan over
        # K stacked batches) — identical math, 1/K the dispatch + log-fetch
        # overhead; the tail chunk (< K batches) takes the single-step path
        spd = max(1, int(self.cfg.solver.get("steps_per_dispatch", 1)))
        pending = []
        fused_metrics = self._fusable_metrics(evaluator)

        def annotate(data_dict, i):
            return self._annotate_batch(data_dict, epoch * n + i)

        def single(data_dict, i):
            data_dict = annotate(data_dict, i)
            if fused_metrics is not None:
                metrics, losses = self.train_forward_backward(
                    data_dict, metrics_fn=fused_metrics
                )
            else:
                out, losses = self.train_forward_backward(data_dict)
                metrics = evaluator.batch_metrics(
                    {**data_dict, **jax_to_host(out)}
                )
            self.global_step += 1
            pending.append((self.global_step, {**losses, **metrics}))

        with trace(f"{exp_dir}/profile", enabled=profiling and n > 0):
            i = 0
            it = iter(loader)
            while True:
                chunk = []
                while len(chunk) < spd:
                    try:
                        chunk.append(next(it))
                    except StopIteration:
                        break
                if not chunk:
                    break
                if len(chunk) == spd and spd > 1 and fused_metrics is not None:
                    dicts = [annotate(d, i + j) for j, d in enumerate(chunk)]
                    metrics, losses = self.train_forward_backward_k(
                        dicts, fused_metrics
                    )
                    pending.append(
                        (self.global_step + 1, {**losses, **metrics}, spd)
                    )
                    self.global_step += spd
                else:
                    for j, d in enumerate(chunk):
                        single(d, i + j)
                i += len(chunk)
                if len(pending) >= max(1, log_every // spd):
                    self.flush_train_logs(pending)
                    pending = []
                pbar.update(len(chunk))
                if profiling and i >= self.profile_steps:
                    break
        self.flush_train_logs(pending)
        pbar.close()

    def _eval_loop(self, split, mode):
        """Run a split through its evaluator(s); supports per-dataset lists
        (reference build_eval :65-75 returns lists for multi-val configs)."""
        self.model.eval()
        evaluators = self._val_evaluator()
        loaders = self.data_loaders[split]
        ev_list = evaluators if isinstance(evaluators, list) else [evaluators]
        ld_list = loaders if isinstance(loaders, list) else [loaders]
        if len(ev_list) == 1 and len(ld_list) > 1:
            ev_list = ev_list * len(ld_list)
        is_best, results = False, {}
        for ev, ld in zip(ev_list, ld_list):
            fused = self._fusable_metrics(ev)
            if fused is not None:
                # forward + metric reduction fused into one executable per
                # dispatch group (see BaseTrainer.eval_fused) — the eager loop
                # below costs ~30 tiny metric dispatches per batch on top of
                # the forward
                self.eval_fused(ev, ld, fused)
            else:
                for data_dict in ld:
                    out = self.forward(data_dict)
                    ev.update({**data_dict, **jax_to_host(out)})
            best_i, res_i = ev.record()
            is_best = is_best or best_i
            results.update(res_i)
            self.log(res_i, mode=mode)
            ev.reset()
        return is_best, results

    def eval_step(self, epoch):
        is_best, results = self._eval_loop("val", "val")
        if is_best:
            self.best_metric = results["target_metric"]
        return is_best

    def test_step(self):
        _, results = self._eval_loop("test", "test")
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
        from sceneverse_tpu.ckpt.checkpoint import wait_for_checkpoints

        wait_for_checkpoints()  # async epoch saves must be durable at exit
        return results


def jax_to_host(out: dict) -> dict:
    """Model outputs stay as device arrays (evaluator math is jnp); this hook
    exists so subclasses can force host transfer when needed."""
    return out
