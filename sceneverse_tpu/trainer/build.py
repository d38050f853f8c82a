"""Trainer base (reference trainer/build.py:26-191), TPU-native.

What replaces what:
  * HF Accelerator / DDP wrap            -> one jit-compiled train step over a
    (trainer/build.py:66-75,121-127)        jax.sharding Mesh; batch dim
                                            sharded on 'dp'; XLA emits grad
                                            reductions (no find_unused_parameters
                                            machinery — dead branches cost 0)
  * accelerator.backward + clip + step   -> value_and_grad + optax chain
    (trainer/build.py:138-145)              (clip_by_global_norm inside tx)
  * grad accumulation ctx manager        -> optax.MultiSteps(tx, k)
  * accelerate save_state/load_state     -> orbax checkpointing
  * pretrain_ckpt_path pytorch_model.bin -> torch->NNX converter
    (trainer/build.py:174-184)              (sceneverse_tpu.ckpt.convert)
  * wandb via accelerator.log            -> MetricsLogger (JSONL + optional
                                            wandb), per-group LRs included
"""

from __future__ import annotations

import time
from pathlib import Path

import jax
import numpy as np
import optax
from flax import nnx

from sceneverse_tpu.data import build_dataloader
from sceneverse_tpu.evaluator.build import build_eval
from sceneverse_tpu.model.build import build_model
from sceneverse_tpu.optim.build import build_optim
from sceneverse_tpu.parallel.mesh import get_mesh, shard_batch
from sceneverse_tpu.registry import Registry
from sceneverse_tpu.utils.logger import MetricsLogger

TRAINER_REGISTRY = Registry("trainer")


class Tracker:
    """Checkpointable experiment progress (reference trainer/build.py:29-45)."""

    def __init__(self, cfg):
        self.exp_name = str(cfg.get("name", "exp"))
        self.epoch = 0
        self.best_result = -np.inf

    def step(self):
        self.epoch += 1

    def state_dict(self):
        return {k: v for k, v in self.__dict__.items() if not k.startswith("__")}

    def load_state_dict(self, state_dict):
        self.__dict__.update(state_dict)


@TRAINER_REGISTRY.register()
class BaseTrainer:
    def __init__(self, cfg):
        self.cfg = cfg
        self.debug = bool(cfg.select("debug.flag", False))
        self.hard_debug = bool(cfg.select("debug.hard_debug", False))
        self.epochs_per_eval = cfg.solver.get("epochs_per_eval")
        self.epochs_per_save = cfg.solver.get("epochs_per_save")
        self.global_step = 0
        self.mode = cfg.get("mode", "train")
        self.exp_tracker = Tracker(cfg)
        self.logger = MetricsLogger(cfg, self.exp_tracker.exp_name)
        # dp width: min(available devices, cfg.num_gpu, batch divisibility)
        import jax

        n_dev = len(jax.devices())
        dp = min(n_dev, int(cfg.get("num_gpu", n_dev)) or n_dev)
        batch = int(cfg.dataloader.batchsize)
        while dp > 1 and batch % dp != 0:
            dp -= 1
        self.mesh = get_mesh(num_devices=dp)

        from sceneverse_tpu.utils.profiling import setup_from_config

        self.profile_enabled, self.profile_steps = setup_from_config(cfg)

        keys = ["train", "val", "test"] if self.mode == "train" else ["test"]
        self.data_loaders = {k: build_dataloader(cfg, split=k) for k in keys}

        self.rngs = nnx.Rngs(int(cfg.get("rng_seed", 42)))
        self.model = build_model(cfg, rngs=self.rngs)

        accum = int(cfg.solver.get("gradient_accumulation_steps", 1))
        if self.mode == "test":
            total_steps = 1
        else:
            total_steps = (len(self.data_loaders["train"]) * cfg.solver.epochs) // accum
        self.total_steps = (
            1 if self.mode == "test"
            else len(self.data_loaders["train"]) * cfg.solver.epochs
        )
        self.loss, tx, self.schedule, self.group_info = build_optim(
            cfg, self.model, total_steps
        )
        if accum > 1:
            tx = optax.MultiSteps(tx, every_k_schedule=accum)
        self.optimizer = nnx.Optimizer(self.model, tx, wrt=nnx.Param)
        self.epochs = cfg.solver.epochs
        self.grad_norm = cfg.solver.get("grad_norm")

        eval_kwargs = (
            {"dataloaders": self.data_loaders}
            if cfg.select("eval.pass_kwargs", False)
            else {}
        )
        self.evaluator = build_eval(cfg, None, **eval_kwargs)

        if cfg.get("pretrain_ckpt_path"):
            self.pretrain_ckpt_path = Path(cfg.pretrain_ckpt_path)
            self.load_pretrain()

        exp_dir = cfg.get("exp_dir") or "."
        self.ckpt_path = (
            Path(cfg.ckpt_path) if cfg.get("ckpt_path") else Path(exp_dir) / "ckpt"
        )
        if cfg.get("resume", False):
            self.resume()

        self._compiled_train_step = None
        self._compiled_forward = None

    # ------------------------------------------------------------- jit steps
    def _build_train_step(self):
        loss_mod = self.loss

        @nnx.jit
        def train_step(model, optimizer, batch):
            def loss_fn(model):
                out = model(batch)
                total, losses = loss_mod(out)
                return total, (out, losses)

            (total, (out, losses)), grads = nnx.value_and_grad(
                loss_fn, has_aux=True
            )(model)
            optimizer.update(model, grads)
            return out, losses

        return train_step

    def _build_forward(self):
        @nnx.jit
        def forward(model, batch):
            return model(batch)

        return forward

    def forward(self, data_dict):
        if self._compiled_forward is None:
            self._compiled_forward = self._build_forward()
        return self._compiled_forward(self.model, self._device_batch(data_dict))

    def train_forward_backward(self, data_dict):
        """One fused forward+loss+grad+update step (single XLA program)."""
        if self._compiled_train_step is None:
            self._compiled_train_step = self._build_train_step()
        batch = self._device_batch(data_dict)
        return self._compiled_train_step(self.model, self.optimizer, batch)

    def _device_batch(self, data_dict):
        arrays = {
            k: v for k, v in data_dict.items()
            if hasattr(v, "ndim") or isinstance(v, (int, float, bool, np.number))
        }
        return shard_batch(arrays, self.mesh)

    # ---------------------------------------------------------------- logging
    def log(self, results, mode="train"):
        if self.hard_debug:
            return
        log_dict = {}
        for key, val in results.items():
            try:
                log_dict[f"{mode}/{key}"] = float(val)
            except (TypeError, ValueError):
                continue
        if mode == "train":
            ratio = float(self.schedule(self.global_step))
            for i, (label, base_lr) in enumerate(self.group_info):
                log_dict[f"{mode}/lr/group_{i}"] = base_lr * ratio
        self.logger.log(log_dict, step=self.global_step)

    # ----------------------------------------------------------- checkpointing
    def _ckpt_state(self):
        return {
            "model": nnx.to_pure_dict(nnx.state(self.model)),
            "opt": nnx.to_pure_dict(nnx.state(self.optimizer)),
            "tracker": self.exp_tracker.state_dict(),
            "global_step": self.global_step,
        }

    def save(self, name: str):
        from sceneverse_tpu.ckpt.checkpoint import save_checkpoint

        # orbax coordinates multi-host saving itself; every process calls in
        save_checkpoint(self.ckpt_path / name, self._ckpt_state())

    def resume(self):
        from sceneverse_tpu.ckpt.checkpoint import load_checkpoint

        target = self.ckpt_path / "latest.pth"
        if not target.exists():
            target = self.ckpt_path
        if target.exists():
            state = load_checkpoint(target, self._ckpt_state())
            nnx.update(self.model, state["model"])
            nnx.update(self.optimizer, state["opt"])
            self.exp_tracker.load_state_dict(state["tracker"])
            self.global_step = int(state["global_step"])
            print(f"Successfully resumed from {target}")
        else:
            print("training from scratch")

    def load_pretrain(self):
        """Warm start from torch ``pytorch_model*.bin`` shards or a converted
        native checkpoint (reference trainer/build.py:174-184)."""
        from sceneverse_tpu.ckpt.convert import load_torch_pretrain

        n = load_torch_pretrain(self.model, self.pretrain_ckpt_path)
        print(f"Loaded {n} tensors from {self.pretrain_ckpt_path}")


def build_trainer(cfg):
    return TRAINER_REGISTRY.get(cfg.trainer)(cfg)
