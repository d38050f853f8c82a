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

        # mixed precision (reference launch.py:51-52 --mixed_precision flag,
        # threaded through accelerate; here a config key). fp16 maps to bf16:
        # the TPU's native 16-bit matmul type, same dynamic range as f32 so no
        # loss scaling is needed.
        amp = str(cfg.get("mixed_precision", "no")).lower()
        if amp in ("bf16", "bfloat16", "fp16", "16"):
            from sceneverse_tpu.utils.precision import enable_mixed_precision

            n_amp = enable_mixed_precision(self.model)
            print(f"mixed_precision={amp}: {n_amp} matmul layers -> bfloat16")

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
        self._train_step_metrics = None
        self._compiled_forward = None
        self._graphdef = None
        self._train_state = None

    # ------------------------------------------------------------- jit steps
    #
    # The train step is FUNCTIONAL: (model, optimizer) are split once into
    # (graphdef, state) and the jitted step maps state -> state. Passing live
    # NNX modules through nnx.jit costs a full Python graph traversal of the
    # ~500-array module tree per call (~170 ms at GPS scale — measured via
    # bench_pipeline.py: 230 vs 611 scenes/s); split/merge moves that cost to
    # trace time. The input state buffer is donated so parameters/optimizer
    # state are updated in place in HBM (no double buffering).
    def _build_train_step(self, metrics_fn=None):
        from functools import partial

        loss_mod = self.loss
        self.model.train()
        self._graphdef, self._train_state = nnx.split((self.model, self.optimizer))

        @partial(jax.jit, donate_argnums=0)
        def train_step(state, batch):
            model, optimizer = nnx.merge(self._graphdef, state)

            def loss_fn(model):
                out = model(batch)
                total, losses = loss_mod(out)
                return total, (out, losses)

            (total, (out, losses)), grads = nnx.value_and_grad(
                loss_fn, has_aux=True
            )(model)
            optimizer.update(model, grads)
            _, new_state = nnx.split((model, optimizer))
            if metrics_fn is None:
                return out, losses, new_state
            # train metrics fused into the SAME XLA program: only scalars
            # leave the step — the (B, L, vocab) logits never become a
            # program output (no HBM materialization, one dispatch per step)
            return metrics_fn({**batch, **out}), losses, new_state

        return train_step

    def _build_forward(self):
        @nnx.jit
        def forward(model, batch):
            return model(batch)

        return forward

    def forward(self, data_dict):
        self._materialize()
        if self._compiled_forward is None:
            self._compiled_forward = self._build_forward()
        return self._compiled_forward(self.model, self._device_batch(data_dict))

    def train_forward_backward(self, data_dict, metrics_fn=None):
        """One fused forward+loss+grad+update step (single XLA program).

        With ``metrics_fn`` (a jit-safe ``batch_metrics``), the per-step train
        metrics run inside the same program and the first return value is the
        metrics dict instead of the model outputs.
        """
        if (self._compiled_train_step is None
                or self._train_step_metrics is not metrics_fn):
            self._compiled_train_step = self._build_train_step(metrics_fn)
            self._train_step_metrics = metrics_fn
        if self._train_state is None:  # re-split after an eval/save round trip
            self.model.train()
            _, self._train_state = nnx.split((self.model, self.optimizer))
        batch = self._device_batch(data_dict)
        out, losses, self._train_state = self._compiled_train_step(
            self._train_state, batch
        )
        return out, losses

    def _materialize(self):
        """Write the functional train state back into the live NNX objects
        (before eval forward / checkpointing / any nnx.state read)."""
        if self._train_state is not None:
            nnx.update((self.model, self.optimizer), self._train_state)
            self._train_state = None

    def _fusable_metrics(self, evaluator):
        """The evaluator's batch_metrics as a stable-identity callable when it
        is pure array math (JIT_METRICS and no host-side result dump) — fused
        into the jitted train step. None otherwise (eager fallback)."""
        if getattr(evaluator, "save", False) or not getattr(
            evaluator, "JIT_METRICS", False
        ):
            return None
        # memoize the bound method: a fresh object per attribute access would
        # defeat the identity check in train_forward_backward (recompiles)
        fn = evaluator.__dict__.get("_bound_batch_metrics")
        if fn is None:
            fn = evaluator.batch_metrics
            evaluator.__dict__["_bound_batch_metrics"] = fn
        return fn

    def _device_batch(self, data_dict):
        arrays = {
            k: v for k, v in data_dict.items()
            if hasattr(v, "ndim") or isinstance(v, (int, float, bool, np.number))
        }
        return shard_batch(arrays, self.mesh)

    # ---------------------------------------------------------------- logging
    def log(self, results, mode="train", step=None):
        if self.hard_debug:
            return
        step = self.global_step if step is None else step
        log_dict = {}
        for key, val in results.items():
            try:
                log_dict[f"{mode}/{key}"] = float(val)
            except (TypeError, ValueError):
                continue
        if mode == "train":
            ratio = float(self.schedule(step))
            for i, (label, base_lr) in enumerate(self.group_info):
                log_dict[f"{mode}/lr/group_{i}"] = base_lr * ratio
        self.logger.log(log_dict, step=step)

    def flush_train_logs(self, pending):
        """Fetch a buffer of (step, device-scalar dict) entries in ONE host
        transfer and write each as its own log row.

        The reference logs per step through ``accelerator.log`` where the
        GPU->CPU copy is async and cheap (reference default_trainer.py:36-44);
        on TPU every host fetch is a full pipeline sync (and costs a ~28 ms
        round trip through a remote-execution proxy), so the trainer keeps
        the per-step values as device scalars and drains them every
        ``solver.log_every`` steps. Log content is identical, just written in
        batches.
        """
        if not pending:
            return
        import jax.numpy as jnp

        # pack all scalars into ONE (steps, keys) device array -> ONE transfer
        # (device_get of N tiny arrays costs N round trips on remote runtimes)
        keys = list(pending[0][1].keys())
        stacked = jnp.asarray(
            [[jnp.asarray(vals.get(k, jnp.nan), jnp.float32) for k in keys]
             for _, vals in pending]
        )
        host = np.asarray(stacked)
        for (step, _), row in zip(pending, host):
            self.log(dict(zip(keys, row)), mode="train", step=step)

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

        self._materialize()

        # orbax coordinates multi-host saving itself; every process calls in
        save_checkpoint(self.ckpt_path / name, self._ckpt_state())

    def resume(self):
        from sceneverse_tpu.ckpt.checkpoint import load_checkpoint

        target = self.ckpt_path / "latest.pth"
        if not target.exists():
            target = self.ckpt_path
        if target.exists():
            state = load_checkpoint(target, self._ckpt_state())
            self._train_state = None  # invalidate functional snapshot
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

        self._train_state = None  # invalidate functional snapshot
        n = load_torch_pretrain(self.model, self.pretrain_ckpt_path)
        print(f"Loaded {n} tensors from {self.pretrain_ckpt_path}")


def build_trainer(cfg):
    return TRAINER_REGISTRY.get(cfg.trainer)(cfg)
