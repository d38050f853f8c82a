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
from sceneverse_tpu.parallel.mesh import (
    mesh_from_cfg,
    shard_batch,
    shard_module,
)
from sceneverse_tpu.registry import Registry
from sceneverse_tpu.utils.logger import MetricsLogger

TRAINER_REGISTRY = Registry("trainer")


def _pack_host(arrays: dict):
    """Pack a dict of host arrays into ONE int32 buffer + static layout.

    Every jax.device_put is a separate host->device round trip; on
    high-latency links (remote-execution tunnels; congested PCIe) a ~25-leaf
    batch dict costs 25 round trips per step. Packing sends one buffer; the
    train program unpacks with static slices + bitcasts (free: fused into
    the first consumers). int64/float64 narrow to 32-bit (x64 is disabled),
    bools ride as int32 and are restored on unpack.
    """
    metas, parts, off = [], [], 0
    for k in sorted(arrays):
        a = np.asarray(arrays[k])
        kind = "i32"
        if a.dtype == np.bool_:
            a, kind = a.astype(np.int32), "bool"
        elif np.issubdtype(a.dtype, np.floating):
            a, kind = a.astype(np.float32), "f32"
        else:
            if a.dtype != np.int32 and a.size and (
                    a.max() >= 2 ** 31 or a.min() < -2 ** 31):
                raise OverflowError(
                    f"batch key {k!r} has values outside int32 range; "
                    "packed transfer would wrap silently")
            a = a.astype(np.int32)
        # a tiny minor dim would tile-pad to 128 lanes when the unpacked
        # array materializes on device (a 21x HBM blowup for (...,1024,6)
        # point clouds) — ship those transposed and swap back lazily in
        # program (fuses with the consumers' own transposes)
        swap = a.ndim >= 2 and a.shape[-1] < 8 and a.shape[-2] >= 128
        if swap:
            a = np.swapaxes(a, -1, -2)
        a = np.ascontiguousarray(a)
        flat = a.reshape(-1).view(np.int32)
        metas.append((k, a.shape, kind, off, flat.size, swap))
        parts.append(flat)
        off += flat.size
    return np.concatenate(parts), tuple(metas)


def _unpack_device(buf, metas):
    """Inverse of _pack_host, inside jit (static layout)."""
    import jax.numpy as jnp

    out = {}
    for k, shape, kind, off, n, swap in metas:
        seg = jax.lax.slice(buf, (off,), (off + n,))
        if kind == "f32":
            arr = jax.lax.bitcast_convert_type(seg, jnp.float32)
        elif kind == "bool":
            arr = seg.astype(bool)
        else:
            arr = seg
        arr = arr.reshape(shape)
        out[k] = jnp.swapaxes(arr, -1, -2) if swap else arr
    return out


def _stack_batches(data_dicts):
    """Stack K same-shape host batch dicts along a new leading axis (the
    lax.scan axis of the K-steps/K-eval-batches-per-dispatch paths). Non-array
    leaves (strings, lists of ids) are dropped — they never enter jit."""
    stacked = {}
    for key, v0 in data_dicts[0].items():
        vs = [d[key] for d in data_dicts]
        if hasattr(v0, "ndim") and getattr(v0, "ndim", 0) >= 1:
            stacked[key] = np.stack([np.asarray(v) for v in vs])
        elif isinstance(v0, (int, float, bool, np.number)) or (
                hasattr(v0, "ndim") and v0.ndim == 0):
            stacked[key] = np.asarray(vs)
    return stacked


def _batch_signature(data_dict):
    """Shape/dtype key used to group stackable eval batches (the tail batch
    of a drop_last=False loader is smaller and needs its own executable)."""
    return tuple(sorted(
        (k, np.asarray(v).shape, str(np.asarray(v).dtype))
        for k, v in data_dict.items()
        if hasattr(v, "ndim") or isinstance(v, (int, float, bool, np.number))
    ))


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
        # ('dp', 'mp') mesh resolved from config + hardware — the same code
        # path dryrun_multichip exercises (parallel/mesh.py)
        self.mesh = mesh_from_cfg(cfg)
        # register for ambient discovery: the fused Pallas kernel call sites
        # shard_map over this mesh's dp axis (GSPMD has no partitioning rule
        # for an opaque pallas_call and would replicate it on every device)
        from sceneverse_tpu.parallel.mesh import set_active_mesh

        set_active_mesh(self.mesh)

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

        # mesh placement LAST: pretrain/resume loading rebuilds params as
        # host/default-device arrays, which would silently drop an earlier
        # placement (the vocab-sharded 'mp' LM head in particular)
        if self.mesh.devices.size > 1:
            # replicate params / vocab-shard the LM heads over 'mp' per
            # parallel/mesh.py — the dryrun exercises this exact placement
            shard_module(self.model, self.mesh)
            shard_module(self.optimizer, self.mesh)

        self._compiled_train_step = None
        self._train_step_metrics = None
        self._train_step_metas = None
        self._compiled_train_k = None
        self._train_k_metrics = None
        self._train_k_len = 0
        self._train_k_metas = None
        self._compiled_forward = None
        self._compiled_eval_k = {}
        self._eval_graphdef = None
        self._graphdef = None
        self._train_state = None
        # single-buffer host->device batch transfer (see _pack_host); the
        # in-program unpack doesn't express dp sharding, so only for a
        # single-device mesh (the multi-device path keeps per-leaf puts,
        # which shard on arrival)
        self._packed = (
            self.mesh.devices.size == 1
            and str(cfg.solver.get("packed_transfer", "auto")) != "off"
        )

    # ------------------------------------------------------------- jit steps
    #
    # The train step is FUNCTIONAL: (model, optimizer) are split once into
    # (graphdef, state) and the jitted step maps state -> state. Passing live
    # NNX modules through nnx.jit costs a full Python graph traversal of the
    # ~500-array module tree per call (~170 ms at GPS scale — measured via
    # bench_pipeline.py: 230 vs 611 scenes/s); split/merge moves that cost to
    # trace time. The input state buffer is donated so parameters/optimizer
    # state are updated in place in HBM (no double buffering).
    def _build_train_step(self, metrics_fn=None, metas=None):
        from functools import partial

        loss_mod = self.loss
        self.model.train()
        # keep any live functional state: after a donating step has run, the
        # NNX modules' own buffers are deleted and only _train_state is real
        graphdef, state0 = nnx.split((self.model, self.optimizer))
        self._graphdef = graphdef
        if self._train_state is None:
            self._train_state = state0

        @partial(jax.jit, donate_argnums=0)
        def train_step(state, batch):
            if metas is not None:
                batch = _unpack_device(batch, metas)
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

    def _build_train_k(self, metrics_fn, k, metas=None):
        """K dependent train steps inside ONE executable (lax.scan).

        Dispatch latency (sub-ms on an attached chip, tens of ms through a
        remote-execution proxy, seconds on a contended host) is paid once per
        K steps instead of per step, and so is the log-flush fetch. Semantics
        are identical to K single steps: the scan threads (params, optimizer,
        rng) state exactly as the python loop does. Reference analog: the
        per-step loop in trainer/default_trainer.py:26-46 — collapsed here
        because on TPU the whole step is one program, so chaining programs
        is free.
        """
        from functools import partial

        loss_mod = self.loss
        self.model.train()
        graphdef, state0 = nnx.split((self.model, self.optimizer))
        self._graphdef = graphdef
        if self._train_state is None:
            self._train_state = state0

        @partial(jax.jit, donate_argnums=0)
        def train_k(state, batches):
            if metas is not None:
                batches = _unpack_device(batches, metas)

            def body(st, batch):
                model, optimizer = nnx.merge(graphdef, st)

                def loss_fn(model):
                    out = model(batch)
                    total, losses = loss_mod(out)
                    return total, (out, losses)

                (_, (out, losses)), grads = nnx.value_and_grad(
                    loss_fn, has_aux=True
                )(model)
                optimizer.update(model, grads)
                _, new_state = nnx.split((model, optimizer))
                return new_state, (metrics_fn({**batch, **out}), losses)

            state, (metrics, losses) = jax.lax.scan(body, state, batches)
            return metrics, losses, state

        return train_k

    def train_forward_backward_k(self, data_dicts, metrics_fn):
        """Run ``len(data_dicts)`` steps in one dispatch (see _build_train_k).

        Returns (metrics, losses) dicts whose leaves are stacked (K,) device
        arrays — flush_train_logs understands the stacked form.
        """
        k = len(data_dicts)
        stacked = _stack_batches(data_dicts)
        host_input = not any(
            isinstance(v, jax.Array) for d in data_dicts for v in d.values()
        )
        if self._packed and host_input:
            buf, metas = _pack_host(stacked)
            batches = jax.device_put(buf)
        else:
            metas = None
            batches = shard_batch(stacked, self.mesh, axis=1)
        if (self._compiled_train_k is None
                or self._train_k_metrics is not metrics_fn
                or self._train_k_len != k
                or self._train_k_metas != metas):
            self._compiled_train_k = self._build_train_k(metrics_fn, k, metas)
            self._train_k_metrics = metrics_fn
            self._train_k_len = k
            self._train_k_metas = metas
        if self._train_state is None:
            self.model.train()
            _, self._train_state = nnx.split((self.model, self.optimizer))
        metrics, losses, self._train_state = self._compiled_train_k(
            self._train_state, batches
        )
        return metrics, losses

    def _build_forward(self):
        @nnx.jit
        def forward(model, batch):
            return model(batch)

        return forward

    # ------------------------------------------------------------- fused eval
    #
    # The eager eval loop costs one forward dispatch PLUS ~30 eager metric-op
    # dispatches per batch (each jnp op in batch_metrics runs as its own tiny
    # program outside jit). The reference pays the same shape per batch on GPU
    # (evaluator update after every forward, trainer/default_trainer.py:60-75)
    # where dispatch is cheap; on TPU the fused path below folds the forward
    # AND the (value, count) metric reduction of K eval batches into ONE
    # executable, so an eval epoch is a handful of dispatches and exactly one
    # scalar fetch (in BaseEvaluator.record).
    def _eval_state(self):
        """Functional eval-mode model state; the eval-mode graphdef is fixed
        for the life of the trainer, so it is captured once and reused by
        every compiled eval executable (re-jitting per epoch would recompile)."""
        self._materialize()
        self.model.eval()
        graphdef, state = nnx.split(self.model)
        if self._eval_graphdef is None:
            self._eval_graphdef = graphdef
        return state

    def _build_eval_k(self, metrics_fn, metas=None):
        import jax.numpy as jnp

        graphdef = self._eval_graphdef

        @jax.jit
        def eval_k(state, batches):
            if metas is not None:
                batches = _unpack_device(batches, metas)

            def body(carry, batch):
                model = nnx.merge(graphdef, state)
                out = model(batch)
                m = metrics_fn({**batch, **out}, include_count=True)
                # counts may be static Python ints (batch size); promote every
                # leaf to f32 so the scan stacks them and sums stay exact in
                # the ranges involved (matches the float accumulation of
                # BaseEvaluator.update)
                m = {
                    key: (jnp.asarray(v, jnp.float32),
                          jnp.asarray(c, jnp.float32))
                    for key, (v, c) in m.items()
                }
                return carry, m

            _, stacked = jax.lax.scan(body, 0, batches)
            return jax.tree.map(lambda x: jnp.sum(x, axis=0), stacked)

        return eval_k

    def eval_metrics_k(self, state, data_dicts, metrics_fn):
        """Forward + (value, count) metric sums for K eval batches in ONE
        dispatch. Returns {name: (value_sum, count_sum)} device scalars."""
        stacked = _stack_batches(data_dicts)
        if self._packed:
            buf, metas = _pack_host(stacked)
            batches = jax.device_put(buf)
        else:
            metas = None
            batches = shard_batch(stacked, self.mesh, axis=1)
        key = (id(metrics_fn), len(data_dicts), metas)
        fn = self._compiled_eval_k.get(key)
        if fn is None:
            fn = self._build_eval_k(metrics_fn, metas)
            self._compiled_eval_k[key] = fn
        return fn(state, batches)

    def eval_fused(self, evaluator, loader, metrics_fn):
        """Drive one eval split through the fused scan path.

        Batches are grouped into runs of identical shape (the drop_last=False
        tail batch gets its own, smaller, executable) and dispatched K at a
        time (``solver.eval_steps_per_dispatch``)."""
        spd = max(1, int(self.cfg.solver.get(
            "eval_steps_per_dispatch",
            self.cfg.solver.get("steps_per_dispatch", 1) or 1,
        )))
        state = self._eval_state()
        chunk, sig = [], None

        def flush():
            if chunk:
                evaluator.update_sums(
                    self.eval_metrics_k(state, chunk, metrics_fn))
                chunk.clear()

        for data_dict in loader:
            s = _batch_signature(data_dict)
            if sig is not None and s != sig:
                flush()
            sig = s
            chunk.append(data_dict)
            if len(chunk) == spd:
                flush()
        flush()

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
        host_input = not any(
            isinstance(v, jax.Array) for v in data_dict.values()
        )
        if self._packed and host_input:
            arrays = {
                k: v for k, v in data_dict.items()
                if hasattr(v, "ndim") or isinstance(v, (int, float, bool,
                                                        np.number))
            }
            buf, metas = _pack_host(arrays)
            batch = jax.device_put(buf)
        else:
            metas = None
            batch = self._device_batch(data_dict)
        if (self._compiled_train_step is None
                or self._train_step_metrics is not metrics_fn
                or self._train_step_metas != metas):
            self._compiled_train_step = self._build_train_step(metrics_fn,
                                                               metas)
            self._train_step_metrics = metrics_fn
            self._train_step_metas = metas
        if self._train_state is None:  # re-split after an eval/save round trip
            self.model.train()
            _, self._train_state = nnx.split((self.model, self.optimizer))
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
        # (device_get of N tiny arrays costs N round trips on remote runtimes).
        # Entries are (step, {key: scalar}) from the single-step path or
        # (first_step, {key: (K,) array}, K) from the steps-per-dispatch path.
        keys = list(dict.fromkeys(
            key for entry in pending for key in entry[1]))
        steps, mats = [], []
        for entry in pending:
            if len(entry) == 3:
                step0, vals, k = entry
                mats.append(jnp.stack(
                    [jnp.asarray(vals.get(key, jnp.full((k,), jnp.nan)),
                                 jnp.float32) for key in keys], axis=1))
                steps.extend(range(step0, step0 + k))
            else:
                step0, vals = entry
                mats.append(jnp.asarray(
                    [[jnp.asarray(vals.get(key, jnp.nan), jnp.float32)
                      for key in keys]]))
                steps.append(step0)
        host = np.asarray(jnp.concatenate(mats, axis=0))
        for step, row in zip(steps, host):
            self.log(dict(zip(keys, row)), mode="train", step=step)

    def close(self):
        """Release process-global registrations (the ambient mesh) so a
        trainer/eval built later in the same process doesn't shard_map over
        this trainer's mesh (run.py calls this after run())."""
        from sceneverse_tpu.parallel.mesh import set_active_mesh

        set_active_mesh(None)

    # ----------------------------------------------------------- checkpointing
    def _ckpt_state(self):
        # RngState is EXCLUDED: rbg/threefry key data have different shapes
        # (utils/prng.py picks the impl per backend), so embedding keys would
        # make a TPU-written checkpoint unrestorable on CPU or after changing
        # SCENEVERSE_PRNG_IMPL. Dropout streams re-seed on restore instead —
        # the same semantics class as the reference's cuRAND streams being
        # torch-version-dependent.
        return {
            "model": nnx.to_pure_dict(
                nnx.state(self.model, nnx.Not(nnx.RngState))),
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
        from sceneverse_tpu.ckpt.checkpoint import (
            is_checkpoint,
            latest_checkpoint,
            load_checkpoint,
            wait_for_checkpoints,
        )

        wait_for_checkpoints()  # async saves may still be committing
        target = self.ckpt_path / "latest.pth"
        if not target.exists():
            if is_checkpoint(self.ckpt_path):
                # ckpt_path points directly at one checkpoint
                target = self.ckpt_path
            else:
                # trainers without a latest.pth (OpenVocabTrainer saves only
                # best + every-N, reference openvocab_trainer.py:104-109):
                # resume from the most recent finalized checkpoint
                target = latest_checkpoint(self.ckpt_path) or self.ckpt_path
        if target.exists() and is_checkpoint(target):
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
