"""Evaluator protocol (reference evaluator/build.py:8-75).

Metric protocol: ``batch_metrics(data_dict)`` returns
``{name: (value, count)}`` where value/count may be jnp scalars — the array
math (argmax/top-k/masked compare) is jit-compatible and runs on device;
``update`` accumulates host-side Python floats; ``record`` ratio-reduces and
tracks the best ``target_metric``.

Distributed note: the reference gathers per-rank metric lists with
``gather_dict`` (all_gather_object over NCCL/gloo) before reducing
(evaluator/build.py:33-41). On the TPU mesh the eval step is jit-compiled
over the *global* batch, so the per-batch (value, count) sums are already
global; multi-host processes additionally sum via
``multihost_utils.process_allgather`` when world > 1.
"""

from __future__ import annotations

import json
from pathlib import Path

import jax
import numpy as np

from sceneverse_tpu.registry import Registry

EVALUATOR_REGISTRY = Registry("EVALUATOR")


def ratio_metrics(metrics: dict, floor: float = 1.0) -> dict:
    """value/count ratios, kept as DEVICE scalars when inputs are device
    arrays (no host sync — the train loop fetches in batches via
    ``BaseTrainer.flush_train_logs``; the reference's ``.item()`` per metric
    per step is a GPU pattern that would stall the TPU pipeline)."""
    import jax.numpy as jnp

    out = {}
    for k, (v, c) in metrics.items():
        if hasattr(v, "ndim") or hasattr(c, "ndim"):
            out[k] = jnp.asarray(v, jnp.float32) / jnp.maximum(
                jnp.asarray(c, jnp.float32), floor
            )
        else:
            out[k] = float(v) / max(float(c), floor)
    return out


def _sum_across_processes(values: np.ndarray) -> np.ndarray:
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        return np.asarray(multihost_utils.process_allgather(values)).sum(axis=0)
    return values


class BaseEvaluator:
    """(value, count) accumulation + ratio reduce + best tracking
    (reference evaluator/build.py:11-54)."""

    target_metric: str = "target_metric"
    # True when batch_metrics is pure array math (jit-safe): the trainer jits
    # it into ONE dispatch per train step (BaseTrainer._metrics_fn)
    JIT_METRICS = False

    def __init__(self, cfg, accelerator=None, **kwargs):
        self.cfg = cfg
        self.accelerator = accelerator
        self.best_result = -np.inf
        self.save = bool(cfg.select("eval.save", False))
        exp_dir = cfg.get("exp_dir") or "."
        self.save_dir = Path(exp_dir) / "eval_results" / type(self).__name__
        if self.save:
            self.save_dir.mkdir(parents=True, exist_ok=True)
        self.reset()

    def reset(self):
        self.eval_results = []
        self.eval_dict = {}

    def batch_metrics(self, data_dict, include_count=False):
        raise NotImplementedError(
            "Per batch metrics calculation is required for evaluation"
        )

    def update(self, data_dict):
        metrics = self.batch_metrics(data_dict, include_count=True)
        for key, (value, count) in metrics.items():
            # device scalars accumulate on device (no per-batch host sync);
            # record() fetches once at the end of the eval loop
            acc = self.eval_dict.setdefault(key, [0.0, 0.0])
            acc[0] = acc[0] + value
            acc[1] = acc[1] + count

    def update_sums(self, metrics):
        """Accumulate pre-summed (value, count) pairs — the fused eval path
        (BaseTrainer.eval_fused) reduces whole dispatch groups of batches
        in-graph and delivers their sums here. Same accumulation semantics as
        ``update``, minus the per-batch ``batch_metrics`` call."""
        for key, (value, count) in metrics.items():
            acc = self.eval_dict.setdefault(key, [0.0, 0.0])
            acc[0] = acc[0] + value
            acc[1] = acc[1] + count

    def record(self):
        out = {}
        for k, (value, count) in self.eval_dict.items():
            vc = _sum_across_processes(np.asarray([value, count], np.float64))
            out[k] = vc[0] / max(vc[1], 1)
        if self.save and jax.process_index() == 0:
            with (self.save_dir / "results.json").open("w") as f:
                json.dump(self.eval_results, f)
        out["target_metric"] = out[self.target_metric]
        is_best = out["target_metric"] > self.best_result
        if is_best:
            self.best_result = out["target_metric"]
        out["best_result"] = self.best_result
        self.eval_dict = out
        return is_best, out


def get_eval(name, cfg, accelerator=None, **kwargs):
    """One evaluator or a list (reference evaluator/build.py:57-63)."""
    if isinstance(name, str):
        return EVALUATOR_REGISTRY.get(name)(cfg, accelerator, **kwargs)
    return [EVALUATOR_REGISTRY.get(n)(cfg, accelerator, **kwargs) for n in name]


def build_eval(cfg, accelerator=None, **kwargs):
    """reference evaluator/build.py:65-75: train/val dict, single, or
    per-val-dataset list."""
    if cfg.select("eval.train") is not None:
        return {
            "train": get_eval(cfg.eval.train.name, cfg, accelerator, **kwargs),
            "val": get_eval(cfg.eval.val.name, cfg, accelerator, **kwargs),
        }
    if cfg.select("eval.name") is not None:
        return get_eval(cfg.eval.name, cfg, accelerator, **kwargs)
    names = [cfg.data[dataset].evaluator for dataset in cfg.data.val]
    return get_eval(names, cfg, accelerator, **kwargs)
