"""Optimizer construction (reference optim/build.py + optim/optimizer/optim.py
+ optim/utils.py no_decay_param_group).

The reference builds torch AdamW over per-module param groups, each split
into decay (wd=0.01) / no-decay (bias + LayerNorm) halves, with a LambdaLR
warmup-cosine schedule and grad-norm clipping in the trainer.

TPU-native equivalent: one ``optax.chain(clip_by_global_norm,
multi_transform)`` where every param leaf is labeled
``g{i}_{decay|nodecay}`` by longest-prefix match against
``model.get_opt_params()``, each label owning an AdamW with its group's
base-lr x shared schedule; frozen subtrees (``model.frozen_prefixes()``)
map to ``optax.set_to_zero`` — the analog of requires_grad=False params
never reaching the optimizer.
"""

from __future__ import annotations

from typing import Any

import jax
import optax
from flax import nnx

from sceneverse_tpu.optim.loss.loss import Loss
from sceneverse_tpu.optim.scheduler import get_schedule_fn

_OPTIMIZERS = {
    "AdamW": optax.adamw,
    "Adam": optax.adam,
    "SGD": optax.sgd,
}


def _path_names(path) -> tuple:
    names = []
    for p in path:
        key = getattr(p, "key", getattr(p, "idx", getattr(p, "name", p)))
        names.append(str(key))
    if names and names[-1] == "value":  # VariableState leaf wrapper
        names.pop()
    return tuple(names)


def _is_no_decay(path_names: tuple) -> bool:
    """reference optim/utils.py:2 — bias / LayerNorm params get wd=0.
    In our trees LayerNorm/BatchNorm params are ('scale'|'bias')."""
    leaf = path_names[-1]
    return leaf in ("bias", "scale")


def build_optim(cfg, model, total_steps: int):
    """Returns (loss_module, optax transform, schedule_fn, group_info).

    group_info: list of (label, base_lr) for LR logging
    (reference trainer/build.py:154-157 logs per-group LRs).
    """
    loss = Loss(cfg)
    groups = model.get_opt_params()
    frozen = [tuple(p) for p in model.frozen_prefixes()]
    schedule = get_schedule_fn(cfg, total_steps)

    opt_name = cfg.solver.optim.name
    opt_args: dict[str, Any] = dict(cfg.solver.optim.get("args", {}) or {})
    if "betas" in opt_args:
        b1, b2 = opt_args.pop("betas")
        opt_args["b1"], opt_args["b2"] = b1, b2
    opt_fn = _OPTIMIZERS[opt_name]

    def label_of(path_names: tuple) -> str:
        for fp in frozen:
            if path_names[: len(fp)] == fp:
                return "frozen"
        best, best_len = None, -1
        for i, g in enumerate(groups):
            pref = tuple(g["prefix"])
            if path_names[: len(pref)] == pref and len(pref) > best_len:
                best, best_len = i, len(pref)
        if best is None:
            return "frozen"  # params outside every group are not optimized
        g = groups[best]
        if g.get("no_decay_split", True) and _is_no_decay(path_names):
            return f"g{best}_nodecay"
        return f"g{best}_decay"

    # callable labels: computed on whatever pytree structure optax passes
    # (nnx State of Params at init, VariableState grads at update)
    def labels(tree):
        return jax.tree_util.tree_map_with_path(
            lambda path, leaf: label_of(_path_names(path)), tree
        )

    transforms = {"frozen": optax.set_to_zero()}
    group_info = []
    for i, g in enumerate(groups):
        base_lr = float(g["lr"])
        lr_fn = (lambda base: (lambda step: base * schedule(step)))(base_lr)
        wd = g.get("weight_decay", 0.01)
        if opt_name in ("AdamW",):
            transforms[f"g{i}_decay"] = opt_fn(lr_fn, weight_decay=wd, **opt_args)
            transforms[f"g{i}_nodecay"] = opt_fn(lr_fn, weight_decay=0.0, **opt_args)
        else:
            sub_args = dict(opt_args)
            transforms[f"g{i}_decay"] = opt_fn(lr_fn, **sub_args)
            transforms[f"g{i}_nodecay"] = opt_fn(lr_fn, **sub_args)
        group_info.append((f"g{i}", base_lr))

    tx = optax.multi_transform(transforms, labels)
    grad_norm = cfg.solver.get("grad_norm")
    if grad_norm is not None:
        tx = optax.chain(optax.clip_by_global_norm(float(grad_norm)), tx)
    return loss, tx, schedule, group_info
