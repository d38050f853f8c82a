"""LR schedules (reference optim/scheduler.py:5-26): warmup_cosine /
warmup_exp ratio functions; ``warmup_steps`` is scaled by the number of
data-parallel devices (reference :21 multiplies by ``num_gpu`` — an
intentional LR-schedule behavior, preserved)."""

from __future__ import annotations

import jax.numpy as jnp


def warmup_cosine(step, warmup_step, total_step, minimum_ratio=1e-5, **kwargs):
    warm = jnp.where(warmup_step > 0, step / jnp.maximum(warmup_step, 1), 1.0)
    denom = jnp.maximum(total_step - warmup_step, 1)
    cos = 0.5 * (1 + jnp.cos((step - warmup_step) / denom * jnp.pi))
    cos = jnp.maximum(cos, minimum_ratio)
    return jnp.where((step <= warmup_step) & (warmup_step > 0), warm, cos)


def warmup_exp(step, warmup_step, total_step, gamma=0.1, **kwargs):
    warm = step / jnp.maximum(warmup_step, 1)
    decay = gamma ** (step * 1.0 / jnp.maximum(total_step - warmup_step, 1))
    return jnp.where((step <= warmup_step) & (warmup_step > 0), warm, decay)


_SCHEDULES = {"warmup_cosine": warmup_cosine, "warmup_exp": warmup_exp}


def get_schedule_fn(cfg, total_steps):
    """Return ratio(step) -> multiplier in [0, 1]."""
    name = cfg.solver.sched.name
    args = dict(cfg.solver.sched.get("args", {}) or {})
    warmup_steps = args.pop("warmup_steps", 0) * cfg.get("num_gpu", 1)
    fn = _SCHEDULES[name]
    return lambda step: fn(step, warmup_steps, total_steps, **args)
