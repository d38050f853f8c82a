"""Profiling / debugging (SURVEY.md §5).

The reference ships only commented-out torch.profiler scaffolding
(reference trainer/openvocab_trainer.py:89-99) and a NaN assert in fused
attention (transformers.py:234). Here these are first-class:

  * ``profile.enabled`` config flag -> jax.profiler trace of N train steps
    written under exp_dir/profile (view with tensorboard / xprof),
  * ``debug.nans`` config flag -> jax_debug_nans (fails fast on any NaN,
    covering the reference's attention assert and more),
  * ``StepTimer`` — block_until_ready wall-clock timing of jit'd steps.
"""

from __future__ import annotations

import contextlib
import time
from pathlib import Path

import jax


def enable_nan_debugging():
    jax.config.update("jax_debug_nans", True)


@contextlib.contextmanager
def trace(log_dir, enabled: bool = True):
    """jax.profiler trace context; no-op when disabled."""
    if not enabled:
        yield
        return
    log_dir = str(Path(log_dir))
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock timing that forces completion of async-dispatched steps."""

    def __init__(self):
        self.total = 0.0
        self.count = 0

    @contextlib.contextmanager
    def measure(self, result_to_block=None):
        t0 = time.perf_counter()
        yield
        if result_to_block is not None:
            jax.block_until_ready(result_to_block)
        self.total += time.perf_counter() - t0
        self.count += 1

    @property
    def mean_ms(self):
        return 1000.0 * self.total / max(self.count, 1)


def setup_from_config(cfg):
    """Apply profile/debug config flags (call once at trainer init)."""
    if cfg.select("debug.nans", False):
        enable_nan_debugging()
    return bool(cfg.select("profile.enabled", False)), int(
        cfg.select("profile.steps", 10) or 10
    )
