"""Misc helpers (reference common/misc.py).

The reference's cross-rank gather machinery (gather_object /
gather_for_metrics / gather_dict over torch.distributed, :43-140) is replaced
by the mesh-global jit'd metric sums + multihost allgather in
sceneverse_tpu.evaluator.build; what remains here are the host utilities.
"""

from __future__ import annotations

import functools
import os


def rgetattr(obj, path, default=None):
    """Recursive getattr with dotted paths (reference common/misc.py)."""
    try:
        return functools.reduce(getattr, path.split("."), obj)
    except AttributeError:
        return default


def make_dir(path):
    os.makedirs(path, exist_ok=True)


def gather_dict(metrics: dict) -> dict:
    """Sum (value, count) metric dicts across processes
    (single-process: identity; multi-host: multihost allgather)."""
    import jax
    import numpy as np

    if jax.process_count() == 1:
        return metrics
    from jax.experimental import multihost_utils

    out = {}
    for k, v in metrics.items():
        arr = np.asarray(v, np.float64)
        out[k] = np.asarray(multihost_utils.process_allgather(arr)).sum(axis=0)
    return out
