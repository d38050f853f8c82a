"""Default PRNG implementation selection.

JAX's default ``threefry2x32`` PRNG generates dropout masks as long xor
chains of vector ops; on TPU the ``rbg`` implementation draws bits with the
hardware XLA RngBitGenerator instead (key split/fold_in still goes through
threefry, so stream derivation stays stable) — measured +15.7% on the full
GPS train step (1225.0 -> 1417.1 scenes/s, batch 256 v5e, BASELINE.md
round 4): the dropout threefry chains were burning ~16% of the step.

Dropout masks remain iid uniform; only the stream differs from the threefry
path — the same class of change as the fused-MHA kernel's in-kernel PRNG
(ops/pallas/mha.py), and equivalent to the reference's cuRAND streams being
torch-version-dependent. Training metrics are distribution-identical.

Must be configured BEFORE any ``jax.random.key``/``nnx.Rngs`` creation in
the process (the impl is baked into each key at creation).
"""

from __future__ import annotations

import os

import jax

_ENV = "SCENEVERSE_PRNG_IMPL"


def configure_default_prng() -> str:
    """Set ``jax_default_prng_impl`` for this process and return the impl.

    SCENEVERSE_PRNG_IMPL overrides (``threefry2x32`` | ``rbg`` |
    ``unsafe_rbg``); default is ``rbg`` on TPU backends and JAX's stock
    ``threefry2x32`` elsewhere (CPU tests keep bit-stable golden draws).
    """
    impl = os.environ.get(_ENV, "").strip().lower()
    if not impl:
        try:
            impl = "rbg" if jax.default_backend() == "tpu" else "threefry2x32"
        except Exception:
            impl = "threefry2x32"
    jax.config.update("jax_default_prng_impl", impl)
    return impl
