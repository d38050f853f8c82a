"""Capture a device trace of the bench train step (same construction as
bench.py) for op-level analysis with profile_analyze.py.

Env: the same SCENEVERSE_BENCH_* knobs as bench.py (UNFREEZE, BATCH,
CAP_LEN, SA_TRAIN_FUSED, BN_FOLD, ...). Writes the xplane under
SCENEVERSE_PROFILE_DIR (default /tmp/profiles/step) and prints the path.

Usage (exp_server job or direct):
    SCENEVERSE_BENCH_UNFREEZE=1 python profile_step.py
    python profile_analyze.py /tmp/profiles/step 30
"""

from __future__ import annotations

import os

os.environ.setdefault("SCENEVERSE_PALLAS_FAST", "1")


def main(tag: str = "step", scan_steps: int = 3):
    import jax
    from flax import nnx

    from sceneverse_tpu.utils.prng import configure_default_prng

    configure_default_prng()

    import sceneverse_tpu.model  # noqa: F401
    from sceneverse_tpu.model import build_model
    from sceneverse_tpu.optim.build import build_optim
    from sceneverse_tpu.utils.precision import enable_mixed_precision
    from __graft_entry__ import _gps_batch, _gps_cfg

    cap_len = int(os.environ.get("SCENEVERSE_BENCH_CAP_LEN", 300))
    batch_size = int(os.environ.get("SCENEVERSE_BENCH_BATCH",
                                    128 if cap_len >= 192 else 256))
    unfreeze = os.environ.get("SCENEVERSE_BENCH_UNFREEZE", "").lower() in (
        "1", "true", "on", "yes")

    cfg = _gps_cfg()
    if unfreeze:
        cfg.model.vision.args.freeze = False
    model = build_model(cfg, rngs=nnx.Rngs(0))
    model.train()
    enable_mixed_precision(model)
    loss_mod, tx, _, _ = build_optim(cfg, model, total_steps=10_000)
    from __graft_entry__ import make_train_scaffold

    _, train_k, state = make_train_scaffold(model, loss_mod, tx, scan_steps)

    batch = _gps_batch(batch_size, 80, 1024, 50, cap_len=cap_len)
    total, state = train_k(state, batch)  # compile + warm
    print(f"warm loss {float(total):.4f} (batch {batch_size}, "
          f"cap {cap_len}, unfreeze {unfreeze})", flush=True)

    prof_dir = os.environ.get("SCENEVERSE_PROFILE_DIR",
                              f"/tmp/profiles/{tag}")
    os.makedirs(prof_dir, exist_ok=True)
    jax.profiler.start_trace(prof_dir)
    total, state = train_k(state, batch)
    print(f"traced loss {float(total):.4f}", flush=True)
    jax.profiler.stop_trace()
    print(f"trace -> {prof_dir}", flush=True)


if __name__ == "__main__":
    main(tag=os.environ.get("SCENEVERSE_PROFILE_TAG", "step"))
