"""Inference-latency benchmark: p50/p90 single-request grounding latency.

Measures the eval-mode GPS forward (text + 80 objects x 1024 points ->
og3d grounding logits) at serving batch sizes on the local chip. The
reference publishes no latency numbers (BASELINE.md); this pins ours.

Note the measured wall-clock includes one host->device dispatch round trip
(~28 ms through the axon tunnel on this rig, ~0 on a directly-attached
chip); `device_ms` nets out the floor measured on a trivial jit.

Prints one JSON line per batch size.
"""

from __future__ import annotations

import json
import time

import numpy as np

NUM_OBJ = 80
NUM_POINTS = 1024
SEQ_LEN = 50
WARMUP = 5
ITERS = 30


def _percentiles(ts):
    ts = sorted(ts)
    return (ts[len(ts) // 2] * 1000,
            ts[min(len(ts) - 1, int(len(ts) * 0.9))] * 1000)


def main():
    import jax
    import jax.numpy as jnp
    from flax import nnx

    import sceneverse_tpu.model  # noqa: F401
    from sceneverse_tpu.model import build_model
    from sceneverse_tpu.utils.precision import enable_mixed_precision
    from __graft_entry__ import _gps_batch, _gps_cfg

    cfg = _gps_cfg()
    model = build_model(cfg, rngs=nnx.Rngs(0))
    model.eval()
    enable_mixed_precision(model)
    graphdef, state = nnx.split(model)

    @jax.jit
    def ground(state, batch):
        m = nnx.merge(graphdef, state)
        out = m(batch)
        # fetch-sized output: per-request argmax + score (serving shape)
        return (jnp.argmax(out["og3d_logits"], axis=-1),
                jnp.max(out["og3d_logits"], axis=-1))

    # dispatch floor (tunnel round trip) for the device_ms estimate
    trivial = jax.jit(lambda x: x + 1.0)
    for _ in range(3):
        float(trivial(jnp.float32(0.0)))
    floors = []
    for _ in range(10):
        t0 = time.perf_counter()
        float(trivial(jnp.float32(0.0)))
        floors.append(time.perf_counter() - t0)
    floor_ms = sorted(floors)[len(floors) // 2] * 1000

    for batch_size in (1, 8, 32):
        batch = _gps_batch(batch_size, NUM_OBJ, NUM_POINTS, SEQ_LEN)
        for _ in range(WARMUP):
            idx, score = ground(state, batch)
            float(score.sum())
        ts = []
        for _ in range(ITERS):
            t0 = time.perf_counter()
            idx, score = ground(state, batch)
            float(score.sum())
            ts.append(time.perf_counter() - t0)
        p50, p90 = _percentiles(ts)
        print(json.dumps({
            "metric": "gps_grounding_latency",
            "batch": batch_size,
            "p50_ms": round(p50, 2),
            "p90_ms": round(p90, 2),
            "device_ms_est": round(max(p50 - floor_ms, 0.0), 2),
            "unit": "ms/request-batch",
        }), flush=True)


if __name__ == "__main__":
    main()
