"""Eval-path throughput: fused scan eval (forward + in-graph (value,count)
metric sums) at shipped defaults — the per-epoch val loop of the reference
(trainer/openvocab_trainer.py:55-80) re-measured with the current kernels
(split text towers, fused MHA, rbg PRNG). VERDICT r4 item 7: the round-3
1322.7 scenes/s row predates all three.

Methodology matches bench.py: K eval steps chained in ONE executable
(device-resident batch), one scalar fetch per block, best of N blocks.
Rows: cap300 (production padded caption shape) and cap64.

Prints one JSON line per shape.
"""

from __future__ import annotations

import json
import os
import time

os.environ.setdefault("SCENEVERSE_PALLAS_FAST", "1")

NUM_OBJ = 80
NUM_POINTS = 1024
SEQ_LEN = 50
SCAN_STEPS = 10
BLOCKS = 3


def main(shapes=((300, 128), (64, 256))):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from flax import nnx

    from sceneverse_tpu.utils.prng import configure_default_prng

    configure_default_prng()

    import sceneverse_tpu.model  # noqa: F401
    from sceneverse_tpu.evaluator.scanrefer_eval import ScanReferEval
    from sceneverse_tpu.model import build_model
    from sceneverse_tpu.utils.precision import enable_mixed_precision
    from sceneverse_tpu.config import Config
    from __graft_entry__ import _gps_batch, _gps_cfg

    cfg = _gps_cfg()
    model = build_model(cfg, rngs=nnx.Rngs(0))
    model.eval()
    enable_mixed_precision(model)
    graphdef, state = nnx.split(model)
    ev = ScanReferEval(Config({"exp_dir": "/tmp/bench_eval"}))

    def eval_batch(b, cap_len, seed=0):
        rng = np.random.RandomState(seed + 1)
        batch = dict(_gps_batch(b, NUM_OBJ, NUM_POINTS, SEQ_LEN,
                                cap_len=cap_len, seed=seed))
        batch["tgt_object_id_iou25"] = jnp.asarray(
            rng.rand(b, NUM_OBJ) < 0.2)
        batch["tgt_object_id_iou50"] = jnp.asarray(
            rng.rand(b, NUM_OBJ) < 0.1)
        batch["is_multiple"] = jnp.asarray(rng.randint(0, 2, (b,)))
        batch["tgt_object_label"] = jnp.asarray(rng.randint(0, 607, (b, 1)))
        return batch

    @jax.jit
    def eval_k(state, batch):
        m = nnx.merge(graphdef, state)

        def metrics_of(batch):
            out = m(batch)
            return ev.batch_metrics({**batch, **out}, include_count=True)

        def body(carry, _):
            acc, eps = carry
            # thread a carry-dependent epsilon through the inputs: without
            # it the forward is loop-invariant and XLA hoists it out of the
            # scan (measured: a bogus 16.5k scenes/s)
            b2 = {**batch, "obj_fts": batch["obj_fts"] + eps}
            metrics = metrics_of(b2)
            sums = {k: (acc[k][0] + jnp.float32(v),
                        acc[k][1] + jnp.float32(c))
                    for k, (v, c) in metrics.items()}
            return (sums, sums["og_acc_iou25"][0] * 1e-30), None

        zeros = {k: (jnp.float32(0), jnp.float32(0))
                 for k in jax.eval_shape(metrics_of, batch)}
        (acc, _eps), _ = jax.lax.scan(body, (zeros, jnp.float32(0)),
                                      None, length=SCAN_STEPS)
        return acc["og_acc_iou25"][0]

    for cap_len, b in shapes:
        batch = eval_batch(b, cap_len)
        total = eval_k(state, batch)  # compile + warm (includes 1 extra fwd)
        float(total)
        dts = []
        for _ in range(BLOCKS):
            t0 = time.perf_counter()
            float(eval_k(state, batch))
            dts.append(time.perf_counter() - t0)
        rate = b * SCAN_STEPS / min(dts)
        print(json.dumps({
            "metric": "gps_fused_eval_scenes_per_sec_per_chip",
            "value": round(rate, 2), "unit": "scenes/s",
            "cap_len": cap_len, "batch": b,
        }), flush=True)
        del batch


if __name__ == "__main__":
    main()
