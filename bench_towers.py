"""Per-tower device-time microbench at GPS train shapes (batch 64).

Times each tower by chaining K dependent calls inside ONE jit and dividing
(the axon tunnel adds a ~28 ms dispatch floor per fetch; chaining amortizes
it away — see CLAUDE.md). Guides kernel work: which tower is worth a fused
Pallas attention.

Usage: python bench_towers.py [--batch 64]
"""

from __future__ import annotations

import argparse
import json
import os
import time

os.environ.setdefault("SCENEVERSE_PALLAS_FAST", "1")

import numpy as np


def timed_chain(fn, args, iters=8, reps=3):
    """Device ms/call of fn(*args): chain `iters` dependent calls in one jit."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def chained(*a):
        acc = 0.0
        out = None
        for i in range(iters):
            out = fn(*a)
            leaves = [x for x in jax.tree_util.tree_leaves(out)
                      if hasattr(x, "dtype")
                      and jnp.issubdtype(x.dtype, jnp.inexact)
                      and x.dtype != jax.dtypes.float0]
            acc = acc + leaves[0].astype(jnp.float32).sum() * 1e-12
            # make the next call depend on the previous (no overlap)
            a = tuple(
                x + acc.astype(x.dtype) * 0 if hasattr(x, "dtype") and
                jnp.issubdtype(x.dtype, jnp.inexact) else x
                for x in a
            )
        return acc

    float(chained(*args))  # compile + warm
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        float(chained(*args))
        dt = time.perf_counter() - t0
        best = dt if best is None or dt < best else best
    return best / iters * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    args_cli = ap.parse_args()

    import jax.numpy as jnp
    from flax import nnx

    import sceneverse_tpu.model  # noqa: F401
    from sceneverse_tpu.model import build_model
    from sceneverse_tpu.utils.precision import enable_mixed_precision
    from __graft_entry__ import _gps_batch, _gps_cfg

    B = args_cli.batch
    cfg = _gps_cfg()
    model = build_model(cfg, rngs=nnx.Rngs(0))
    model.eval()
    enable_mixed_precision(model)
    batch = _gps_batch(B, 80, 1024, 50, cap_len=64)

    results = {}

    # lang tower: fused utterance+caption call ((2B, 64) after padding)
    ids = jnp.concatenate([
        jnp.pad(batch["txt_ids"], ((0, 0), (0, 14))), batch["scene_txt_ids"]
    ], axis=0)
    masks = jnp.concatenate([
        jnp.pad(batch["txt_masks"], ((0, 0), (0, 14))), batch["scene_txt_masks"]
    ], axis=0)
    results["lang_fused_2B"] = timed_chain(
        lambda i, m: model.lang_encoder(i, m), (ids, masks))
    # lang tower: the two separate calls (pre-fusion baseline)
    results["lang_txt_only"] = timed_chain(
        lambda i, m: model.lang_encoder(i, m),
        (batch["txt_ids"], batch["txt_masks"]))
    results["lang_cap_only"] = timed_chain(
        lambda i, m: model.lang_encoder(i, m),
        (batch["scene_txt_ids"], batch["scene_txt_masks"]))

    # vision tower: full point encoder (frozen SA + spatial transformer)
    results["vision_tower"] = timed_chain(
        lambda f, l, m, s: model.point_encoder(f, l, m, s, None)[0],
        (batch["obj_fts"].astype(jnp.float32), batch["obj_locs"],
         batch["obj_masks"], batch["obj_sem_masks"]), iters=4)

    # PointNet++ backbone alone (fused frozen SA path); spatial transformer
    # time = vision_tower - backbone - small glue
    rng = np.random.RandomState(0)
    obj_tokens = jnp.asarray(rng.randn(B, 80, 768).astype(np.float32))
    flat = batch["obj_fts"].astype(jnp.float32).reshape(B * 80, 1024, 6)
    results["pointnet_backbone"] = timed_chain(
        lambda f: model.point_encoder.point_feature_extractor(f), (flat,),
        iters=4)

    # unified encoder
    lang_tokens = jnp.asarray(rng.randn(B, 50, 768).astype(np.float32))
    results["unified_encoder"] = timed_chain(
        lambda lt, lm, ot, ol, om: model.unified_encoder(lt, lm, ot, ol, om)[0],
        (lang_tokens, batch["txt_masks"], obj_tokens, batch["obj_locs"],
         batch["obj_masks"]))

    # pretrain head (LM 30522 + obj 607 logits)
    if getattr(model, "pretrain_head", None) is not None:
        results["pretrain_head"] = timed_chain(
            lambda lt, ot: model.pretrain_head(lt, ot),
            (lang_tokens, obj_tokens))

    print(json.dumps({k: (round(v, 2) if v is not None else None)
                      for k, v in results.items()}))


if __name__ == "__main__":
    main()
