"""Tests for the model layer (OpenVocab/ObjCls), functional losses (golden
values vs torch), contrastive losses, and the optimizer builder."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from flax import nnx

from sceneverse_tpu.config import Config
from sceneverse_tpu.model import build_model
from sceneverse_tpu.optim import build_optim
from sceneverse_tpu.optim.loss import loss as L
from sceneverse_tpu.optim.scheduler import warmup_cosine


HID = 32


def tiny_gps_cfg(head_list=("pretrain_head",), freeze=False, loss_list=None):
    return Config({
        "num_gpu": 1,
        "task": "Pretrain",
        "data": {"args": {"use_scene_cap": False}},
        "solver": {
            "lr": 5e-4, "grad_norm": 5.0,
            "optim": {"name": "AdamW", "args": {"betas": [0.9, 0.98]}},
            "sched": {"name": "warmup_cosine",
                      "args": {"warmup_steps": 5, "minimum_ratio": 0.1}},
        },
        "model": {
            "name": "OpenVocab",
            "inter": "before",
            "language": {"name": "BERTLanguageEncoder", "lr": 1e-5,
                         "args": {"hidden_size": HID, "num_hidden_layers": 2,
                                  "num_attention_heads": 4}},
            "vision": {"name": "PointOpenVocabEncoder", "lr": 1e-4,
                       "args": {"hidden_size": HID, "freeze": freeze,
                                "num_attention_heads": 4, "num_layers": 2,
                                "dim_feedforward": 64, "spatial_dim": 5,
                                "dim_loc": 6, "attn_type": "spatial",
                                "pairwise_rel_type": "center"}},
            "grounding": {"name": "UnifiedSpatialCrossEncoderV2", "lr": 1e-4,
                          "args": {"hidden_size": HID, "num_attention_heads": 4,
                                   "num_layers": 2, "dim_feedforward": 64,
                                   "dim_loc": 6}},
            "heads": {"head_list": list(head_list),
                      "pretrain_head": {"name": "OVPretrainHead",
                                        "args": {"hidden_size": HID,
                                                 "vocab_size": 100}},
                      "ground_head": {"name": "GroundHeadV1",
                                      "args": {"input_size": HID,
                                               "hidden_size": HID,
                                               "sem_cls_size": 20}},
                      "qa_head": {"name": "QAHeadV1",
                                  "args": {"hidden_size": HID, "mlp_size": 16,
                                           "flat_out_size": 24,
                                           "num_answers": 13}}},
            "loss_list": list(loss_list or ["lm_cls_loss", "TextObjWithinBatch"]),
            "vis_loss_list": list(loss_list or ["lm_cls_loss", "TextObjWithinBatch"]),
        },
    })


def gps_batch(B=2, O=5, P=64, Ltxt=7, vocab=100, rng=None):
    rng = rng or np.random.RandomState(0)
    return {
        "txt_ids": jnp.asarray(rng.randint(0, vocab, (B, Ltxt))),
        "txt_masks": jnp.ones((B, Ltxt), jnp.int32),
        "obj_fts": jnp.asarray(rng.randn(B, O, P, 6).astype(np.float32)),
        "obj_locs": jnp.asarray(rng.randn(B, O, 6).astype(np.float32)),
        "obj_masks": jnp.ones((B, O), bool),
        "obj_sem_masks": jnp.ones((B, O), jnp.int32),
        "obj_labels": jnp.asarray(rng.randint(0, 20, (B, O))),
        "tgt_object_id": jnp.asarray(rng.randint(0, O, (B, 1))),
        "masked_lm_labels": jnp.asarray(
            np.where(rng.rand(B, Ltxt) < 0.3, rng.randint(0, vocab, (B, Ltxt)), -1)
        ),
    }


def test_openvocab_forward_keys_and_shapes():
    cfg = tiny_gps_cfg(head_list=("pretrain_head", "ground_head", "qa_head"))
    model = build_model(cfg, rngs=nnx.Rngs(0))
    model.eval()
    out = model(gps_batch())
    assert out["og3d_logits"].shape == (2, 5)
    assert out["txt_lm_cls_logits"].shape == (2, 7, 100)
    assert out["obj_cls_raw_logits"].shape == (2, 5, 607)
    assert out["txt_cls_logits"].shape == (2, 20)
    assert out["answer_scores"].shape == (2, 13)
    assert out["inter_text_embed"].shape == (2, HID)
    # ground_head og3d logits: -inf only where masked (here none)
    assert np.isfinite(np.asarray(out["og3d_logits"])).all()


def test_openvocab_perscene_forward():
    cfg = tiny_gps_cfg()
    cfg.model.name = "OpenVocabPerScene"
    model = build_model(cfg, rngs=nnx.Rngs(0))
    model.eval()
    b = gps_batch()
    B, Lsent, T = 2, 3, 7
    rng = np.random.RandomState(1)
    b["txt_ids"] = jnp.asarray(rng.randint(0, 100, (B, Lsent, T)))
    b["txt_masks"] = jnp.ones((B, Lsent, T), jnp.int32)
    b["tgt_object_id"] = jnp.asarray(rng.randint(0, 5, (B, Lsent)))
    b["masked_lm_labels"] = jnp.asarray(rng.randint(-1, 100, (B, Lsent, T)))
    out = model(b)
    assert out["og3d_logits"].shape == (B, Lsent, 5)
    assert out["txt_lm_cls_logits"].shape == (B * Lsent, T, 100)


def test_losses_match_torch():
    import torch
    import torch.nn.functional as F

    rng = np.random.RandomState(0)
    # og3d CE
    logits = rng.randn(4, 9).astype(np.float32)
    tgt = rng.randint(0, 9, (4, 1))
    ours = L.og3d_loss({"og3d_logits": jnp.asarray(logits),
                        "tgt_object_id": jnp.asarray(tgt)})
    want = F.cross_entropy(torch.tensor(logits), torch.tensor(tgt[:, 0]))
    np.testing.assert_allclose(float(ours), float(want), rtol=1e-5)

    # masked obj CE with -100 pads
    ol = rng.randn(2, 6, 20).astype(np.float32)
    lab = rng.randint(0, 20, (2, 6)); lab[:, -2:] = -100
    mask = np.ones((2, 6)); mask[:, -2:] = 0
    ours = L.obj_cls_raw_loss({"obj_cls_raw_logits": jnp.asarray(ol),
                               "obj_labels": jnp.asarray(lab),
                               "obj_masks": jnp.asarray(mask)})
    tce = F.cross_entropy(torch.tensor(ol).permute(0, 2, 1), torch.tensor(lab),
                          reduction="none") * torch.tensor(mask)
    want = tce.sum() / torch.tensor(mask).sum()
    np.testing.assert_allclose(float(ours), float(want), rtol=1e-5)

    # masked-LM CE ignore -1
    ll = rng.randn(2, 7, 50).astype(np.float32)
    tl = rng.randint(0, 50, (2, 7)); tl[0, :3] = -1
    ours = L.lm_cls_loss({"txt_lm_cls_logits": jnp.asarray(ll),
                          "masked_lm_labels": jnp.asarray(tl)})
    want = F.cross_entropy(torch.tensor(ll).permute(0, 2, 1), torch.tensor(tl),
                           ignore_index=-1)
    np.testing.assert_allclose(float(ours), float(want), rtol=1e-5)

    # label-smoothed obj_cls_loss
    ol = rng.randn(2, 4, 15).astype(np.float32)
    lab = rng.randint(0, 15, (2, 4))
    mask = np.ones((2, 4))
    ours = L.obj_cls_loss({"obj_logits": jnp.asarray(ol),
                           "obj_labels": jnp.asarray(lab),
                           "obj_masks": jnp.asarray(mask)})
    tce = F.cross_entropy(torch.tensor(ol).permute(0, 2, 1), torch.tensor(lab),
                          reduction="none", label_smoothing=0.3) * torch.tensor(mask)
    want = tce.sum() / torch.tensor(mask).sum()
    np.testing.assert_allclose(float(ours), float(want), rtol=1e-5)

    # answer BCE
    sc = rng.randn(3, 11).astype(np.float32)
    al = (rng.rand(3, 11) > 0.7).astype(np.float32)
    ours = L.answer_loss({"answer_scores": jnp.asarray(sc),
                          "answer_label": jnp.asarray(al)})
    want = F.binary_cross_entropy_with_logits(
        torch.tensor(sc), torch.tensor(al), reduction="sum") / 3
    np.testing.assert_allclose(float(ours), float(want), rtol=1e-5)


def test_contrastive_losses():
    from sceneverse_tpu.optim.loss.contra_loss import (
        TextObjBetweenBatch, TextObjWithinBatch, TextSceneBetweenBatch)

    cfg = Config({"num_gpu": 1, "task": "Pretrain"})
    rng = np.random.RandomState(0)
    B, O, D = 8, 5, 16
    dd = {
        "intra_obj_embeds": jnp.asarray(rng.randn(B, O, D).astype(np.float32)),
        "intra_text_embed": jnp.asarray(rng.randn(B, D).astype(np.float32)),
        "inter_obj_embeds": jnp.asarray(rng.randn(B, O, D).astype(np.float32)),
        "inter_text_embed": jnp.asarray(rng.randn(B, D).astype(np.float32)),
        "scene_embed": jnp.asarray(rng.randn(B, D).astype(np.float32)),
        "scene_text_embed": jnp.asarray(rng.randn(B, D).astype(np.float32)),
        "tgt_object_id": jnp.asarray(rng.randint(0, O, (B, 1))),
        "obj_masks": jnp.ones((B, O), bool),
    }
    for cls in (TextObjWithinBatch, TextObjBetweenBatch, TextSceneBetweenBatch):
        val = cls(cfg)(dd)
        assert np.isfinite(float(val)), cls.__name__

    # perfect alignment should give a much lower between-batch loss
    aligned = dict(dd)
    feats = rng.randn(B, D).astype(np.float32)
    objs = np.tile(feats[:, None], (1, O, 1)).astype(np.float32)
    aligned["inter_obj_embeds"] = jnp.asarray(objs)
    aligned["inter_text_embed"] = jnp.asarray(feats)
    low = float(TextObjBetweenBatch(cfg)(aligned))
    high = float(TextObjBetweenBatch(cfg)(dd))
    assert low < high


def test_warmup_cosine_matches_reference_formula():
    import math

    def ref(step, warmup, total, minimum_ratio=1e-5):
        if step <= warmup and warmup > 0:
            return step / warmup
        return max(0.5 * (1 + math.cos((step - warmup) / (total - warmup) * math.pi)),
                   minimum_ratio)

    for step in [0, 1, 5, 10, 57, 99, 100]:
        got = float(warmup_cosine(step, 10, 100, minimum_ratio=0.1))
        np.testing.assert_allclose(got, ref(step, 10, 100, 0.1), rtol=1e-5)


def test_build_optim_groups_and_freeze():
    cfg = tiny_gps_cfg(freeze=True)
    cfg.model.vision.args.hidden_size = HID
    model = build_model(cfg, rngs=nnx.Rngs(0))
    model.train()
    loss_mod, tx, schedule, group_info = build_optim(cfg, model, total_steps=100)
    params = nnx.state(model, nnx.Param)
    opt_state = tx.init(params)

    batch = gps_batch(B=2, O=3, P=32)

    def loss_fn(model):
        out = model(batch)
        total, _ = loss_mod(out)
        return total

    grads = nnx.grad(loss_fn)(model)
    g = nnx.state(grads, nnx.Param)
    # at step 0 the warmup schedule gives lr == 0 (reference LambdaLR
    # semantics: lambda(0) = 0/warmup); step twice and inspect step 2.
    updates, opt_state = tx.update(g, opt_state, params)
    updates, _ = tx.update(g, opt_state, params)

    flat = jax.tree_util.tree_flatten_with_path(updates)[0]
    frozen_all_zero, some_nonzero = True, False
    for path, leaf in flat:
        names = [str(getattr(p, "key", p)) for p in path]
        arr = np.asarray(leaf)
        if names[:2] == ["point_encoder", "point_feature_extractor"]:
            frozen_all_zero &= bool((arr == 0).all())
        if names[0] == "lang_encoder":
            some_nonzero |= bool((arr != 0).any())
    assert frozen_all_zero, "frozen backbone received updates"
    assert some_nonzero, "lang encoder got no updates"
    assert float(schedule(0)) == 0.0 and float(schedule(5)) == 1.0


def test_remat_towers_exact_equivalence():
    """cfg.model.remat wraps the towers in nnx.remat (jax.checkpoint):
    losses and grads must match the non-remat model to float-reassociation
    tolerance (the checkpoint boundary changes XLA fusion decisions, so
    bit-exactness is not guaranteed, but remat never approximates)."""
    import jax
    from __graft_entry__ import _gps_batch, _gps_cfg
    from sceneverse_tpu.optim.build import build_optim

    batch = _gps_batch(2, 6, 64, 8, cap_len=8)

    def run(remat):
        cfg = _gps_cfg(hidden=48, layers=1, num_obj=6, num_points=64,
                       seq_len=8, vocab=128)
        cfg.model.language.args.num_attention_heads = 4
        cfg.model.vision.args.num_attention_heads = 4
        cfg.model.grounding.args.num_attention_heads = 4
        if remat:
            cfg.model.remat = True
        model = build_model(cfg, rngs=nnx.Rngs(7))
        model.train()
        loss_mod, _, _, _ = build_optim(cfg, model, total_steps=10)

        def loss_fn(model):
            total, _ = loss_mod(model(dict(batch)))
            return total

        total, grads = nnx.value_and_grad(loss_fn)(model)
        return float(total), jax.tree_util.tree_leaves(nnx.to_pure_dict(grads))

    t0, g0 = run(False)
    t1, g1 = run(True)
    np.testing.assert_allclose(t0, t1, rtol=1e-5)
    assert len(g0) == len(g1)
    for a, b in zip(g0, g1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-5)


def test_cross_entropy_lean_vjp_matches_naive():
    """cross_entropy's memory-lean custom VJP (loss.py): forward bit-identical
    to the naive f32 log_softmax formula; gradients match its autodiff within
    float rounding — incl. label smoothing, bf16 logits, and torch-style
    ignored labels (out-of-range, masked by zero cotangent)."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from sceneverse_tpu.optim.loss.loss import cross_entropy

    def naive(logits, labels, s=0.0):
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        safe = jnp.clip(labels, 0, logits.shape[-1] - 1)
        nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
        if s > 0.0:
            nll = (1.0 - s) * nll + s * -jnp.mean(logp, axis=-1)
        return nll

    rng = np.random.default_rng(7)
    logits = jnp.asarray(rng.normal(size=(4, 6, 97)).astype(np.float32) * 4)
    labels = jnp.asarray(rng.integers(-1, 97, size=(4, 6)))  # -1 = ignored
    mask = (labels >= 0).astype(jnp.float32)

    for s in (0.0, 0.1):
        for dt in (jnp.float32, jnp.bfloat16):
            lg = logits.astype(dt)
            got = cross_entropy(lg, labels, s)
            want = naive(lg, labels, s)
            # lse − picked formulation: equals the log_softmax form up to
            # float op-ordering (see loss.py _ce_values)
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       atol=1e-5, rtol=1e-6)

            f_got = lambda x: jnp.sum(cross_entropy(x, labels, s) * mask)
            f_want = lambda x: jnp.sum(naive(x, labels, s) * mask)
            g_got = jax.grad(f_got)(lg)
            g_want = jax.grad(f_want)(lg)
            assert g_got.dtype == lg.dtype
            tol = 1e-6 if dt == jnp.float32 else 1e-2
            np.testing.assert_allclose(
                np.asarray(g_got, np.float32), np.asarray(g_want, np.float32),
                atol=tol, rtol=tol)


def test_lm_max_predictions_exact_equivalence():
    """model.lm_max_predictions=K gathers the masked text positions before
    the LM head (openvocab.py _lm_head_inputs). When every sequence has
    <= K masked positions this is EXACT: loss, grads, and PretrainEval's
    lang_cls_acc_mask match the full-sequence path (the gather carries each
    masked position exactly once; the per-row head math is row-independent)."""
    import jax
    from __graft_entry__ import _gps_batch, _gps_cfg
    from sceneverse_tpu.evaluator.pretrain_eval import PretrainEval
    from sceneverse_tpu.optim.build import build_optim

    K = 4
    batch = _gps_batch(3, 6, 64, 12, cap_len=8, vocab=128, seed=3)
    # trim rows to <= K masked positions (keep the first K) so the gathered
    # path is exactly equivalent
    labels = np.asarray(batch["masked_lm_labels"]).copy()
    for row in labels:
        hit = np.flatnonzero(row != -1)
        row[hit[K:]] = -1
    assert (labels != -1).any() and (labels != -1).sum(1).max() <= K
    batch["masked_lm_labels"] = jnp.asarray(labels)

    def run(k):
        cfg = _gps_cfg(hidden=48, layers=1, num_obj=6, num_points=64,
                       seq_len=12, vocab=128)
        cfg.model.language.args.num_attention_heads = 4
        cfg.model.vision.args.num_attention_heads = 4
        cfg.model.grounding.args.num_attention_heads = 4
        if k:
            cfg.model.lm_max_predictions = k
        model = build_model(cfg, rngs=nnx.Rngs(7))
        model.train()
        loss_mod, _, _, _ = build_optim(cfg, model, total_steps=10)

        def loss_fn(model):
            total, _ = loss_mod(model(dict(batch)))
            return total

        total, grads = nnx.value_and_grad(loss_fn)(model)
        model.eval()
        out = model(dict(batch))
        assert out["txt_lm_cls_logits"].shape[1] == (k or 12)
        metrics = PretrainEval(Config({}), None).batch_metrics(out)
        return (float(total),
                jax.tree_util.tree_leaves(nnx.to_pure_dict(grads)),
                float(metrics["lang_cls_acc_mask"]))

    t0, g0, acc0 = run(0)
    t1, g1, acc1 = run(K)
    np.testing.assert_allclose(t0, t1, rtol=1e-6)
    np.testing.assert_allclose(acc0, acc1, rtol=1e-6)
    assert len(g0) == len(g1)
    for a, b in zip(g0, g1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def test_split_scene_cap_tower_equivalence():
    """model.split_scene_cap_tower runs utterances and scene captions as two
    natural-length tower calls instead of one padded concat call — padded
    positions are exactly masked in both, so model outputs match."""
    import jax
    from __graft_entry__ import _gps_batch, _gps_cfg

    batch = _gps_batch(2, 6, 64, 8, cap_len=12)

    def run(split):
        cfg = _gps_cfg(hidden=48, layers=1, num_obj=6, num_points=64,
                       seq_len=8, vocab=128)
        cfg.model.language.args.num_attention_heads = 4
        cfg.model.vision.args.num_attention_heads = 4
        cfg.model.grounding.args.num_attention_heads = 4
        if split:
            cfg.model.split_scene_cap_tower = True
        model = build_model(cfg, rngs=nnx.Rngs(7))
        model.eval()
        out = model(dict(batch))
        return out["og3d_logits"], out["scene_text_embed"], out["txt_lm_cls_logits"]

    for a, b in zip(run(False), run(True)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)


def test_lm_max_predictions_perscene_3d_labels():
    """The masked-position gather handles the per-scene variant, where
    language runs at (B*L, T, D) and masked_lm_labels arrives (B, L, T)."""
    cfg = tiny_gps_cfg()
    cfg.model.name = "OpenVocabPerScene"
    cfg.model.lm_max_predictions = 3
    model = build_model(cfg, rngs=nnx.Rngs(0))
    model.eval()
    b = gps_batch()
    B, Lsent, T = 2, 3, 7
    r = np.random.RandomState(1)
    b["txt_ids"] = jnp.asarray(r.randint(0, 100, (B, Lsent, T)))
    b["txt_masks"] = jnp.ones((B, Lsent, T), jnp.int32)
    b["tgt_object_id"] = jnp.asarray(r.randint(0, 5, (B, Lsent)))
    labels = np.full((B, Lsent, T), -1)
    labels[:, :, 2] = r.randint(0, 100, (B, Lsent))  # 1 masked pos per sent
    b["masked_lm_labels"] = jnp.asarray(labels)
    out = model(b)
    assert out["txt_lm_cls_logits"].shape == (B * Lsent, 3, 100)
    assert out["masked_lm_labels"].shape == (B * Lsent, 3)
    got = np.asarray(out["masked_lm_labels"])
    # first gathered slot is the masked position's label, rest are -1 pads
    np.testing.assert_array_equal(got[:, 0], labels[:, :, 2].reshape(-1))
    assert (got[:, 1:] == -1).all()


def test_ln_bf16_output_knob(monkeypatch):
    """SCENEVERSE_LN_BF16=on casts LayerNorm outputs (NOT their f32
    mean/var stats — flax _compute_stats always promotes to f32) to bf16
    under enable_mixed_precision; model outputs stay close to the f32-LN
    mixed-precision baseline."""
    from sceneverse_tpu.utils.precision import enable_mixed_precision

    def run(mode):
        monkeypatch.setenv("SCENEVERSE_LN_BF16", mode)
        cfg = tiny_gps_cfg()
        model = build_model(cfg, rngs=nnx.Rngs(0))
        model.eval()
        enable_mixed_precision(model)
        ln_dtypes = {m.dtype for _, m in nnx.iter_graph(model)
                     if isinstance(m, nnx.LayerNorm)}
        want = jnp.bfloat16 if mode == "on" else jnp.float32
        assert ln_dtypes == {want}
        return model(gps_batch())

    off = run("off")
    on = run("on")
    for k in ("og3d_logits", "txt_lm_cls_logits"):
        a, b = np.asarray(off[k], np.float32), np.asarray(on[k], np.float32)
        assert np.isfinite(b).all()
        np.testing.assert_allclose(a, b, rtol=0.1, atol=0.15)


def test_bn_bf16_output_knob(monkeypatch):
    """SCENEVERSE_BN_BF16=on casts live BatchNorm outputs to bf16 (stats
    stay f32) in the trainable-vision configuration; running stats still
    update in f32 and train-mode outputs stay close."""
    from sceneverse_tpu.utils.precision import enable_mixed_precision

    def run(mode):
        monkeypatch.setenv("SCENEVERSE_BN_BF16", mode)
        cfg = tiny_gps_cfg(freeze=False)
        model = build_model(cfg, rngs=nnx.Rngs(0))
        model.train()
        enable_mixed_precision(model)
        bn = [m for _, m in nnx.iter_graph(model)
              if isinstance(m, nnx.BatchNorm)]
        assert bn
        want = jnp.bfloat16 if mode == "on" else jnp.float32
        assert {m.dtype for m in bn} == {want}
        out = model(gps_batch())
        assert all(m.mean.value.dtype == jnp.float32 for m in bn)
        return out

    off = run("off")
    on = run("on")
    a = np.asarray(off["og3d_logits"], np.float32)
    b = np.asarray(on["og3d_logits"], np.float32)
    assert np.isfinite(b).all()
    np.testing.assert_allclose(a, b, rtol=0.15, atol=0.25)
