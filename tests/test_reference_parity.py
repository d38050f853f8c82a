"""Full-model forward parity vs the ACTUAL reference code (VERDICT r2 item 3).

Earlier parity tests hand-reconstructed the torch modules; these import the
reference's own files from /root/reference (torch + einops only — both in the
image) and assert numerical parity after checkpoint conversion:

  * reference model/openvocab.py:26-101 ``OpenVocab`` full forward (language +
    unified encoder + ground/qa/pretrain heads) vs our NNX ``OpenVocab``;
  * reference modules/grounding/unified_encoder.py:12-58
    ``EntitySpatialCrossEncoder`` (TransformerSpatialDecoderLayer 'cond') vs
    our grounding module.

The vision tower is excluded (CUDA extension, not importable here): both
models get the same injected object features through a vision module
registered for the test. The reference's HF ``from_pretrained`` language
wrapper is substituted by the same HF ``BertModel`` built from config
(random weights — the architecture is identical, only the weight download is
bypassed). Two environment shims are required to execute the reference code
on CPU: a minimal ``fvcore.common.registry.Registry`` (fvcore not in image)
and a no-op ``torch.Tensor.cuda`` (unified_encoder.py:157,162 call
``.cuda()`` inside forward).
"""

import sys
import types

import numpy as np
import pytest

REF = "/root/reference"

B, L, O, HID, HEADS, FF, LAYERS = 2, 8, 5, 32, 4, 64, 2
SEM, VOCAB, N_ANSWERS, DIM_LOC = 13, 30522, 7, 6


class _NS:
    """Attribute namespace with OmegaConf-ish .get (reference cfg access)."""

    def __init__(self, **kw):
        self.__dict__.update(kw)

    def get(self, k, d=None):
        return self.__dict__.get(k, d)


class _Registry:
    """Minimal stand-in for fvcore.common.registry.Registry."""

    def __init__(self, name):
        self._name = name
        self._map = {}

    def register(self, obj=None):
        if obj is None:
            def deco(o):
                self._map[o.__name__] = o
                return o
            return deco
        self._map[obj.__name__] = obj
        return obj

    def get(self, name):
        return self._map[name]

    def __contains__(self, name):
        return name in self._map


@pytest.fixture(scope="module")
def ref():
    """Import the reference packages with fvcore/omegaconf stubs installed."""
    import torch

    saved_modules = dict(sys.modules)
    saved_path = list(sys.path)
    saved_cuda = torch.Tensor.cuda

    fv = types.ModuleType("fvcore")
    fvc = types.ModuleType("fvcore.common")
    fvr = types.ModuleType("fvcore.common.registry")
    fvr.Registry = _Registry
    fv.common, fvc.registry = fvc, fvr
    common = types.ModuleType("common")
    # resolve UN-stubbed submodules (e.g. common.box_utils, needed by
    # scanqa_eval) from the real reference package; the explicitly stubbed
    # ones below win via sys.modules
    common.__path__ = [REF + "/common"]
    tu = types.ModuleType("common.type_utils")
    tu.cfg2dict = lambda c: dict(c)
    du = types.ModuleType("common.dist_utils")
    du.all_gather = lambda x: x
    # evaluator/build.py deps: gather_dict (single-process -> identity) and
    # omegaconf.open_dict (not in image; plain no-op context manager)
    mi = types.ModuleType("common.misc")
    mi.gather_dict = lambda accelerator, d: d
    oc = types.ModuleType("omegaconf")
    import contextlib
    oc.open_dict = contextlib.nullcontext
    # reference data/build.py does `from omegaconf import OmegaConf` at
    # import time (pulled in transitively by evaluator/__init__ ->
    # scanqa_eval -> data.data_utils); only the name needs to exist
    oc.OmegaConf = type("OmegaConf", (), {})
    oc.DictConfig = dict
    common.type_utils, common.dist_utils, common.misc = tu, du, mi
    # the CUDA pointnet2 extension is not importable on this host; stub the
    # module so `modules.layers.pointnet` (imported transitively via
    # model/__init__) loads — the test injects vision features instead
    pn2 = types.ModuleType("modules.third_party.pointnet2.pointnet2_modules")
    pn2.PointnetSAModule = type("PointnetSAModule", (), {})
    # import-time-only deps of the reference data/ chain (pulled in by
    # evaluator/__init__ -> scanqa_eval -> data.data_utils): none of the
    # stubs are exercised — the test feeds tensors straight to the evaluator
    jl = types.ModuleType("jsonlines")
    jl.open = lambda *a, **k: (_ for _ in ()).throw(
        RuntimeError("jsonlines stub"))
    alb = types.ModuleType("albumentations")
    alb.Compose = type("Compose", (), {})
    vol = types.ModuleType("volumentations")
    vol.Compose = type("Compose", (), {})
    sys.modules.update({
        "fvcore": fv, "fvcore.common": fvc, "fvcore.common.registry": fvr,
        "common": common, "common.type_utils": tu, "common.dist_utils": du,
        "common.misc": mi, "omegaconf": oc,
        "jsonlines": jl, "albumentations": alb, "volumentations": vol,
        "modules.third_party.pointnet2.pointnet2_modules": pn2,
        # model/objcls.py imports the OpenAI `clip` package (not in image);
        # only module presence is needed at import time
        "clip": types.ModuleType("clip"),
    })
    sys.path.insert(0, REF)
    torch.Tensor.cuda = lambda self, *a, **k: self
    try:
        import modules.build as ref_build
        import modules.layers.transformers as ref_tf
        import modules.grounding.unified_encoder as ref_ue  # noqa: F401
        import modules.heads.grounding_head  # noqa: F401
        import modules.heads.pretrain_head  # noqa: F401
        import modules.heads.qa_head  # noqa: F401
        import model.openvocab as ref_ov

        yield types.SimpleNamespace(build=ref_build, tf=ref_tf, ov=ref_ov,
                                    torch=torch)
    finally:
        torch.Tensor.cuda = saved_cuda
        sys.path[:] = saved_path
        for name, mod in list(sys.modules.items()):
            if name in saved_modules:
                continue
            # Purge ONLY our stubs and modules loaded from the reference
            # tree. Deleting every new module also evicts lazily imported
            # torch.* submodules, and re-importing those re-runs global
            # TORCH_LIBRARY registrations (c10d_functional), which crashes
            # any later `import transformers` in the same process.
            top = name.split(".")[0]
            from_ref = str(getattr(mod, "__file__", "")).startswith(REF)
            if from_ref or top in (
                "fvcore", "common", "modules", "model", "clip",
                "data", "optim", "evaluator", "trainer", "preprocess",
            ):
                del sys.modules[name]


def _register_injected_vision(ref, feats, pre, logits):
    import torch
    import torch.nn as tnn

    reg = ref.build.VISION_REGISTRY
    if "InjectedVision" not in reg:
        class InjectedVision(tnn.Module):
            def __init__(self, cfg, **kw):
                super().__init__()

            def forward(self, obj_fts, obj_locs, obj_masks, obj_sem_masks,
                        obj_labels, cur_step, total_steps):
                return self._feats, self._pre, self._logits
        reg.register(InjectedVision)
    mod = reg.get("InjectedVision")
    t = lambda a: torch.tensor(np.asarray(a))
    mod._feats, mod._pre, mod._logits = t(feats), t(pre), t(logits)
    return mod


def _register_ref_bert(ref):
    import torch.nn as tnn
    from transformers import BertConfig as HFBertConfig, BertModel as HFBert

    reg = ref.build.LANGUAGE_REGISTRY
    if "RandomBERTLanguageEncoder" in reg:
        return

    class RandomBERTLanguageEncoder(tnn.Module):
        """reference modules/language/bert.py:7-26 minus from_pretrained:
        same HF BertModel architecture, random weights."""

        def __init__(self, cfg, hidden_size=768, num_hidden_layers=4,
                     num_attention_heads=12, type_vocab_size=2):
            super().__init__()
            self.model = HFBert(HFBertConfig(
                hidden_size=hidden_size, num_hidden_layers=num_hidden_layers,
                num_attention_heads=num_attention_heads,
                type_vocab_size=type_vocab_size,
                hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0))

        def forward(self, txt_ids, txt_masks, **kwargs):
            return self.model(txt_ids, txt_masks).last_hidden_state

    reg.register(RandomBERTLanguageEncoder)


def _jax_injected_vision(feats, pre, logits):
    import jax.numpy as jnp
    from flax import nnx

    from sceneverse_tpu.modules.build import VISION_REGISTRY

    if "InjectedVision" not in VISION_REGISTRY:
        class InjectedVision(nnx.Module):
            def __init__(self, cfg, **kw):
                pass

            def __call__(self, obj_fts, obj_locs, obj_masks, obj_sem_masks,
                         obj_labels=None):
                cls = type(self)
                return cls._feats, cls._pre, cls._logits
        VISION_REGISTRY.register(InjectedVision)
    mod = VISION_REGISTRY.get("InjectedVision")
    mod._feats = jnp.asarray(feats)
    mod._pre = jnp.asarray(pre)
    mod._logits = jnp.asarray(logits)


def _ref_cfg(head_list):
    lang_args = {"hidden_size": HID, "num_hidden_layers": LAYERS,
                 "num_attention_heads": HEADS}
    ue_args = {"hidden_size": HID, "num_attention_heads": HEADS,
               "num_layers": LAYERS, "dim_feedforward": FF,
               "dim_loc": DIM_LOC}
    heads = {
        "ground_head": _NS(name="GroundHeadV1",
                           args={"input_size": HID, "hidden_size": HID,
                                 "sem_cls_size": SEM, "dropout": 0.0}),
        "qa_head": _NS(name="QAHeadV1",
                       args={"hidden_size": HID, "mlp_size": 16,
                             "glimpse": 1, "flat_out_size": 24,
                             "num_answers": N_ANSWERS}),
        "pretrain_head": _NS(name="OVPretrainHead",
                             args={"hidden_size": HID, "vocab_size": VOCAB,
                                   "obj_vocab_size": SEM}),
    }
    return _NS(
        model=_NS(
            name="OpenVocab", inter="before",
            language=_NS(name="RandomBERTLanguageEncoder", args=lang_args),
            vision=_NS(name="InjectedVision", args={}),
            grounding=_NS(name="UnifiedSpatialCrossEncoderV2", args=ue_args),
            heads=_NS(head_list=list(head_list),
                      **{k: heads[k] for k in head_list}),
        ),
        data=_NS(args={}),
    )


def _my_cfg(head_list):
    from sceneverse_tpu.config import Config

    heads = {
        "ground_head": {"name": "GroundHeadV1",
                        "args": {"input_size": HID, "hidden_size": HID,
                                 "sem_cls_size": SEM, "dropout": 0.0}},
        "qa_head": {"name": "QAHeadV1",
                    "args": {"hidden_size": HID, "mlp_size": 16,
                             "glimpse": 1, "flat_out_size": 24,
                             "num_answers": N_ANSWERS}},
        "pretrain_head": {"name": "OVPretrainHead",
                          "args": {"hidden_size": HID, "vocab_size": VOCAB,
                                   "obj_vocab_size": SEM}},
    }
    return Config({
        "solver": {"lr": 1e-4},
        "data": {"args": {}},
        "model": {
            "name": "OpenVocab", "inter": "before",
            "language": {"name": "BERTLanguageEncoder",
                         "args": {"hidden_size": HID,
                                  "num_hidden_layers": LAYERS,
                                  "num_attention_heads": HEADS}},
            "vision": {"name": "InjectedVision", "args": {}},
            "grounding": {"name": "UnifiedSpatialCrossEncoderV2",
                          "args": {"hidden_size": HID,
                                   "num_attention_heads": HEADS,
                                   "num_layers": LAYERS,
                                   "dim_feedforward": FF,
                                   "dim_loc": DIM_LOC}},
            "heads": {"head_list": list(head_list),
                      **{k: heads[k] for k in head_list}},
        },
    })


def _inputs(rng):
    ids = rng.randint(1, VOCAB, (B, L))
    txt_masks = np.ones((B, L), bool)
    txt_masks[0, -2:] = False
    obj_masks = np.ones((B, O), bool)
    obj_masks[1, -1] = False
    return {
        "txt_ids": ids,
        "txt_masks": txt_masks,
        "obj_fts": rng.randn(B, O, 16, 6).astype(np.float32),
        "obj_locs": rng.randn(B, O, DIM_LOC).astype(np.float32),
        "obj_masks": obj_masks,
        "obj_sem_masks": np.ones((B, O), bool),
        "obj_labels": rng.randint(0, SEM, (B, O)),
    }


def test_full_model_forward_parity_vs_reference(ref):
    import jax.numpy as jnp
    import torch
    from flax import nnx

    import sceneverse_tpu.model  # noqa: F401  (registry population)
    from sceneverse_tpu.ckpt.convert import (apply_to_model,
                                             convert_torch_state_dict)
    from sceneverse_tpu.model.build import MODEL_REGISTRY

    rng = np.random.RandomState(0)
    feats = rng.randn(B, O, HID).astype(np.float32)
    pre = rng.randn(B, O, HID).astype(np.float32)
    raw_logits = rng.randn(B, O, SEM).astype(np.float32)

    head_list = ["ground_head", "qa_head", "pretrain_head"]
    _register_injected_vision(ref, feats, pre, raw_logits)
    _register_ref_bert(ref)
    torch.manual_seed(0)
    ref_model = ref.ov.OpenVocab(_ref_cfg(head_list))
    ref_model.eval()

    _jax_injected_vision(feats, pre, raw_logits)
    mine = MODEL_REGISTRY.get("OpenVocab")(_my_cfg(head_list),
                                           rngs=nnx.Rngs(0))
    mine.eval()

    converted = convert_torch_state_dict(dict(ref_model.state_dict()))
    loaded, missing, unexpected = apply_to_model(mine, converted)
    assert not missing, missing
    # HF pooler exists in the reference tree but is never read
    # (openvocab.py:34 uses last_hidden_state only)
    assert all("pooler" in u for u in unexpected), unexpected
    assert loaded > 50

    data = _inputs(np.random.RandomState(1))
    tdata = {k: torch.tensor(v) for k, v in data.items()}
    with torch.no_grad():
        want = ref_model(dict(tdata))
    got = mine({k: jnp.asarray(v) for k, v in data.items()})

    for key, tol in [
        ("inter_text_embed", 2e-4), ("intra_text_embed", 2e-4),
        ("inter_obj_embeds", 2e-4), ("intra_obj_embeds", 2e-4),
        ("txt_cls_logits", 2e-4), ("obj_cls_post_logits", 2e-4),
        ("obj_cls_pre_logits", 2e-4), ("og3d_logits", 2e-4),
        ("answer_scores", 2e-4), ("txt_lm_cls_logits", 5e-4),
    ]:
        w = want[key].numpy()
        g = np.asarray(got[key])
        assert g.shape == w.shape, (key, g.shape, w.shape)
        np.testing.assert_allclose(g, w, rtol=tol, atol=tol,
                                   err_msg=key)


def test_entity_spatial_cross_encoder_parity_vs_reference(ref):
    """reference modules/grounding/unified_encoder.py:12-58 — the 'cond'
    spatial decoder path — against our grounding module after conversion."""
    import jax.numpy as jnp
    import torch
    from flax import nnx

    import sceneverse_tpu.model  # noqa: F401
    from sceneverse_tpu.ckpt.convert import (apply_to_model,
                                             convert_torch_state_dict)
    from sceneverse_tpu.modules.build import GROUNDING_REGISTRY

    torch.manual_seed(2)
    ref_enc = ref.build.GROUNDING_REGISTRY.get("EntitySpatialCrossEncoder")(
        _NS(args={}), hidden_size=HID, num_attention_heads=HEADS,
        num_layers=LAYERS, dim_loc=DIM_LOC)
    ref_enc.eval()

    mine = GROUNDING_REGISTRY.get("EntitySpatialCrossEncoder")(
        None, hidden_size=HID, num_attention_heads=HEADS,
        num_layers=LAYERS, dim_loc=DIM_LOC, rngs=nnx.Rngs(0))
    mine.eval()
    converted = convert_torch_state_dict(dict(ref_enc.state_dict()))
    loaded, missing, unexpected = apply_to_model(mine, converted)
    assert not missing and not unexpected, (missing, unexpected)

    rng = np.random.RandomState(3)
    txt = rng.randn(B, L, HID).astype(np.float32)
    obj = rng.randn(B, O, HID).astype(np.float32)
    locs = np.abs(rng.randn(B, O, DIM_LOC)).astype(np.float32)
    txt_masks = np.ones((B, L), bool)
    txt_masks[0, -2:] = False
    obj_masks = np.ones((B, O), bool)
    obj_masks[1, -1] = False

    with torch.no_grad():
        want_txt, want_obj = ref_enc(
            torch.tensor(txt), torch.tensor(txt_masks),
            torch.tensor(obj), torch.tensor(locs), torch.tensor(obj_masks))
    got_txt, got_obj = mine(jnp.asarray(txt), jnp.asarray(txt_masks),
                            jnp.asarray(obj), jnp.asarray(locs),
                            jnp.asarray(obj_masks))
    np.testing.assert_allclose(np.asarray(got_txt), want_txt.numpy(),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(got_obj), want_obj.numpy(),
                               rtol=2e-4, atol=2e-4)


def test_spatial_encoder_layer_parity_vs_reference(ref):
    """reference modules/layers/transformers.py:285-316
    ``TransformerSpatialEncoderLayer`` ('cond' fusion) — the vision tower's
    trainable stack (pcd_openvocab_encoder.py:77-88) — against ours after
    conversion. Closes the last reference-import gap besides the CUDA
    PointNet++ backbone itself."""
    import jax.numpy as jnp
    import torch
    from flax import nnx

    from sceneverse_tpu.ckpt.convert import (apply_to_model,
                                             convert_torch_state_dict)
    from sceneverse_tpu.modules.layers.transformers import (
        TransformerSpatialEncoderLayer,
    )

    torch.manual_seed(5)
    ref_layer = ref.tf.TransformerSpatialEncoderLayer(
        HID, HEADS, dim_feedforward=FF, dropout=0.1,
        spatial_dim=5, spatial_attn_fusion="cond")
    ref_layer.eval()

    mine = TransformerSpatialEncoderLayer(
        HID, HEADS, dim_feedforward=FF, dropout=0.1,
        spatial_dim=5, spatial_attn_fusion="cond", rngs=nnx.Rngs(0))
    mine.eval()
    converted = convert_torch_state_dict(dict(ref_layer.state_dict()))
    loaded, missing, unexpected = apply_to_model(mine, converted)
    assert not missing and not unexpected, (missing, unexpected)

    rng = np.random.RandomState(5)
    x = rng.randn(B, O, HID).astype(np.float32)
    locs = rng.randn(B, O, O, 5).astype(np.float32)
    pad = np.zeros((B, O), bool)
    pad[1, -1] = True

    with torch.no_grad():
        want, _ = ref_layer(torch.tensor(x), torch.tensor(locs),
                            tgt_key_padding_mask=torch.tensor(pad))
    got, _ = mine(jnp.asarray(x), jnp.asarray(locs),
                  tgt_key_padding_mask=jnp.asarray(pad))
    np.testing.assert_allclose(np.asarray(got), want.numpy(),
                               rtol=2e-4, atol=2e-4)


def test_scanrefer_evaluator_metrics_parity_vs_reference(ref, tmp_path):
    """Metric-level parity rehearsal (VERDICT r3 item 6): run a fixture
    checkpoint through BOTH full pipelines — reference torch forward +
    reference ``ScanReferEval`` update/record (evaluator/build.py:26-54,
    scanrefer_eval.py:14-87) vs our converted NNX model + our evaluator —
    and assert the final metric dicts agree. This is the path that
    "reproduce reference metrics from converted checkpoints" rests on once
    released checkpoints are available."""
    import jax.numpy as jnp
    import torch
    from flax import nnx

    import sceneverse_tpu.evaluator  # noqa: F401  (registry population)
    import sceneverse_tpu.model  # noqa: F401
    from sceneverse_tpu.ckpt.convert import (apply_to_model,
                                             convert_torch_state_dict)
    from sceneverse_tpu.evaluator.build import get_eval
    from sceneverse_tpu.model.build import MODEL_REGISTRY

    import evaluator.scanrefer_eval as ref_sre  # reference, via fixture path

    rng = np.random.RandomState(3)
    feats = rng.randn(B, O, HID).astype(np.float32)
    pre = rng.randn(B, O, HID).astype(np.float32)
    raw_logits = rng.randn(B, O, SEM).astype(np.float32)

    head_list = ["ground_head"]
    _register_injected_vision(ref, feats, pre, raw_logits)
    _register_ref_bert(ref)
    torch.manual_seed(3)
    ref_model = ref.ov.OpenVocab(_ref_cfg(head_list))
    ref_model.eval()

    _jax_injected_vision(feats, pre, raw_logits)
    mine = MODEL_REGISTRY.get("OpenVocab")(_my_cfg(head_list),
                                           rngs=nnx.Rngs(0))
    mine.eval()
    converted = convert_torch_state_dict(dict(ref_model.state_dict()))
    _, missing, _ = apply_to_model(mine, converted)
    assert not missing, missing

    class _Acc:
        is_main_process = True

    ref_cfg = _NS(eval=_NS(save=False), exp_dir=str(tmp_path / "ref"))
    ref_eval = ref_sre.ScanReferEval(ref_cfg, _Acc())

    from sceneverse_tpu.config import Config

    my_eval = get_eval("ScanReferEval", Config(
        {"eval": {"save": False}, "exp_dir": str(tmp_path / "mine")}))

    for batch_seed in (11, 12, 13):
        brng = np.random.RandomState(batch_seed)
        data = _inputs(brng)
        labels = {
            "tgt_object_id": brng.randint(0, O, (B, 1)),
            "tgt_object_id_iou25": (brng.rand(B, O) < 0.5).astype(np.int64),
            "tgt_object_id_iou50": (brng.rand(B, O) < 0.3).astype(np.int64),
            "is_multiple": brng.rand(B) < 0.5,
            "tgt_object_label": brng.randint(0, SEM, (B, 1)),
        }
        tdata = {k: torch.tensor(v) for k, v in {**data, **labels}.items()}
        with torch.no_grad():
            tout = ref_model(dict(tdata))
        ref_eval.update(tout)

        jdata = {k: jnp.asarray(v) for k, v in {**data, **labels}.items()}
        my_eval.update({**jdata, **mine(jdata)})

    ref_best, ref_metrics = ref_eval.record()
    my_best, my_metrics = my_eval.record()
    assert ref_best == my_best
    assert set(ref_metrics) == set(my_metrics), (
        set(ref_metrics) ^ set(my_metrics))
    for k, v in ref_metrics.items():
        np.testing.assert_allclose(float(my_metrics[k]), float(v), rtol=1e-6,
                                   err_msg=k)
