"""Coverage for auxiliary utilities: mixup schedules, caption vocabulary,
HM3D semantic mapper, and the gated scan-feature hooks."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sceneverse_tpu.data.data_utils import Vocabulary, random_caption_word
from sceneverse_tpu.modules.utils import (
    AllMixup,
    LinearDecayMixup,
    get_mixup_function,
)


def test_all_mixup_onehots_labelled_objects():
    mix = get_mixup_function("all_mixup")
    pred = jnp.full((2, 3, 5), 0.2)
    labels = jnp.array([[0, 2, -100], [4, -100, 1]])
    out = mix(pred, labels)
    assert out.shape == pred.shape
    np.testing.assert_allclose(out[0, 0], jax.nn.one_hot(0, 5))
    np.testing.assert_allclose(out[1, 0], jax.nn.one_hot(4, 5))
    np.testing.assert_allclose(out[0, 2], jnp.zeros(5))  # unlabeled → zeros


def test_linear_decay_mixup_schedule():
    mix = get_mixup_function("linear_decay", 0.2, 0.8)
    pred = jnp.full((1, 4, 5), 0.2)
    labels = jnp.zeros((1, 4), dtype=jnp.int32)
    key = jax.random.PRNGKey(0)
    early = mix(pred, labels, cur_step=0, total_steps=100, rng_key=key)
    late = mix(pred, labels, cur_step=100, total_steps=100, rng_key=key)
    # ratio 1.0 early → every labelled object one-hot; 0.0 late → untouched
    np.testing.assert_allclose(early[0, 0], jax.nn.one_hot(0, 5))
    np.testing.assert_allclose(late, pred)
    assert get_mixup_function(None) is None


def test_vocabulary_roundtrip(tmp_path):
    vocab = Vocabulary()
    for tok, bid in [("[EOS]", 102), ("chair", 300), ("table", 301)]:
        vocab.add_token(tok, bid)
    assert vocab.token_to_id("chair") == 1
    assert vocab.id_to_token(2) == "table"
    assert vocab.id_to_bert_id(0) == 102
    path = str(tmp_path / "vocab.npz")
    vocab.save_vocab(path)
    loaded = Vocabulary(path)
    assert loaded.token_to_id("table") == 2
    assert len(loaded) == 3


def test_random_caption_word_masks_sep_to_eos():
    class Tok:
        cls_token_id, sep_token_id, mask_token_id = 101, 102, 103

        def decode(self, ids):
            return f"w{ids[0]}"

    vocab = Vocabulary()
    vocab.add_token("[EOS]", 102)
    vocab.add_token("w7", 7)
    tokens = np.array([101, 7, 102, 0])
    mask = np.array([1, 1, 1, 0])
    rng = np.random.RandomState(0)
    out, labels = random_caption_word(tokens, mask, Tok(), vocab, 1.0, rng=rng)
    assert labels[0] == -1  # CLS never masked
    assert out[1] == 103 and labels[1] == vocab.token_to_id("w7")
    assert out[2] == 103 and labels[2] == vocab.token_to_id("[EOS]")
    assert labels[3] == -1  # padding


def test_hm_semantic_mapper(tmp_path):
    from sceneverse_tpu.preprocess.hm_semantic import scene_proc

    scene = tmp_path / "00001-abcdef"
    scene.mkdir()
    (scene / "abcdef.semantic.txt").write_text(
        "HM3D Semantic Annotations\n"
        '1,FF0000,"chair",\n'
        '2,00FF00,"table",\n'
        '3,FF,"lamp",\n'  # short hex → zero-padded
    )
    out = scene_proc(str(scene))
    mapping = json.load(open(out))
    pairs = {tuple(v) for v in mapping.values()}
    assert pairs == {(1, "chair"), (2, "table"), (3, "lamp")}


def test_multiview_gate_raises(tmp_path):
    from sceneverse_tpu.config import Config
    from sceneverse_tpu.data.build import DATASET_REGISTRY
    from sceneverse_tpu.data.fixture import write_synthetic_tree

    root = write_synthetic_tree(tmp_path / "sv", n_scans=1)
    cfg = Config({
        "data": {
            "train": ["ScanNetSpatialRefer"], "load_multiview_info": True,
            "scan_family_base": str(root),
            "args": {"max_obj_len": 6, "max_seq_len": 16, "num_points": 32,
                     "pc_type": "gt", "sem_type": "607", "filter_lang": False,
                     "rot_aug": False},
            "ScanNetSpatialRefer": {"train": {"sources": ["referit3d"],
                                              "referit3d": {"anno_type": ["nr3d"]}}},
        },
        "debug": {"flag": False},
    })
    with pytest.raises(NotImplementedError, match="multiview"):
        DATASET_REGISTRY.get("ScanNetSpatialRefer")(cfg, "train")


def test_configure_default_prng(monkeypatch):
    """utils/prng.configure_default_prng: env override wins; default is
    threefry off-TPU (bit-stable CPU test draws) and rbg on TPU."""
    import jax

    from sceneverse_tpu.utils.prng import configure_default_prng

    orig = jax.config.jax_default_prng_impl
    try:
        monkeypatch.setenv("SCENEVERSE_PRNG_IMPL", "rbg")
        assert configure_default_prng() == "rbg"
        k = jax.random.key(0)
        assert "rbg" in str(jax.random.key_impl(k))
        monkeypatch.delenv("SCENEVERSE_PRNG_IMPL")
        impl = configure_default_prng()
        want = "rbg" if jax.default_backend() == "tpu" else "threefry2x32"
        assert impl == want
    finally:
        jax.config.update("jax_default_prng_impl", orig)
