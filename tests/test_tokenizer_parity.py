"""Tokenizer parity vs HF BertTokenizer (VERDICT round-1 item 8).

The reference tokenizes with HF ``BertTokenizer('bert-base-uncased')``
(reference modules/language/bert.py:12-14, used by the dataset wrappers at
reference data/datasets/dataset_wrapper.py:33-54). No vocab.txt ships in
this environment, so parity is proven on a constructed vocab file: both
tokenizers run the same BasicTokenizer+WordPiece pipeline, so identical ids
on the edge-case corpus ⇒ identical ids on the real vocab.
"""

import numpy as np
import pytest
from transformers import BertTokenizer

from sceneverse_tpu.data.tokenizer import WordPieceTokenizer

WORDS = [
    "the", "a", "an", "chair", "chairs", "table", "desk", "on", "next",
    "to", "left", "right", "of", "it", "s", "is", "brown", "wooden",
    "arm", "##chair", "##s", "cafe", "near", "big", "door", "window",
    "trash", "can", "in", "corner", "room", "this", "that", "'", ".",
    ",", "-", "2", "3", "##nd", "wall", "bed", "under", "lamp",
    "she", "##lf", "upper", "lower", "between", "two",
]


@pytest.fixture(scope="module")
def vocab_file(tmp_path_factory):
    path = tmp_path_factory.mktemp("tok") / "vocab.txt"
    tokens = ["[PAD]"] + [f"[unused{i}]" for i in range(99)] + [
        "[UNK]", "[CLS]", "[SEP]", "[MASK]"] + WORDS
    path.write_text("\n".join(tokens) + "\n")
    return str(path)


CORPUS = [
    # ScanRefer-style utterances
    "the brown wooden chair next to the table",
    "this is a trash can. it is in the corner of the room.",
    "the 2nd chair on the left of the desk",
    "an armchair near the big window",
    # apostrophes are punctuation in BERT: it's -> it ' s
    "it's the chair on the desk's left",
    # accents are stripped under do_lower_case (strip_accents=None default)
    "café chair near the désk",
    # CJK chars get isolated (tokenize_chinese_chars=True)
    "the 椅子 next to the desk",
    # control chars / weird whitespace cleaned; NFC normalization
    "the\tchair on  the\nleft\x00�",
    "café chair",  # e + combining acute -> NFC e-acute -> stripped
    # never-split special tokens inside text
    "the chair [SEP] the table",
    # unknown word -> [UNK]; >100-char word -> [UNK]
    "the zxqv chair",
    "the " + "a" * 120 + " chair",
    # punctuation runs, hyphens, casing
    "THE CHAIR, NEXT-TO THE TABLE!!",
    "",
    "   ",
]


def test_encode_matches_hf(vocab_file):
    hf = BertTokenizer(vocab_file, do_lower_case=True)
    ours = WordPieceTokenizer(vocab_file)
    for text in CORPUS:
        for max_len in (8, 16, 50):
            enc = hf(text, padding="max_length", truncation=True,
                     max_length=max_len)
            ids, mask = ours.encode(text, max_len)
            assert ids.tolist() == enc["input_ids"], (text, max_len)
            assert mask.tolist() == enc["attention_mask"], (text, max_len)


def test_batch_encode_matches_hf(vocab_file):
    hf = BertTokenizer(vocab_file, do_lower_case=True)
    ours = WordPieceTokenizer(vocab_file)
    enc = hf(CORPUS, padding="max_length", truncation=True, max_length=24)
    ids, mask = ours.batch_encode(CORPUS, 24)
    np.testing.assert_array_equal(ids, np.asarray(enc["input_ids"]))
    np.testing.assert_array_equal(mask, np.asarray(enc["attention_mask"]))
