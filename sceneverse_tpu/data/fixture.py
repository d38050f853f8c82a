"""Synthetic on-disk SceneVerse data tree for tests/debug.

Writes the exact directory layout ScanBase consumes (SURVEY.md §2.6 /
reference DATA.md): per-scan ``.pth`` point clouds + instance maps,
annotation jsons/jsonls, split files and the ScanNet label tsv — so tests
exercise the real loading/matching/cropping code paths, not mocks.
"""

from __future__ import annotations

import json
import os
from pathlib import Path

import numpy as np

CATEGORIES = ["wall", "floor", "ceiling", "chair", "table", "sofa", "bed",
              "lamp", "door", "window"]


def write_synthetic_tree(root, n_scans=3, n_objects=6, pts_per_obj=80,
                         seed=0, prefix="scene"):
    """Create a SceneVerse-format data tree under ``root``. Returns root."""
    import torch

    root = Path(root)
    rng = np.random.RandomState(seed)
    (root / "scan_data/pcd_with_global_alignment").mkdir(parents=True, exist_ok=True)
    (root / "scan_data/instance_id_to_label").mkdir(parents=True, exist_ok=True)
    (root / "annotations/meta_data").mkdir(parents=True, exist_ok=True)
    (root / "annotations/splits").mkdir(parents=True, exist_ok=True)
    (root / "annotations/refer").mkdir(parents=True, exist_ok=True)

    # meta: raw category list + labels tsv
    with open(root / "annotations/meta_data/scannetv2_raw_categories.json", "w") as f:
        json.dump(CATEGORIES, f)
    with open(root / "annotations/meta_data/scannetv2-labels.combined.tsv", "w") as f:
        f.write("id\traw_category\tcategory\tcount\tnyu40id\teigen13id\t"
                "nyu40class\tnyuClass\n")
        nyu40 = ["wall", "floor", "ceiling", "chair", "table", "sofa", "bed",
                 "lamp", "door", "window"]
        for i, name in enumerate(CATEGORIES):
            f.write(f"{i+1}\t{name}\t{name}\t10\t{i+1}\t0\t{nyu40[i]}\t{name}\n")

    scan_ids = [f"{prefix}{i:04d}_00" for i in range(n_scans)]
    annos = []
    item = 0
    for scan_id in scan_ids:
        points, instance = [], []
        inst_to_label = {}
        for obj_i in range(n_objects):
            cat = CATEGORIES[obj_i % len(CATEGORIES)]
            center = rng.randn(3) * 3
            pts = center + rng.randn(pts_per_obj, 3) * 0.3
            points.append(pts)
            instance.append(np.full(pts_per_obj, obj_i))
            inst_to_label[obj_i] = cat
        points = np.concatenate(points).astype(np.float32)
        colors = rng.randint(0, 255, points.shape).astype(np.float32)
        instance = np.concatenate(instance).astype(np.int64)
        torch.save(
            (points, colors, None, instance),
            root / f"scan_data/pcd_with_global_alignment/{scan_id}.pth",
        )
        torch.save(inst_to_label,
                   root / f"scan_data/instance_id_to_label/{scan_id}.pth")
        # referring annotations for every non-bg object
        for obj_i in range(n_objects):
            cat = inst_to_label[obj_i]
            if cat in ("wall", "floor", "ceiling"):
                continue
            annos.append({
                "item_id": f"item{item}",
                "scan_id": scan_id,
                "target_id": obj_i,
                "instance_type": cat,
                "utterance": f"the {cat} near the wall on the left",
                "tokens": f"the {cat} near the wall on the left".split(),
            })
            item += 1

    with open(root / "annotations/anno.json", "w") as f:
        json.dump(annos, f)
    with open(root / "annotations/refer/scanrefer.jsonl", "w") as f:
        for a in annos:
            f.write(json.dumps(a) + "\n")
    with open(root / "annotations/scene_cap.json", "w") as f:
        json.dump(
            {sid: {"captions": [f"a synthetic room {sid}"]} for sid in scan_ids}, f
        )
    for split in ("train", "val", "test"):
        text = "\n".join(scan_ids) + "\n"
        (root / f"annotations/splits/scannetv2_{split}.txt").write_text(text)
        (root / f"annotations/splits/{split}_split.txt").write_text(text)
    return root
