"""IO helpers (reference common/io_utils.py). Device-transfer helpers from
the reference's type_utils are obsolete — JAX device placement is handled by
jit/shardings; ``cfg2dict`` lives in sceneverse_tpu.config."""

from __future__ import annotations

import csv
import json
import pickle
from pathlib import Path

import numpy as np


def make_dir(dir_path):
    Path(dir_path).mkdir(parents=True, exist_ok=True)


def load_pickle(filename):
    with Path(filename).open("rb") as f:
        return pickle.load(f)


def save_pickle(data, filename):
    with Path(filename).open("wb") as f:
        pickle.dump(data, f, protocol=pickle.HIGHEST_PROTOCOL)


def load_json(filename):
    with Path(filename).open("rb") as f:
        return json.load(f)


def save_json(data, filename, save_pretty=True, sort_keys=False):
    with Path(filename).open("w") as f:
        if save_pretty:
            f.write(json.dumps(data, indent=4, sort_keys=sort_keys))
        else:
            json.dump(data, f, sort_keys=sort_keys)


def load_jsonl(filename):
    with Path(filename).open(encoding="utf-8") as f:
        return [json.loads(line) for line in f if line.strip()]


def save_jsonl(data, filename):
    with Path(filename).open("w") as f:
        for row in data:
            f.write(json.dumps(row) + "\n")


def load_csv(filename, delimiter=","):
    with Path(filename).open(encoding="utf-8") as f:
        return list(csv.reader(f, delimiter=delimiter))


def load_numpy(filename):
    return np.load(filename, allow_pickle=True)


def save_numpy(data, filename):
    np.save(filename, data)
