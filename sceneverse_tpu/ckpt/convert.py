"""torch checkpoint -> NNX state converter.

Enables the north-star parity path: load the released SceneVerse GPS
checkpoints (HF-Accelerate ``pytorch_model*.bin`` shards,
reference TRAIN.md:61-76, loaded non-strict at reference
trainer/build.py:174-184) into the TPU model.

Conversion rules (torch -> NNX):
  * ``Linear.weight`` (out,in)        -> ``kernel`` (in,out), transposed
  * ``Conv2d 1x1 .weight`` (o,i,1,1)  -> ``conv.kernel`` (i,o)
  * ``nn.MultiheadAttention``         -> packed ``in_proj.kernel`` (D,3D) +
    ``in_proj_weight/bias``              ``out_proj``
  * ``Embedding.weight``              -> ``embedding``
  * ``LayerNorm.weight/bias``         -> ``scale`` / ``bias``
  * ``BatchNorm.weight/bias/running_*`` -> ``scale/bias/mean/var``
  * HF BERT tree (``encoder.layer.N``) -> our ``layer.N`` (encoder level
    elided), ``intermediate.dense`` -> ``intermediate_dense`` etc.
  * ``get_mlp_head`` Sequential indices (0/2/4) -> ``fc1/norm/fc2``
  * loc layer Sequential (0/1) -> ``linear`` / ``norm``
"""

from __future__ import annotations

import glob
import os
from typing import Dict

import numpy as np
from flax import nnx

# torch-name segment rewrites applied in order (first match wins per rule;
# all rules applied sequentially to the dotted name).
_SEGMENT_REWRITES = [
    # HF BERT: the 'encoder' level is elided in our tree
    (".encoder.layer.", ".layer."),
    (".intermediate.dense.", ".intermediate_dense."),
    # attention.output.dense must stay; the FFN-level output.* becomes output_*
    (".attention.output.dense.", ".attention.output\x00dense."),
    (".attention.output.LayerNorm.", ".attention.output\x00LayerNorm."),
    (".output.dense.", ".output_dense."),
    (".output.LayerNorm.", ".output_LayerNorm."),
    ("\x00", "."),
    # mlp heads (Linear-ReLU-LN-Dropout-Linear -> fc1/norm/fc2)
    ("_head.0.", "_head.fc1."),
    ("_head.2.", "_head.norm."),
    ("_head.4.", "_head.fc2."),
    ("vis_cls_head.0.", "vis_cls_head.fc1."),
    ("vis_cls_head.2.", "vis_cls_head.norm."),
    ("vis_cls_head.4.", "vis_cls_head.fc2."),
    ("cls_head.0.", "cls_head.fc1."),
    ("cls_head.2.", "cls_head.norm."),
    ("cls_head.4.", "cls_head.fc2."),
    # loc layer Sequential(Linear, LayerNorm)
    ("loc_layers.0.0.", "loc_layers.0.linear."),
    ("loc_layers.0.1.", "loc_layers.0.norm."),
    # sem cls embed Sequential(Linear, LayerNorm, Dropout)
    ("sem_cls_embed_layer.0.", "sem_cls_embed_layer_linear."),
    ("sem_cls_embed_layer.1.", "sem_cls_embed_layer_norm."),
    # QA head
    (".mlp.fc.linear.", ".mlp.fc."),
    ("answer_cls.0.", "answer_fc1."),
    ("answer_cls.3.", "answer_fc2."),
    # PointNet++ SharedMLP: mlps.<scale>.layer<i>.{conv,bn.bn} -> mlp.layers.<i>
    (".bn.bn.", ".bn."),
]


def _rewrite_name(name: str) -> str:
    n = "." + name  # sentinel so leading-segment rules match uniformly
    for old, new in _SEGMENT_REWRITES:
        n = n.replace(old, new)
    # pointnet mlps.0.layerK.conv -> mlp.layers.K.conv
    import re

    n = re.sub(r"\.mlps\.0\.layer(\d+)\.", r".mlp.layers.\1.", n)
    n = re.sub(r"\.mlps\.(\d+)\.layer(\d+)\.", r".mlp.layers.\2.", n)  # MSG scale 0 only
    return n[1:]


def convert_torch_state_dict(weights: Dict[str, "object"]) -> Dict[str, np.ndarray]:
    """Map a torch state_dict to {nnx dotted path: np array}."""
    out: Dict[str, np.ndarray] = {}
    for name, tensor in weights.items():
        arr = np.asarray(tensor.detach().cpu().numpy() if hasattr(tensor, "detach") else tensor)
        n = _rewrite_name(name)

        if n.endswith(".in_proj_weight"):
            out[n.replace(".in_proj_weight", ".in_proj.kernel")] = arr.T  # (D,3D)
            continue
        if n.endswith(".in_proj_bias"):
            out[n.replace(".in_proj_bias", ".in_proj.bias")] = arr
            continue
        if n.endswith(".running_mean"):
            out[n.replace(".running_mean", ".mean")] = arr
            continue
        if n.endswith(".running_var"):
            out[n.replace(".running_var", ".var")] = arr
            continue
        if n.endswith(".num_batches_tracked") or n.endswith(".position_ids"):
            continue
        if n.endswith(".weight"):
            stem = n[: -len(".weight")]
            if arr.ndim == 4:  # Conv2d 1x1 (o, i, 1, 1)
                out[stem + ".kernel"] = arr[:, :, 0, 0].T
            elif arr.ndim == 2:
                # Embedding vs Linear: embeddings keep orientation
                if any(
                    key in stem
                    for key in ("embedding", "token_type_embeddings",
                                "sem_mask_embeddings")
                ):
                    out[stem + ".embedding"] = arr
                else:
                    out[stem + ".kernel"] = arr.T
            else:  # LayerNorm / BatchNorm weight
                out[stem + ".scale"] = arr
            continue
        out[n] = arr
    return out


def _flatten_nnx(state, prefix=()):
    """Flatten an nnx State to {dotted path: leaf-reference path tuple}."""
    import jax

    flat = jax.tree_util.tree_flatten_with_path(state)[0]
    result = {}
    for path, leaf in flat:
        names = []
        for p in path:
            key = getattr(p, "key", getattr(p, "idx", getattr(p, "name", p)))
            names.append(str(key))
        if names and names[-1] == "value":
            names.pop()
        result[".".join(names)] = (path, leaf)
    return result


def apply_to_model(model, converted: Dict[str, np.ndarray], strict: bool = False):
    """Non-strict load_state_dict analog (reference loads with strict=False).

    Returns (n_loaded, missing, unexpected).
    """
    import jax.numpy as jnp

    state = nnx.state(model)
    flat = _flatten_nnx(state)
    loaded, unexpected = 0, []
    hit = set()
    for name, arr in converted.items():
        # torch 'weight' of our Embedding modules arrives as '<stem>.embedding'
        target = flat.get(name)
        if target is None and name.endswith(".embedding.embedding"):
            target = flat.get(name[: -len(".embedding")])
            name = name[: -len(".embedding")] if target is not None else name
        if target is None:
            unexpected.append(name)
            continue
        path, leaf = target
        if tuple(np.shape(leaf)) != tuple(arr.shape):
            unexpected.append(f"{name} (shape {arr.shape} vs {np.shape(leaf)})")
            continue
        _set_by_path(state, path, jnp.asarray(arr, dtype=leaf.dtype if hasattr(leaf, "dtype") else None))
        hit.add(name)
        loaded += 1
    missing = [
        k for k in flat
        if k not in hit and ".rngs." not in f".{k}." and not k.endswith(".count")
    ]
    if strict and (missing or unexpected):
        raise ValueError(f"strict load failed: missing={missing}, unexpected={unexpected}")
    nnx.update(model, state)
    return loaded, missing, unexpected


def _set_by_path(state, path, value):
    keys = [
        getattr(p, "key", getattr(p, "idx", getattr(p, "name", p))) for p in path
    ]
    node = state
    for key in keys[:-1]:
        node = node[key]
    if keys[-1] == "value":  # node is the VariableState leaf wrapper
        node.value = value
    else:
        node[keys[-1]] = value


def load_torch_pretrain(model, ckpt_path) -> int:
    """Load ``pytorch_model*.bin`` shards (reference trainer/build.py:174-184)
    or a single ``.pth``/``.bin`` file into the NNX model, non-strict."""
    import torch

    ckpt_path = str(ckpt_path)
    if os.path.isdir(ckpt_path):
        paths = sorted(glob.glob(os.path.join(ckpt_path, "pytorch_model*.bin")))
        if not paths:
            raise FileNotFoundError(f"Cannot find pytorch_model.bin in {ckpt_path}")
    else:
        paths = [ckpt_path]
    weights = {}
    for p in paths:
        weights.update(torch.load(p, map_location="cpu", weights_only=False))
    converted = convert_torch_state_dict(weights)
    loaded, missing, unexpected = apply_to_model(model, converted)
    if unexpected:
        print(f"[convert] {len(unexpected)} unexpected/unmatched tensors, e.g. {unexpected[:5]}")
    if missing:
        print(f"[convert] {len(missing)} params not in checkpoint, e.g. {missing[:5]}")
    return loaded
