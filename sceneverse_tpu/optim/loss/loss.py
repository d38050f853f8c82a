"""Functional losses + Loss aggregator (reference optim/loss/loss.py).

All losses are pure functions of a dict of arrays, summable under jit.
torch semantics reproduced:
  * ``F.cross_entropy(..., reduction='none') * mask`` with pad labels — pad
    positions carry label -100 AND mask 0, so they contribute exactly 0,
  * ``ignore_index=-1`` masked-LM CE averages over non-ignored positions,
  * BCE-with-logits `reduction='sum' / batch` shapes.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from sceneverse_tpu.registry import Registry

LOSS_REGISTRY = Registry("loss")

Array = jax.Array


def _ce_values(logits, labels, label_smoothing):
    """Forward math shared by primal and fwd rule. Returns (nll, lse).

    Formulated as ``lse − picked_logit`` rather than
    ``−log_softmax(logits)[label]``: gathers cannot fuse with their producer
    in XLA, so the take-along-axis form forces the full float32 log-prob
    tensor (780 MB at the (B,50,30522) LM head, B=128) to materialize just
    to read one element per row. Here the only gather is on the *input*
    logits (already materialized) and every vocab-sized f32 intermediate
    fuses into the reduces. Values match the log_softmax form to float
    op-ordering (≤ ~1 ulp); same smoothing identity
    ``−mean(logp) = lse − mean(logits)``.
    """
    num_classes = logits.shape[-1]
    safe = jnp.clip(labels, 0, num_classes - 1)
    lf = logits.astype(jnp.float32)
    m = jax.lax.stop_gradient(jnp.max(lf, axis=-1))
    lse = m + jnp.log(jnp.sum(jnp.exp(lf - m[..., None]), axis=-1))
    picked = jnp.take_along_axis(logits, safe[..., None], axis=-1)[..., 0]
    nll = lse - picked.astype(jnp.float32)
    if label_smoothing > 0.0:
        smooth = lse - jnp.mean(lf, axis=-1)
        nll = (1.0 - label_smoothing) * nll + label_smoothing * smooth
    return nll, lse


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def cross_entropy(logits: Array, labels: Array, label_smoothing: float = 0.0) -> Array:
    """Per-position CE (no reduction). Out-of-range labels are clamped; caller
    masks them out (torch ignore-index semantics are built by callers).

    Memory-lean custom VJP: the default autodiff of ``log_softmax → gather``
    stores TWO float32 vocab-sized residuals (the f32 cast of the logits and
    the f32 log-probs). At the masked-LM head's (B,50,30522) shape that is
    ~1.5 GB/step of HBM traffic at B=128 (device profile, profile_analyze.py).
    This rule saves only the logits in their INPUT dtype (bf16 under mixed
    precision — a tensor the forward already materialized) plus a per-position
    f32 logsumexp, and recomputes ``p = exp(x − lse)`` elementwise in
    backward, fused by XLA into the consuming matmuls. Forward values and
    gradients match the standard VJP to float-rounding order; in f32 mode the
    residual is the full-precision logits, so nothing is lost.
    """
    return _ce_values(logits, labels, label_smoothing)[0]


def _ce_fwd(logits, labels, label_smoothing):
    nll, lse = _ce_values(logits, labels, label_smoothing)
    return nll, (logits, labels, lse)


def _ce_bwd(label_smoothing, res, g):
    logits, labels, lse = res
    num_classes = logits.shape[-1]
    lf = logits.astype(jnp.float32)
    p = jnp.exp(lf - lse[..., None])
    safe = jnp.clip(labels, 0, num_classes - 1)
    iota = jax.lax.broadcasted_iota(jnp.int32, lf.shape, lf.ndim - 1)
    is_label = iota == safe[..., None]
    # d nll / d logit_j = p_j − (1−s)·1[j=label] − s/K
    grad = p - jnp.where(is_label, 1.0 - label_smoothing, 0.0)
    if label_smoothing > 0.0:
        grad = grad - label_smoothing / num_classes
    grad = grad * g[..., None].astype(jnp.float32)
    zero_labels = np.zeros(labels.shape, dtype=jax.dtypes.float0)
    return grad.astype(logits.dtype), zero_labels


cross_entropy.defvjp(_ce_fwd, _ce_bwd)


def bce_with_logits(logits: Array, targets: Array, weight: Array | None = None) -> Array:
    """Elementwise binary cross entropy with logits (torch semantics)."""
    logits = logits.astype(jnp.float32)
    loss = jnp.maximum(logits, 0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    if weight is not None:
        loss = loss * weight
    return loss


# ------------------------------------------------------------------ losses
def og3d_loss(data_dict):
    return jnp.mean(
        cross_entropy(data_dict["og3d_logits"], data_dict["tgt_object_id"][..., 0])
    )


def og3d_multi_loss(data_dict):
    tgt = data_dict["tgt_object_id"].astype(jnp.float32)
    return jnp.sum(bce_with_logits(data_dict["og3d_logits"], tgt)) / tgt.shape[0]


def txt_cls_multi_loss(data_dict):
    tgt = data_dict["tgt_object_label"].astype(jnp.float32)
    return jnp.sum(bce_with_logits(data_dict["txt_cls_logits"], tgt)) / tgt.shape[0]


def _masked_obj_ce(logits, labels, mask):
    ce = cross_entropy(logits, labels) * (labels >= 0)
    m = mask.astype(jnp.float32)
    return jnp.sum(ce * m) / jnp.maximum(jnp.sum(m), 1.0)


def obj_cls_raw_loss(data_dict):
    return _masked_obj_ce(
        data_dict["obj_cls_raw_logits"], data_dict["obj_labels"], data_dict["obj_masks"]
    )


def obj_cls_pre_loss(data_dict):
    return _masked_obj_ce(
        data_dict["obj_cls_pre_logits"], data_dict["obj_labels"], data_dict["obj_masks"]
    )


def obj_cls_post_loss(data_dict):
    return _masked_obj_ce(
        data_dict["obj_cls_post_logits"], data_dict["obj_labels"], data_dict["obj_masks"]
    )


def answer_loss(data_dict):
    tgt = data_dict["answer_label"].astype(jnp.float32)
    return jnp.sum(bce_with_logits(data_dict["answer_scores"], tgt)) / (
        data_dict["answer_scores"].shape[0]
    )


def lm_cls_loss(data_dict):
    labels = data_dict["masked_lm_labels"]
    if labels.ndim == 3:
        labels = labels.reshape(-1, labels.shape[-1])
    logits = data_dict["txt_lm_cls_logits"]
    ce = cross_entropy(logits, labels)
    valid = (labels != -1).astype(jnp.float32)
    return jnp.sum(ce * valid) / jnp.maximum(jnp.sum(valid), 1.0)


def _sem_mask_obj_ce(logits, labels, mask, sem_masks, unmask: bool):
    sem = sem_masks.astype(bool) if unmask else ~sem_masks.astype(bool)
    m = (mask.astype(bool) & sem).astype(jnp.float32)
    ce = cross_entropy(logits, labels) * (labels >= 0)
    return jnp.sum(ce * m) / jnp.maximum(jnp.sum(m), 1.0)


def obj_cls_pre_loss_mask(data_dict):
    return _sem_mask_obj_ce(
        data_dict["obj_cls_pre_logits"], data_dict["obj_labels"],
        data_dict["obj_masks"], data_dict["obj_sem_masks"], unmask=False,
    )


def obj_cls_pre_loss_unmask(data_dict):
    return _sem_mask_obj_ce(
        data_dict["obj_cls_pre_logits"], data_dict["obj_labels"],
        data_dict["obj_masks"], data_dict["obj_sem_masks"], unmask=True,
    )


def obj_cls_post_loss_mask(data_dict):
    return _sem_mask_obj_ce(
        data_dict["obj_cls_post_logits"], data_dict["obj_labels"],
        data_dict["obj_masks"], data_dict["obj_sem_masks"], unmask=False,
    )


def obj_cls_post_loss_unmask(data_dict):
    return _sem_mask_obj_ce(
        data_dict["obj_cls_post_logits"], data_dict["obj_labels"],
        data_dict["obj_masks"], data_dict["obj_sem_masks"], unmask=True,
    )


def obj_cls_loss(data_dict, smoothing=0.3):
    ce = cross_entropy(data_dict["obj_logits"], data_dict["obj_labels"], smoothing)
    ce = ce * (data_dict["obj_labels"] >= 0)
    m = data_dict["obj_masks"].astype(jnp.float32)
    return jnp.sum(ce * m) / jnp.maximum(jnp.sum(m), 1.0)


def mse_loss(data_dict):
    return jnp.mean(
        jnp.square(data_dict["pred_images"] - data_dict["target_images"])
    )


_FUNCTIONAL = {
    fn.__name__: fn
    for fn in (
        og3d_loss, og3d_multi_loss, txt_cls_multi_loss,
        obj_cls_raw_loss, obj_cls_pre_loss, obj_cls_post_loss,
        answer_loss, lm_cls_loss,
        obj_cls_pre_loss_mask, obj_cls_pre_loss_unmask,
        obj_cls_post_loss_mask, obj_cls_post_loss_unmask,
        obj_cls_loss, mse_loss,
    )
}


class Loss(nnx.Module):
    """Loss aggregator (reference optim/loss/loss.py:111-148): resolves names
    from the functional table, else from LOSS_REGISTRY (module losses with
    state, e.g. the contrastive losses); ``loss_list`` entries sum into
    ``total_loss``; ``vis_loss_list`` entries are computed for logging only.
    """

    def __init__(self, cfg, *, rngs: nnx.Rngs | None = None):
        from sceneverse_tpu.optim.loss import contra_loss  # registers modules

        del contra_loss
        all_keys = list(dict.fromkeys(
            list(cfg.model.get("vis_loss_list", [])) + list(cfg.model.loss_list)
        ))
        self.selected_keys = list(cfg.model.loss_list)
        self.loss_names = all_keys
        self._functional = {}
        for k in all_keys:
            if k in _FUNCTIONAL:
                self._functional[k] = _FUNCTIONAL[k]
            else:
                setattr(self, k, LOSS_REGISTRY.get(k)(cfg))

    def __call__(self, data_dict: dict):
        all_losses = {}
        for k in self.loss_names:
            fn = self._functional.get(k) or getattr(self, k)
            d = data_dict
            if k == "txt_cls_loss" and "txt_cls_label" not in data_dict:
                d = dict(data_dict)
                d["txt_cls_label"] = data_dict["tgt_object_label"][..., 0]
            all_losses[k] = fn(d)
        total = sum(all_losses[k] for k in self.selected_keys)
        all_losses["total_loss"] = total
        return total, all_losses
