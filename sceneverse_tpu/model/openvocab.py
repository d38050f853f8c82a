"""GPS task models (reference model/openvocab.py).

``OpenVocab`` (:11-126): BERT text tower + PointNet++/spatial vision tower +
unified cross-modal encoder + configured heads; records inter/intra embeds
for the contrastive losses per ``cfg.model.inter``; og3d logits are the dot
product between fused object tokens and the fused [CLS] text token (:74).

``OpenVocabPerScene`` (:129-255): per-scene variant — a batch carries L
sentences per scene; text runs at (B*L) and object features are broadcast to
(B*L, O, D) before fusion; og3d logits reshape to (B, L, O).

The forward is a pure function over a dict of arrays (data_dict in, new
data_dict out) so the whole step jits with static shapes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import nnx

from sceneverse_tpu.model.build import MODEL_REGISTRY, BaseModel
from sceneverse_tpu.modules.build import build_module

Array = jax.Array


def _get_lr(module_cfg, default_lr):
    lr = module_cfg.get("lr") if hasattr(module_cfg, "get") else None
    return default_lr if lr is None else lr


class _OpenVocabBase(BaseModel):
    def __init__(self, cfg, *, rngs: nnx.Rngs):
        super().__init__(cfg)
        self.cfg = cfg
        self.lang_encoder = build_module("language", cfg.model.language, rngs=rngs)
        self.point_encoder = build_module("vision", cfg.model.vision, rngs=rngs)
        self.unified_encoder = build_module("grounding", cfg.model.grounding, rngs=rngs)
        self.head_list = list(cfg.model.heads.head_list)
        for head in self.head_list:
            setattr(self, head, build_module("heads", cfg.model.heads[head], rngs=rngs))
        self.inter = cfg.model.get("inter", "")
        # rematerialization (jax.checkpoint via nnx.remat): drop the towers'
        # internal activations in the forward and recompute them in the
        # backward — trades tower FLOPs for activation memory, buying
        # headroom for larger per-chip batches / models (measured: batch 256
        # fits on a 16 GB v5e with remat, OOMs without).
        # cfg.model.remat: true = the TRAINABLE towers {language, grounding}
        # — rematerializing `vision` re-runs the frozen PointNet++ backbone
        # (the most expensive forward in the model, and gradient-free) in
        # every backward, which measured ~2x step time; include "vision" in
        # an explicit list only when its activations are what OOMs.
        # No reference analog (torch keeps all activations); equivalent up
        # to float reassociation (the checkpoint boundary changes XLA
        # fusion choices).
        remat = cfg.model.get("remat", None)
        if remat is True:
            self.remat = {"language", "grounding"}
        elif isinstance(remat, str):  # bare CLI override, e.g. model.remat=vision
            self.remat = {remat}
        else:
            self.remat = set(remat or [])
        unknown = self.remat - {"language", "vision", "grounding"}
        if unknown:
            raise ValueError(f"model.remat: unknown towers {sorted(unknown)}; "
                             "valid: language, vision, grounding")
        # cfg.model.remat_policy: "dots" keeps matmul outputs resident and
        # recomputes only the cheap elementwise chains between them
        # (jax.checkpoint_policies.dots_with_no_batch_dims_saveable) — much
        # less recompute than full-tower remat at a smaller memory saving;
        # "full" (default) drops everything inside the tower.
        policy_name = str(cfg.model.get("remat_policy", "full"))
        if policy_name == "dots":
            self.remat_policy = (
                jax.checkpoint_policies.dots_with_no_batch_dims_saveable)
        elif policy_name == "full":
            self.remat_policy = None
        else:
            raise ValueError(
                f"model.remat_policy: {policy_name!r}; valid: full, dots")
        # cfg.model.lm_max_predictions: K > 0 gathers the K masked text
        # positions (stable order) before the masked-LM head, so the
        # (seq, 30522) logits shrink to (K, 30522) — the original BERT's
        # TPU `max_predictions_per_seq` design. EXACT when the per-sequence
        # masked count <= K (CE/accuracy reduce over labels != -1, and the
        # gather carries every masked position exactly once); overflow
        # positions beyond K are dropped (P(Binom(50,0.15) > 16) ~ 1e-3 —
        # at most one lost prediction slot on rare sequences). The reference
        # computes all positions and masks (modules/heads/pretrain_head.py:
        # 36-43 + F.cross_entropy ignore) — same math, 3x the vocab traffic.
        self.lm_max_predictions = int(cfg.model.get("lm_max_predictions", 0))

    def _tower(self, name, module, *args):
        if name in self.remat:
            return nnx.remat(lambda m, *a: m(*a),
                             policy=self.remat_policy)(module, *args)
        return module(*args)

    def _lang(self, *args):
        return self._tower("language", self.lang_encoder, *args)

    def _lang_cls(self, ids, masks):
        """Caption-tower call whose output is consumed ONLY at [CLS]: ask
        the encoder (when it supports it) to compute just the position-0
        query row in its final layer — same math as full compute then
        ``[:, 0]``, minus the dead 299-row final-layer FFN/LN fwd+bwd at
        max_scene_cap_len=300 (the cotangent outside row 0 is identically
        zero but XLA still runs full-width matmuls on it). Gate:
        SCENEVERSE_CAP_CLS_ONLY (default on)."""
        import inspect
        import os

        supported = "cls_only" in inspect.signature(
            type(self.lang_encoder).__call__).parameters
        enabled = os.environ.get("SCENEVERSE_CAP_CLS_ONLY", "on").lower() in (
            "1", "on", "true")
        if not (supported and enabled):
            return self._lang(ids, masks)[:, 0]
        if "language" in self.remat:
            # cls_only must stay a PYTHON bool through remat (it drives
            # static control flow) — close over it instead of passing it
            return nnx.remat(lambda m, a, b: m(a, b, cls_only=True),
                             policy=self.remat_policy)(
                self.lang_encoder, ids, masks)[:, 0]
        return self.lang_encoder(ids, masks, cls_only=True)[:, 0]

    def _vision(self, *args):
        return self._tower("vision", self.point_encoder, *args)

    def _fuse(self, *args):
        return self._tower("grounding", self.unified_encoder, *args)

    def get_opt_params(self):
        lr = self.cfg.solver.lr
        groups = [
            {"prefix": ("lang_encoder",), "lr": _get_lr(self.cfg.model.language, lr)},
            {"prefix": ("point_encoder",), "lr": _get_lr(self.cfg.model.vision, lr)},
            {"prefix": ("unified_encoder",), "lr": _get_lr(self.cfg.model.grounding, lr)},
        ]
        for head in ("ground_head", "qa_head", "pretrain_head"):
            if head in self.head_list:
                groups.append(
                    {"prefix": (head,), "lr": _get_lr(self.cfg.model.heads[head], lr)}
                )
        return groups

    def frozen_prefixes(self):
        # reference pcd_openvocab_encoder.py:54-57 freezes only the params
        # that exist at that point in __init__: the PointNet++ backbone.
        if self.cfg.model.vision.args.get("freeze", False):
            return [("point_encoder", "point_feature_extractor")]
        return []

    def _lm_head_inputs(self, language_fuse, data_dict, out):
        """Masked-position gather for the LM head (see lm_max_predictions in
        __init__). Returns the (possibly gathered) text embeddings and
        overrides out["masked_lm_labels"] with the aligned gathered labels so
        every consumer (lm_cls_loss, PretrainEval) stays unchanged."""
        K = self.lm_max_predictions
        labels = data_dict.get("masked_lm_labels")
        if not K or labels is None or K >= language_fuse.shape[1]:
            return language_fuse
        if labels.ndim == 3:  # per-scene: language_fuse runs at (B*L, T, D)
            labels = labels.reshape(language_fuse.shape[0], labels.shape[-1])
        masked = labels != -1
        # stable argsort of (not masked): masked positions first, original
        # order preserved; pad slots point at unmasked positions whose
        # gathered label is -1, which the CE/accuracy reductions ignore
        idx = jnp.argsort(~masked, axis=1)[:, :K]
        out["masked_lm_labels"] = jnp.take_along_axis(labels, idx, axis=1)
        return jnp.take_along_axis(language_fuse, idx[..., None], axis=1)

    def _run_heads(self, out, language_fuse, point_fuse, point_pre, data_dict):
        if getattr(self, "ground_head", None) is not None:
            txt_cls_logits, obj_cls_post, obj_cls_pre, og3d_logits = self.ground_head(
                language_fuse, point_fuse, point_pre, data_dict["obj_masks"]
            )
            out["txt_cls_logits"] = txt_cls_logits
            out["obj_cls_post_logits"] = obj_cls_post
            out["obj_cls_pre_logits"] = obj_cls_pre
            out["og3d_logits"] = og3d_logits  # head overrides dot-product logits
        if getattr(self, "qa_head", None) is not None:
            out["answer_scores"] = self.qa_head(
                point_fuse, data_dict["obj_masks"], language_fuse, data_dict["txt_masks"]
            )
        if getattr(self, "pretrain_head", None) is not None:
            lm_in = self._lm_head_inputs(language_fuse, data_dict, out)
            output = self.pretrain_head(lm_in, point_fuse)
            if isinstance(output, tuple):
                out["txt_lm_cls_logits"], out["obj_cls_post_logits"] = output
            else:
                out["txt_lm_cls_logits"] = output
        return out


@MODEL_REGISTRY.register()
class OpenVocab(_OpenVocabBase):
    def __init__(self, cfg, *, rngs: nnx.Rngs):
        super().__init__(cfg, rngs=rngs)
        self.use_scene_cap = cfg.data.args.get("use_scene_cap", False)
        self.split_scene_cap_tower = bool(
            cfg.model.get("split_scene_cap_tower", False))

    def __call__(self, data_dict: dict) -> dict:
        out = dict(data_dict)
        if self.use_scene_cap and "scene_txt_ids" in data_dict:
            txt_ids, txt_masks = data_dict["txt_ids"], data_dict["txt_masks"]
            sc_ids, sc_masks = data_dict["scene_txt_ids"], data_dict["scene_txt_masks"]
            B, L = txt_ids.shape
            if self.split_scene_cap_tower:
                # two tower calls at each sequence's NATURAL length
                # (reference model/openvocab.py:49-55 runs two BertModel
                # calls too). Under jit there is no per-call launch cost;
                # the concat path below pads the utterances to the caption
                # length (50 -> 64 at GPS shapes, ~11% wasted rows and a
                # (64/50)^2 attention blow-up on the utterance half).
                # Padded positions are exactly masked in both, so outputs
                # match to XLA-reassociation order.
                lang_feats = self._lang(txt_ids, txt_masks)
                out["scene_text_embed"] = self._lang_cls(sc_ids, sc_masks)
            else:
                # one batched call (pad to the longer length, concat on
                # batch) — fewer, larger fusions (default; the split
                # variant above is the A/B knob, numbers in BASELINE.md)
                M = max(L, sc_ids.shape[1])

                def pad(x, mode_val=0):
                    return jnp.pad(x, ((0, 0), (0, M - x.shape[1])),
                                   constant_values=mode_val)

                feats = self._lang(
                    jnp.concatenate([pad(txt_ids), pad(sc_ids)], axis=0),
                    jnp.concatenate([pad(txt_masks), pad(sc_masks)], axis=0),
                )
                lang_feats = feats[:B, :L]
                out["scene_text_embed"] = feats[B:, 0]
        else:
            lang_feats = self._lang(data_dict["txt_ids"], data_dict["txt_masks"])

        point_feats, point_pre, obj_cls_raw_logits = self._vision(
            data_dict["obj_fts"].astype(jnp.float32),
            data_dict["obj_locs"],
            data_dict["obj_masks"],
            data_dict["obj_sem_masks"],
            data_dict.get("obj_labels"),
        )

        if self.use_scene_cap:
            out["scene_embed"] = jnp.mean(point_feats, axis=1)

        if self.inter == "before":
            out["inter_text_embed"] = lang_feats[:, 0]
            out["inter_obj_embeds"] = point_feats

        language_fuse, point_fuse = self._fuse(
            lang_feats, data_dict["txt_masks"], point_feats,
            data_dict["obj_locs"], data_dict["obj_masks"],
        )
        if self.inter != "before":
            out["inter_text_embed"] = language_fuse[:, 0]
            out["inter_obj_embeds"] = point_fuse

        language_cls = language_fuse[:, 0]
        out["intra_text_embed"] = language_cls
        out["intra_obj_embeds"] = point_fuse
        out["obj_cls_raw_logits"] = obj_cls_raw_logits
        out["og3d_logits"] = jnp.einsum("bod,bd->bo", point_fuse, language_cls)
        return self._run_heads(out, language_fuse, point_fuse, point_pre, data_dict)


@MODEL_REGISTRY.register()
class OpenVocabPerScene(_OpenVocabBase):
    def __call__(self, data_dict: dict) -> dict:
        out = dict(data_dict)
        txt_ids = data_dict["txt_ids"]
        txt_masks = data_dict["txt_masks"]
        use_per_scene = txt_ids.ndim == 3
        if use_per_scene:
            B, L, _ = txt_ids.shape
            O = data_dict["obj_masks"].shape[1]
            txt_ids = txt_ids.reshape(B * L, -1)
            txt_masks = txt_masks.reshape(B * L, -1)

        lang_feats = self._lang(txt_ids, txt_masks)
        point_feats, point_pre, obj_cls_raw_logits = self._vision(
            data_dict["obj_fts"].astype(jnp.float32),
            data_dict["obj_locs"],
            data_dict["obj_masks"],
            data_dict["obj_sem_masks"],
            data_dict.get("obj_labels"),
        )

        if use_per_scene:
            # broadcast per-scene object features to every sentence
            point_feats = jnp.repeat(point_feats[:, None], L, axis=1).reshape(
                B * L, O, point_feats.shape[-1]
            )
            obj_locs = jnp.repeat(data_dict["obj_locs"][:, None], L, axis=1).reshape(
                B * L, O, -1
            )
            obj_masks = jnp.repeat(data_dict["obj_masks"][:, None], L, axis=1).reshape(
                B * L, O
            )
        else:
            obj_locs = data_dict["obj_locs"]
            obj_masks = data_dict["obj_masks"]

        if self.inter == "before":
            out["inter_text_embed"] = lang_feats[:, 0]
            out["inter_obj_embeds"] = point_feats

        language_fuse, point_fuse = self._fuse(
            lang_feats, txt_masks, point_feats, obj_locs, obj_masks
        )
        if self.inter != "before":
            out["inter_text_embed"] = language_fuse[:, 0]
            out["inter_obj_embeds"] = point_fuse

        language_cls = language_fuse[:, 0]
        out["intra_text_embed"] = language_cls
        out["intra_obj_embeds"] = point_fuse
        out["obj_cls_raw_logits"] = obj_cls_raw_logits
        og3d = jnp.einsum("bod,bd->bo", point_fuse, language_cls)
        out["og3d_logits"] = og3d.reshape(B, L, O) if use_per_scene else og3d
        # reference :203-229 skips ground_head in the per-scene variant
        masks = {"obj_masks": obj_masks, "txt_masks": txt_masks}
        if getattr(self, "qa_head", None) is not None:
            out["answer_scores"] = self.qa_head(
                point_fuse, masks["obj_masks"], language_fuse, masks["txt_masks"]
            )
        if getattr(self, "pretrain_head", None) is not None:
            lm_in = self._lm_head_inputs(language_fuse, data_dict, out)
            output = self.pretrain_head(lm_in, point_fuse)
            if isinstance(output, tuple):
                out["txt_lm_cls_logits"], out["obj_cls_post_logits"] = output
            else:
                out["txt_lm_cls_logits"] = output
        return out
