"""PointNet++ set-abstraction encoder, TPU-first.

Replaces the reference composition (reference modules/layers/pointnet.py:22-63
over modules/third_party/pointnet2/pointnet2_modules.py:26-151 +
pytorch_utils.py SharedMLP) with a channels-last XLA program:

  FPS -> gather -> ball query -> group -> center -> [concat feats]
      -> per-point MLP (1x1 "convs" become plain (…, C) @ (C, C') matmuls
         that tile straight onto the MXU) -> max over the sample axis.

Everything is static-shaped and lives inside one jit; XLA fuses the gathers
and elementwise work into the matmuls. BatchNorm statistics reduce over
(batch, centers, samples) exactly like the reference's BatchNorm2d over
(B, C, npoint, nsample); cross-device sync is done by constructing with an
``axis_name`` (the reference only syncs in ObjCls via SyncBatchNorm,
reference model/objcls.py:33-34).
"""

from __future__ import annotations

from typing import List, Optional

import jax
import jax.numpy as jnp
from flax import nnx

from sceneverse_tpu.ops.pointops import (
    ball_query,
    furthest_point_sample,
    gather_points,
    group_points,
)

Array = jax.Array


def _default_use_pallas() -> bool:
    """Fused Pallas sampling/grouping on TPU unless disabled via
    SCENEVERSE_NO_PALLAS=1; SCENEVERSE_PALLAS_INTERPRET=1 forces the kernel
    path on non-TPU backends (Pallas interpreter — the CPU mesh tests)."""
    import os

    if os.environ.get("SCENEVERSE_NO_PALLAS"):
        return False
    if os.environ.get("SCENEVERSE_PALLAS_INTERPRET"):
        return True
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def _pallas_interpret() -> bool:
    """Interpret-mode flag for kernel calls: Mosaic programs only execute on
    TPU; any other backend runs the interpreter."""
    return jax.default_backend() != "tpu"


def _maybe_dp_shard_map(fn, arrays, replicated=()):
    """Run ``fn(*arrays, *replicated)`` shard_mapped over the ambient 'dp'
    mesh axis (dim 0 of each array in ``arrays``; ``replicated`` operands —
    e.g. folded MLP weights — are whole on every device), or directly when
    there is no mesh / dim 0 doesn't divide dp. See parallel/mesh.py
    ambient_dp_mesh: GSPMD would otherwise all-gather and replicate the
    opaque pallas_call on every device."""
    from sceneverse_tpu.parallel.mesh import ambient_dp_mesh, dp_shard_map

    mesh = ambient_dp_mesh()
    if mesh is not None and all(
            a.shape[0] % mesh.shape["dp"] == 0 for a in arrays):
        return dp_shard_map(fn, mesh, len(arrays), len(replicated))(
            *arrays, *replicated)
    return fn(*arrays, *replicated)


def _bn_fold_enabled() -> bool:
    """Train-mode analytic BN fold (see ConvBNReLU). Default OFF: the fold
    is mathematically equivalent but its graph is MEMORY-HEAVIER at GPS
    scale — unfreeze b64 predicts 16.05 GiB (doesn't fit the v5e) vs the
    literal conv->BatchNorm->ReLU pipeline's fitting b64 at 491.6 scenes/s
    (round-5 A/B; fold-on had to halve to b32 -> 254.3).
    SCENEVERSE_BN_FOLD=on enables it (also a precondition of the fused
    sa_train kernels)."""
    import os

    return os.environ.get("SCENEVERSE_BN_FOLD", "off").lower() in (
        "1", "on", "true")


def _sa2_batched_enabled() -> bool:
    """Loop-free dense stage 1 for small-N SA levels (SA2): bit-equal to the
    per-object form (ops/pallas/sa_forward.py _kernel_dense_batched), kept
    as a measured experiment. Default OFF: on-chip the batched kernel ran
    ~2x SLOWER than the per-object unroll at SA2 GPS shapes (4.4 -> 9.2 ms;
    BASELINE.md round 5 — the broadcast/4D-pool value materialization costs
    more than the per-object instruction stream it removes)."""
    import os

    return os.environ.get("SCENEVERSE_SA2_BATCHED", "off").lower() in (
        "1", "on", "true")


def _sa_train_fused_enabled() -> bool:
    """Fused trainable-SA kernel (ops/pallas/sa_train.py: 3x conv+train-BN+
    ReLU + max-pool with the activation chain in VMEM). Default OFF: on-chip
    the fused path measured 358.7 scenes/s vs the XLA pipeline's 483.8 at
    the unfreeze b64 benchmark — its VJP kernels RECOMPUTE the chain
    (~47 ms/step) and the (C, rows) op-boundary relayout adds ~13 ms/step
    of copies, together exceeding the BN/wgrad/pool streams they remove
    (profiles in BASELINE.md round 5). Kept as a measured experiment;
    SCENEVERSE_SA_TRAIN_FUSED=on enables it."""
    import os

    return os.environ.get("SCENEVERSE_SA_TRAIN_FUSED", "off").lower() in (
        "1", "on", "true")


class ConvBNReLU(nnx.Module):
    """One SharedMLP layer: 1x1 conv (= matmul on the last dim), BN, ReLU.

    Mirrors reference pytorch_utils.py:68-120 ``_ConvBase``: no conv bias when
    BN is on, kaiming-normal kernel init, BN eps 1e-5 / torch momentum 0.1.

    TRAIN-MODE ANALYTIC BN FOLD (TPU-first formulation): because the layer
    feeding BatchNorm is linear, the batch statistics of the conv OUTPUT are
    exact functions of the conv INPUT's first two moments:

        mean_h = mean(x) @ W
        var_h[c] = w_c^T E[x x^T] w_c - mean_h[c]^2   (fast-variance form,
                                                       same as flax's)

    so train-mode BN folds into per-channel (a, b) applied inside the conv's
    own elementwise epilogue — relu((x@W)*a + b) — and the separate
    stats pass + normalize pass over the (B*obj, m, nsample, C) stream (the
    largest tensors of the trainable-vision step) never happen. E[x x^T] is
    one (C, C) f32-accumulated MXU dot. Autodiff through (a, b) reproduces
    the exact BatchNorm backward (gradients flow through the batch stats,
    as in torch/flax); running statistics update with the same momentum
    rule; cross-replica stats pmean over ``axis_name`` exactly like flax.
    Measured: unfreeze bench 486.3 -> see BASELINE.md round 4.
    """

    def __init__(self, din: int, dout: int, bn: bool = True,
                 axis_name: Optional[str] = None, *, rngs: nnx.Rngs):
        self.conv = nnx.Linear(
            din, dout, use_bias=not bn,
            kernel_init=nnx.initializers.kaiming_normal(), rngs=rngs,
        )
        self.axis_name = axis_name
        self.bn = (
            nnx.BatchNorm(
                dout, epsilon=1e-5, momentum=0.9, axis_name=axis_name, rngs=rngs
            )
            if bn
            else None
        )

    def _bn_training(self) -> bool:
        """True when BN would use batch statistics (train mode)."""
        ura = self.bn.use_running_average
        return ura is not None and not ura

    def __call__(self, x: Array) -> Array:
        if (self.bn is not None and self._bn_training()
                and _bn_fold_enabled()):
            return self._folded(x)
        x = self.conv(x)
        if self.bn is not None:
            # nnx.BatchNorm reduces over every non-feature axis, i.e. over
            # (batch, centers, samples) per channel — same as BatchNorm2d.
            x = self.bn(x)
        return jax.nn.relu(x)

    def _folded(self, x: Array) -> Array:
        bn = self.bn
        C = x.shape[-1]
        xr = x.reshape(-1, C)
        # input moments, f32-accumulated (converts fuse into the reduces —
        # the bf16 stream is read once, no f32 copy materializes)
        mu_in = jnp.mean(xr, axis=0, dtype=jnp.float32)  # (C,)
        gram = jax.lax.dot_general(  # E[x x^T] (C, C) f32
            xr, xr, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        ) / xr.shape[0]
        if self.axis_name is not None:
            mu_in = jax.lax.pmean(mu_in, self.axis_name)
            gram = jax.lax.pmean(gram, self.axis_name)
        w = self.conv.kernel.value.astype(jnp.float32)  # (C, H)
        mean_h = mu_in @ w  # (H,)
        # var[c] = w_c^T gram w_c - mean_h[c]^2, clipped like flax's
        # fast-variance path
        var_h = jnp.maximum(
            jnp.einsum("ch,cd,dh->h", w, gram, w,
                       precision=jax.lax.Precision.HIGHEST)
            - mean_h * mean_h, 0.0)
        # running-stats update: identical rule to nnx.BatchNorm.__call__
        sg = jax.lax.stop_gradient
        bn.mean.value = sg(bn.momentum * bn.mean.value
                           + (1 - bn.momentum) * mean_h)
        bn.var.value = sg(bn.momentum * bn.var.value
                          + (1 - bn.momentum) * var_h)
        a = jax.lax.rsqrt(var_h + bn.epsilon)  # grads DO flow (torch/flax)
        if bn.scale is not None:
            a = a * bn.scale.value.astype(jnp.float32)
        b = -mean_h * a
        if bn.bias is not None:
            b = b + bn.bias.value.astype(jnp.float32)
        h = self.conv(x)  # compute-dtype matmul, epilogue fuses
        out_dtype = bn.dtype or jnp.promote_types(x.dtype, jnp.float32)
        return jax.nn.relu(h * a + b).astype(out_dtype)


class SharedMLP(nnx.Module):
    """Stack of ConvBNReLU over the channel (last) dim
    (reference pytorch_utils.py:11-36)."""

    def __init__(self, spec: List[int], bn: bool = True,
                 axis_name: Optional[str] = None, *, rngs: nnx.Rngs):
        self.layers = nnx.List([
            ConvBNReLU(spec[i], spec[i + 1], bn=bn, axis_name=axis_name, rngs=rngs)
            for i in range(len(spec) - 1)
        ])

    def __call__(self, x: Array) -> Array:
        for layer in self.layers:
            x = layer(x)
        return x


class PointnetSAModule(nnx.Module):
    """Single-scale set-abstraction level
    (reference pointnet2_modules.py:26-151, single-grouper case).

    ``npoint=None`` means GroupAll (reference pointnet2_utils.py:376-419).
    """

    def __init__(self, *, npoint: Optional[int], radius: Optional[float],
                 nsample: Optional[int], mlp: List[int], bn: bool = True,
                 use_xyz: bool = True, axis_name: Optional[str] = None,
                 use_pallas: Optional[bool] = None, rngs: nnx.Rngs):
        self.npoint = npoint
        self.radius = radius
        self.nsample = nsample
        self.use_xyz = use_xyz
        self.use_pallas = (
            _default_use_pallas() if use_pallas is None else use_pallas
        )
        # exact: bit-parity gather (eval/ckpt conversion); fast: bf16 gather,
        # lossless w.r.t. the mixed-precision training path
        import os

        self.pallas_exact = os.environ.get("SCENEVERSE_PALLAS_FAST", "") == ""
        spec = list(mlp)
        if use_xyz:
            spec[0] += 3
        self.mlp = SharedMLP(spec, bn=bn, axis_name=axis_name, rngs=rngs)

    def __call__(self, xyz: Array, features: Optional[Array]):
        """xyz: (B, N, 3); features: (B, N, C) or None.

        Returns (new_xyz (B, npoint, 3) or None, new_features (B, npoint, C')).
        """
        # fully-fused frozen path: FPS+query+group+MLP+maxpool in one kernel
        # (BN must be frozen/eval; set via set_fused_frozen)
        if (self.npoint is not None and self.use_pallas
                and getattr(self, "fused_frozen", False)
                and len(self.mlp.layers) == 3):
            from sceneverse_tpu.ops.pallas.sa_forward import (
                fold_shared_mlp,
                fused_sa_forward_frozen,
            )

            pts = (
                jnp.concatenate([xyz, features], axis=-1)
                if features is not None else xyz
            )
            (w1, s1), (w2, s2), (w3, s3) = fold_shared_mlp(self.mlp)
            # Per-level block tuning (v5e sweep, BASELINE.md): large-N levels
            # (SA1) run everything in one kernel at a wide block; small-N
            # dense levels (SA2) are FPS-latency-bound at the block size the
            # stage-1/2 unroll allows, so FPS splits into its own wide-block
            # kernel feeding centers in (bit-identical outputs).
            small_n = pts.shape[1] < 256

            dense_batched = small_n and _sa2_batched_enabled()

            def fsa(pts, w1, s1, w2, s2, w3, s3):
                return fused_sa_forward_frozen(
                    pts, self.npoint, self.nsample, self.radius,
                    w1, s1, w2, s2, w3, s3,
                    64 if small_n else 128,  # block_objects (positional:
                    small_n,                 # custom_jvp nondiff args)
                    _pallas_interpret(),
                    dense_batched,           # loop-free dense stage 1 (SA2)
                )

            pooled, new_xyz = _maybe_dp_shard_map(
                fsa, (pts,), (w1, s1, w2, s2, w3, s3))
            return (jax.lax.stop_gradient(new_xyz),
                    jax.lax.stop_gradient(pooled))

        # frozen GroupAll (SA3): fold the eval-BN into per-layer affines and
        # run the MLP as flattened (B*N, C) bf16 matmuls. The generic path
        # leaves a (B, 1, N, C) layout whose BatchNorm/dtype round trips cost
        # ~5x the matmul time at GPS scale (measured 9.0 -> ~2 ms at G=10240).
        if (self.npoint is None and self.use_pallas
                and getattr(self, "fused_frozen", False)):
            from sceneverse_tpu.ops.pallas.sa_forward import fold_shared_mlp

            g = (
                jnp.concatenate([xyz, features], axis=-1)
                if features is not None and self.use_xyz
                else (features if features is not None else xyz)
            )  # (B, N, C)
            B, N, C = g.shape
            h = g.reshape(B * N, C)
            layers = fold_shared_mlp(self.mlp)
            for li, (wT, ab) in enumerate(layers):
                y = jax.lax.dot_general(
                    h.astype(jnp.bfloat16), wT.astype(jnp.bfloat16),
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # (B*N, H): wT is (H, Cin)
                h = jax.nn.relu(y * ab[:, 0] + ab[:, 1])
                if li + 1 < len(layers):
                    # the next dot casts to bf16 anyway; rounding HERE is
                    # bit-identical and halves the inter-layer HBM traffic
                    # (XLA fuses dot+affine+relu+round into one pass)
                    h = h.astype(jnp.bfloat16)
            h = h.reshape(B, N, -1)
            new_features = jnp.max(h, axis=1, keepdims=True)  # (B, 1, C')
            return None, jax.lax.stop_gradient(new_features)

        # the fused sampling kernel pays off on large point counts (SA1);
        # small levels (SA2: N=32) are cheap in XLA and would waste padding
        if self.npoint is not None and self.use_pallas and xyz.shape[1] >= 256:
            from sceneverse_tpu.ops.pallas.sample_group import sample_and_group

            pts = (
                jnp.concatenate([xyz, features], axis=-1)
                if features is not None else xyz
            )
            grouped, new_xyz = _maybe_dp_shard_map(
                lambda p: sample_and_group(
                    p, self.npoint, self.nsample, self.radius,
                    self.pallas_exact, interpret=_pallas_interpret(),
                ),
                (pts,),
            )
            if not self.use_xyz and features is not None:
                grouped = grouped[..., 3:]
        elif self.npoint is not None:
            fps_idx = furthest_point_sample(xyz, self.npoint)
            new_xyz = gather_points(xyz, fps_idx)  # (B, M, 3)
            idx = ball_query(self.radius, self.nsample, xyz, new_xyz)
            grouped_xyz = group_points(xyz, idx) - new_xyz[:, :, None, :]
            if features is not None:
                grouped_feats = group_points(features, idx)
                grouped = (
                    jnp.concatenate([grouped_xyz, grouped_feats], axis=-1)
                    if self.use_xyz
                    else grouped_feats
                )
            else:
                assert self.use_xyz
                grouped = grouped_xyz
        else:
            new_xyz = None
            # GroupAll: one "center" containing every point.
            grouped = (
                jnp.concatenate([xyz, features], axis=-1)
                if features is not None and self.use_xyz
                else (features if features is not None else xyz)
            )[:, None]  # (B, 1, N, 3+C)

        # TRAINABLE fused path (round 5): train-mode BN + full gradients with
        # the h1/h2/h3 activation chain kept in VMEM (ops/pallas/sa_train.py)
        # — the unfreeze step's dominant HBM streams. Falls back to the XLA
        # fold pipeline below when gated off or when the MLP shape/BN mode
        # doesn't match.
        if (self.use_pallas and _sa_train_fused_enabled()
                and _bn_fold_enabled() and len(self.mlp.layers) == 3
                and all(l.bn is not None and l._bn_training()
                        and l.bn.scale is not None and l.bn.bias is not None
                        for l in self.mlp.layers)):
            from sceneverse_tpu.ops.pallas import sa_train
            from sceneverse_tpu.parallel.mesh import ambient_dp_mesh

            mesh = ambient_dp_mesh()
            if mesh is not None and grouped.shape[0] % mesh.shape["dp"] != 0:
                mesh = None
            gG, gm, gns, _gc = grouped.shape
            if sa_train.supported(gG, gm, gns,
                                  mesh.shape["dp"] if mesh else 1):
                pooled = sa_train.fused_trainable_sa(
                    grouped, self.mlp, interpret=_pallas_interpret(),
                    mesh=mesh)
                return new_xyz, pooled

        h = self.mlp(grouped)  # (B, M, S, C')
        new_features = jnp.max(h, axis=2)  # max over samples (B, M, C')
        return new_xyz, new_features


class PointNetPP(nnx.Module):
    """PointNet++ encoder (reference modules/layers/pointnet.py:22-63).

    Input: (B, P, 3+C) point clouds (xyz + colors); output: (B, D) embeddings.
    """

    def __init__(self, sa_n_points: list, sa_n_samples: list, sa_radii: list,
                 sa_mlps: list, bn: bool = True, use_xyz: bool = True,
                 axis_name: Optional[str] = None, *, rngs: nnx.Rngs):
        n_sa = len(sa_n_points)
        if not (n_sa == len(sa_n_samples) == len(sa_radii) == len(sa_mlps)):
            raise ValueError("Lens of given hyper-params are not compatible")
        self.encoder = nnx.List([
            PointnetSAModule(
                npoint=sa_n_points[i],
                radius=sa_radii[i],
                nsample=sa_n_samples[i],
                mlp=sa_mlps[i],
                bn=bn,
                use_xyz=use_xyz,
                axis_name=axis_name,
                rngs=rngs,
            )
            for i in range(n_sa)
        ])
        out_n_points = sa_n_points[-1] if sa_n_points[-1] is not None else 1
        self.fc = nnx.Linear(out_n_points * sa_mlps[-1][-1], sa_mlps[-1][-1], rngs=rngs)

    def set_fused_frozen(self, enabled: bool = True):
        """Enable the fully-fused frozen-BN SA kernel on every level (valid
        only when BatchNorm runs with frozen/eval statistics — the GPS
        freeze configuration)."""
        for sa in self.encoder:
            sa.fused_frozen = enabled

    def __call__(self, features: Array) -> Array:
        """features: (B, P, 3 + C)."""
        xyz = features[..., :3]
        feats = features[..., 3:] if features.shape[-1] > 3 else None
        for sa in self.encoder:
            xyz, feats = sa(xyz, feats)
        return self.fc(feats.reshape(feats.shape[0], -1))


# ---------------------------------------------------------------------------
# SA/FP variant library (reference pointnet2_modules.py:78-496). None of
# these are used by the GPS model tree, but the reference ships them as part
# of its PointNet++ library surface; all channel-last, pure XLA ops.
# ---------------------------------------------------------------------------


def _query_group(xyz, new_xyz, features, radius, nsample, use_xyz,
                 normalize_xyz=False, sample_uniformly=False, key=None):
    """QueryAndGroup (reference pointnet2_utils.py:291-373), channel-last.

    ``sample_uniformly`` re-fills the pad slots (ball_query pads with the
    first in-ball index) with uniform draws from the ball's unique points
    (reference :333-342). The reference's torch.unique() additionally sorts
    the kept indices; the kept set and the fill distribution are identical,
    only the within-ball slot order differs — irrelevant downstream, where
    groups feed order-invariant pooled MLPs.

    Returns (grouped (B, M, S, C'), grouped_xyz (B, M, S, 3))."""
    idx = ball_query(radius, nsample, xyz, new_xyz)
    if sample_uniformly:
        d2 = jnp.sum((xyz[:, None, :, :] - new_xyz[:, :, None, :]) ** 2,
                     axis=-1)  # (B, M, N)
        cnt = jnp.clip(jnp.sum(d2 < radius * radius, axis=-1),
                       1, nsample)  # unique in-ball count (empty ball: {0})
        key = jax.random.PRNGKey(0) if key is None else key
        u = jax.random.uniform(key, idx.shape)
        rand_slot = jnp.floor(u * cnt[..., None]).astype(jnp.int32)
        resampled = jnp.take_along_axis(idx, rand_slot, axis=2)
        slot = jnp.arange(nsample)[None, None, :]
        idx = jnp.where(slot < cnt[..., None], idx, resampled)
    grouped_xyz = group_points(xyz, idx) - new_xyz[:, :, None, :]
    if normalize_xyz:
        grouped_xyz = grouped_xyz / radius
    if features is not None:
        grouped_feats = group_points(features, idx)
        grouped = (jnp.concatenate([grouped_xyz, grouped_feats], axis=-1)
                   if use_xyz else grouped_feats)
    else:
        grouped = grouped_xyz
    return grouped, grouped_xyz


class PointnetSAModuleMSG(nnx.Module):
    """Multi-scale-grouping set abstraction (reference
    pointnet2_modules.py:78-124): one FPS, one ball query + SharedMLP +
    max-pool per (radius, nsample, mlp) scale, per-scale features
    concatenated on the channel dim."""

    def __init__(self, *, npoint: Optional[int], radii: List[float],
                 nsamples: List[int], mlps: List[List[int]], bn: bool = True,
                 use_xyz: bool = True, axis_name: Optional[str] = None,
                 rngs: nnx.Rngs):
        assert len(radii) == len(nsamples) == len(mlps)
        self.npoint = npoint
        self.radii = list(radii)
        self.nsamples = list(nsamples)
        self.use_xyz = use_xyz
        self.mlps = nnx.List([
            SharedMLP([spec[0] + 3 if use_xyz else spec[0]] + list(spec[1:]),
                      bn=bn, axis_name=axis_name, rngs=rngs)
            for spec in mlps
        ])

    def __call__(self, xyz: Array, features: Optional[Array]):
        if self.npoint is not None:
            new_xyz = gather_points(xyz, furthest_point_sample(xyz, self.npoint))
        else:
            new_xyz = None
        outs = []
        for radius, nsample, mlp in zip(self.radii, self.nsamples, self.mlps):
            if self.npoint is not None:
                grouped, _ = _query_group(xyz, new_xyz, features, radius,
                                          nsample, self.use_xyz)
            else:  # GroupAll
                grouped = (jnp.concatenate([xyz, features], axis=-1)
                           if features is not None and self.use_xyz
                           else (features if features is not None else xyz)
                           )[:, None]
            outs.append(jnp.max(mlp(grouped), axis=2))  # (B, M, C_k)
        return new_xyz, jnp.concatenate(outs, axis=-1)


class PointnetSAModuleVotes(nnx.Module):
    """Single-scale SA with vote-index passthrough and max/avg/rbf pooling
    (reference pointnet2_modules.py:164-272). Returns (new_xyz,
    new_features, inds)."""

    def __init__(self, *, mlp: List[int], npoint: Optional[int] = None,
                 radius: Optional[float] = None, nsample: Optional[int] = None,
                 bn: bool = True, use_xyz: bool = True, pooling: str = "max",
                 sigma: Optional[float] = None, normalize_xyz: bool = False,
                 sample_uniformly: bool = False, ret_unique_cnt: bool = False,
                 axis_name: Optional[str] = None, rngs: nnx.Rngs):
        if ret_unique_cnt:
            assert sample_uniformly  # reference pointnet2_utils.py:311-312
        self.npoint = npoint
        self.radius = radius
        self.nsample = nsample
        self.pooling = pooling
        self.use_xyz = use_xyz
        self.sample_uniformly = sample_uniformly
        # fresh resampling draws per forward (reference torch.randint each
        # call, pointnet2_utils.py:340); the nnx stream threads through the
        # train state so every step draws new pad-slot fills
        self.resample_rngs = nnx.Rngs(rngs.default()) if sample_uniformly \
            else None
        self.ret_unique_cnt = ret_unique_cnt
        self.sigma = sigma if sigma is not None else (
            radius / 2 if radius is not None else None)
        self.normalize_xyz = normalize_xyz
        spec = list(mlp)
        if use_xyz and spec:
            spec[0] += 3
        self.mlp = SharedMLP(spec, bn=bn, axis_name=axis_name, rngs=rngs)

    def __call__(self, xyz: Array, features: Optional[Array],
                 inds: Optional[Array] = None, key: Optional[Array] = None):
        if inds is None:
            inds = furthest_point_sample(xyz, self.npoint)
        else:
            assert inds.shape[1] == self.npoint
        new_xyz = gather_points(xyz, inds) if self.npoint is not None else None

        if key is None and self.sample_uniformly:
            key = self.resample_rngs.default()
        if self.npoint is not None:
            grouped, grouped_xyz = _query_group(
                xyz, new_xyz, features, self.radius, self.nsample,
                self.use_xyz, normalize_xyz=self.normalize_xyz,
                sample_uniformly=self.sample_uniformly, key=key)
        else:
            grouped = (jnp.concatenate([xyz, features], axis=-1)
                       if features is not None and self.use_xyz
                       else (features if features is not None else xyz)
                       )[:, None]
            grouped_xyz = xyz[:, None]

        h = self.mlp(grouped)  # (B, M, S, C')
        if self.pooling == "max":
            out = jnp.max(h, axis=2)
        elif self.pooling == "avg":
            out = jnp.mean(h, axis=2)
        elif self.pooling == "rbf":
            # RBF-weighted sum normalized by nsample (reference :264-268)
            rbf = jnp.exp(-jnp.sum(grouped_xyz ** 2, axis=-1)
                          / (self.sigma ** 2) / 2)  # (B, M, S)
            out = jnp.sum(h * rbf[..., None], axis=2) / float(self.nsample)
        else:
            raise ValueError(f"unknown pooling {self.pooling!r}")
        if self.ret_unique_cnt:
            # unique within-ball points actually sampled = min(#within, S)
            # (reference pointnet2_utils.py ret_unique_cnt path)
            d2 = jnp.sum(
                (xyz[:, None, :, :] - new_xyz[:, :, None, :]) ** 2, axis=-1)
            cnt = jnp.minimum(
                jnp.sum(d2 < self.radius ** 2, axis=-1), self.nsample
            ).astype(jnp.int32)
            return new_xyz, out, inds, cnt
        return new_xyz, out, inds


class PointnetSAModuleMSGVotes(nnx.Module):
    """MSG set abstraction with vote-index passthrough (reference
    pointnet2_modules.py:274-354)."""

    def __init__(self, *, mlps: List[List[int]], npoint: Optional[int],
                 radii: List[float], nsamples: List[int], bn: bool = True,
                 use_xyz: bool = True, axis_name: Optional[str] = None,
                 rngs: nnx.Rngs):
        self.msg = PointnetSAModuleMSG(
            npoint=npoint, radii=radii, nsamples=nsamples, mlps=mlps, bn=bn,
            use_xyz=use_xyz, axis_name=axis_name, rngs=rngs)
        self.npoint = npoint

    def __call__(self, xyz: Array, features: Optional[Array],
                 inds: Optional[Array] = None):
        if inds is None:
            inds = furthest_point_sample(xyz, self.npoint)
        new_xyz = gather_points(xyz, inds) if self.npoint is not None else None
        outs = []
        for radius, nsample, mlp in zip(self.msg.radii, self.msg.nsamples,
                                        self.msg.mlps):
            grouped, _ = _query_group(xyz, new_xyz, features, radius, nsample,
                                      self.msg.use_xyz)
            outs.append(jnp.max(mlp(grouped), axis=2))
        return new_xyz, jnp.concatenate(outs, axis=-1), inds


class PointnetFPModule(nnx.Module):
    """Feature propagation: inverse-distance weighted 3-NN interpolation of
    ``known`` features onto ``unknown`` points, concat skip features, unit
    MLP (reference pointnet2_modules.py:356-416)."""

    def __init__(self, *, mlp: List[int], bn: bool = True,
                 axis_name: Optional[str] = None, rngs: nnx.Rngs):
        self.mlp = SharedMLP(mlp, bn=bn, axis_name=axis_name, rngs=rngs)

    def __call__(self, unknown: Array, known: Optional[Array],
                 unknown_feats: Optional[Array], known_feats: Array):
        """unknown (B,n,3); known (B,m,3) or None; unknown_feats (B,n,C1) or
        None; known_feats (B,m,C2) -> (B, n, mlp[-1])."""
        from sceneverse_tpu.ops.pointops import three_interpolate, three_nn

        if known is not None:
            dist, idx = three_nn(unknown, known)
            dist_recip = 1.0 / (dist + 1e-8)
            weight = dist_recip / jnp.sum(dist_recip, axis=2, keepdims=True)
            interp = three_interpolate(known_feats, idx, weight)
        else:
            interp = jnp.broadcast_to(
                known_feats, (known_feats.shape[0], unknown.shape[1],
                              known_feats.shape[2]))
        feats = (jnp.concatenate([interp, unknown_feats], axis=-1)
                 if unknown_feats is not None else interp)
        return self.mlp(feats[:, :, None, :])[:, :, 0, :]


class PointnetLFPModuleMSG(nnx.Module):
    """Learnable multi-scale feature propagation from xyz1 onto xyz2
    (reference pointnet2_modules.py:418-496): per scale, group xyz1's
    features around xyz2, SharedMLP + max-pool, concat xyz2 skip feats,
    post-MLP; scales concatenated."""

    def __init__(self, *, mlps: List[List[int]], radii: List[float],
                 nsamples: List[int], post_mlp: List[int], bn: bool = True,
                 use_xyz: bool = True, axis_name: Optional[str] = None,
                 rngs: nnx.Rngs):
        assert len(mlps) == len(nsamples) == len(radii)
        self.radii = list(radii)
        self.nsamples = list(nsamples)
        self.use_xyz = use_xyz
        self.post_mlp = SharedMLP(post_mlp, bn=bn, axis_name=axis_name,
                                  rngs=rngs)
        self.mlps = nnx.List([
            SharedMLP([spec[0] + 3 if use_xyz else spec[0]] + list(spec[1:]),
                      bn=bn, axis_name=axis_name, rngs=rngs)
            for spec in mlps
        ])

    def __call__(self, xyz2: Array, xyz1: Array, features2: Optional[Array],
                 features1: Optional[Array]):
        """xyz2 (B,N2,3), xyz1 (B,N1,3), features2 (B,N2,C2) or None,
        features1 (B,N1,C1) or None -> (B, N2, sum_k post_mlp[-1])."""
        outs = []
        for radius, nsample, mlp in zip(self.radii, self.nsamples, self.mlps):
            grouped, _ = _query_group(xyz1, xyz2, features1, radius, nsample,
                                      self.use_xyz)
            h = jnp.max(mlp(grouped), axis=2)  # (B, N2, C)
            if features2 is not None:
                h = jnp.concatenate([h, features2], axis=-1)
            outs.append(self.post_mlp(h[:, :, None, :])[:, :, 0, :])
        return jnp.concatenate(outs, axis=-1)
