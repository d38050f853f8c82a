"""TRAINABLE fused set-abstraction MLP: 3x(conv+train-BN+ReLU) + max-pool
over grouped point rows, forward AND backward in VMEM.

The unfreeze path (reference all_pretrain_unfreeze.yaml; BatchNorm in train
mode, full gradients) ran the SharedMLP as XLA matmuls over the grouped
streams — at GPS scale the (B*obj, m, ns, H) activations are the step's
largest tensors (0.67-1.34 GB each at batch 64), and the round-4 trace put
BN fwd+bwd reductions, conv weight-grads and pool fwd/bwd at ~48 of the
128.9 ms step. Here the activation chain h1/h2/h3 NEVER touches HBM: the
small grouped tensor (63 MB at SA1's C=6) is re-streamed through VMEM
passes instead.

Train-mode BatchNorm rides the ANALYTIC FOLD (modules/layers/pointnet.py
ConvBNReLU._folded): because conv is linear, the batch statistics of its
output are exact functions of the INPUT moments (mean_h = mean(x) @ W,
var_h = w^T E[xx^T] w - mean_h^2), so BN becomes a per-channel (a, b)
affine fused into the conv epilogue. The layer-k fold needs the moments of
h_{k-1}, which creates a sequential structure — resolved as three cheap
passes over grouped (the MLP FLOPs are trivial; the streams were the cost):

    XLA:    moments(grouped)                    -> (a1, b1)
    Pallas: mlp_stats(grouped, L1)              -> moments(h1) -> (a2, b2)
    Pallas: mlp_stats(grouped, L1, L2)          -> moments(h2) -> (a3, b3)
    Pallas: mlp_pool (grouped, L1, L2, L3)      -> pooled, argmax

Each Pallas op carries a full custom VJP whose backward kernel RECOMPUTES
the chain in VMEM (flash-style) and accumulates dW/da/db across grid steps;
the stats ops' moment outputs propagate cotangents (dS, dG) back into the
rows (dh_r += dS + (dG + dG^T) h_r), so gradients flow through the batch
statistics exactly as in torch/flax BatchNorm (same composite math as
autodiff through ConvBNReLU._folded — equivalence tested in
tests/test_sa_train.py).

Max-pool backward routes each (center, channel) gradient to the SAVED
argmax row only. jnp.max's VJP may split ties evenly, but with ReLU
activations any tie at the max is at 0 (z <= 0), where relu' kills the
gradient — so first-argmax routing is gradient-equivalent (non-zero ties
are measure-zero). CUDA reference: max_pool backward also routes to a
single saved index.

Pooling requires grouped's CUDA padding semantics (ball_query pads empty
slots with the first hit / point 0 — reference ball_query_gpu.cu:34-38), so
the max over ns slots needs no mask — exactly what ops/pointops.ball_query
and sample_group produce.

Reference being replaced: modules/third_party/pointnet2/pytorch_utils.py
SharedMLP (conv2d+BatchNorm2d+ReLU stacks) + F.max_pool2d over samples
(pointnet2_modules.py:34-75).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

# accumulator sublane rows: per-block row sums land in 8 sublane groups
# (full f32 tile); XLA sums the 8 rows after the kernel
_ACC_ROWS = 8


def _dot(x, w):
    """bf16-operand, f32-accumulate matmul (the mixed-precision contract of
    the XLA path: every conv casts inputs to bf16, accumulates f32)."""
    return lax.dot_general(x.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
                           (((1,), (0,)), ((), ())),
                           preferred_element_type=jnp.float32)


def _dot_cr(x_cr, w):
    """Layer-1 dot from the TRANSPOSED (C, rows) input block: contracts the
    sublane (channel) dim -> (rows, H). The (C, rows) operand layout is the
    whole point of this file's op boundaries: pallas in/outputs force padded
    row-major tiling, and a (rows, C) tensor with C = 6 pads its lane dim
    6 -> 128 (21x memory — a 2.5 GB copy of SA1's grouped tensor in the
    first on-chip compile); (C, rows) pads only sublanes (6 -> 8)."""
    return lax.dot_general(x_cr.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
                           (((0,), (0,)), ((), ())),
                           preferred_element_type=jnp.float32)


def _chain_fwd(x_cr, params, upto):
    """h_j for j = 1..upto. x_cr (C, rows) f32/bf16; params[j] = (W, a, b)
    with W (C_j, H_j), a/b (1, H_j) f32 rows. Returns list of h_j
    (rows, H_j) f32. Inter-layer inputs round-trip bf16 (matching the XLA
    path where each conv reads the previous layer's bf16 output)."""
    hs = []
    h = None
    for j in range(upto):
        w, a, b = params[j]
        u = _dot_cr(x_cr, w) if j == 0 else _dot(h, w)
        h = jnp.maximum(u * a + b, 0.0)
        hs.append(h)
    return hs


def _stats_kernel(x_ref, *refs, upto, hdims):
    """Accumulate sum(h_upto) into (8, H) and gram(h_upto) into (H, H)."""
    params = []
    i = 0
    for j in range(upto):
        w_ref, s_ref = refs[i], refs[i + 1]
        params.append((w_ref[:, :], s_ref[0:1, :], s_ref[1:2, :]))
        i += 2
    sum_ref, gram_ref = refs[i], refs[i + 1]

    h = _chain_fwd(x_ref[:, :], params, upto)[-1]  # (rows, H)
    rows, H = h.shape
    # moments are taken over the bf16-ROUNDED stream — exactly the values
    # the next conv consumes and exactly what the XLA fold sees when the
    # inter-layer stream is bf16 (SCENEVERSE_BN_BF16 default)
    hb = h.astype(jnp.bfloat16)
    h32 = hb.astype(jnp.float32)
    # per-sublane-group partial sums: (8, H)
    part = jnp.sum(h32.reshape(_ACC_ROWS, rows // _ACC_ROWS, H), axis=1)
    gram = lax.dot_general(hb, hb, (((0,), (0,)), ((), ())),
                           preferred_element_type=jnp.float32)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        sum_ref[:, :] = jnp.zeros_like(sum_ref)
        gram_ref[:, :] = jnp.zeros_like(gram_ref)

    sum_ref[:, :] += part
    gram_ref[:, :] += gram


def _chain_bwd_block(x_cr, params, dh, upto, dparams_refs, init):
    """Backprop dh (cotangent of h_upto) through layers upto..1.

    Recomputes the forward chain from x_cr (C, rows); accumulates dW (C,H),
    da/db rows into dparams_refs[j] = (dw_ref, ds_ref) where ds_ref rows are
    [da; db]; returns dx in the TRANSPOSED (C, rows) layout."""
    hs = _chain_fwd(x_cr, params, upto)
    d = dh
    for j in range(upto - 1, -1, -1):
        w, a, b = params[j]
        first = j == 0
        u = _dot_cr(x_cr, w) if first else _dot(hs[j - 1], w)
        z = u * a + b
        dz = jnp.where(z > 0.0, d, 0.0)
        da = jnp.sum(dz * u, axis=0, keepdims=True)   # (1, H)
        db = jnp.sum(dz, axis=0, keepdims=True)
        du = dz * a
        if first:  # dW = x @ du, contracting rows of the (C, rows) input
            dw = lax.dot_general(
                x_cr.astype(jnp.bfloat16), du.astype(jnp.bfloat16),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        else:
            dw = lax.dot_general(                     # (C, H) f32
                hs[j - 1].astype(jnp.bfloat16), du.astype(jnp.bfloat16),
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        dw_ref, ds_ref = dparams_refs[j]

        @pl.when(init)
        def _init():
            dw_ref[:, :] = jnp.zeros_like(dw_ref)
            ds_ref[:, :] = jnp.zeros_like(ds_ref)

        dw_ref[:, :] += dw
        ds_ref[0:1, :] += da
        ds_ref[1:2, :] += db
        if first:  # dx in (C, rows): W @ du^T
            d = lax.dot_general(
                w.astype(jnp.bfloat16), du.astype(jnp.bfloat16),
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
        else:
            d = lax.dot_general(                      # dh_{j-1} = du @ W^T
                du.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
    return d


def _stats_bwd_kernel(x_ref, *refs, upto, hdims):
    """VJP of _stats_kernel: dh_r = dS + h_r @ (dG + dG^T); chain back."""
    params = []
    i = 0
    for j in range(upto):
        w_ref, s_ref = refs[i], refs[i + 1]
        params.append((w_ref[:, :], s_ref[0:1, :], s_ref[1:2, :]))
        i += 2
    ds_ref, dg_ref = refs[i], refs[i + 1]
    i += 2
    dx_ref = refs[i]
    dparams_refs = []
    for j in range(upto):
        dparams_refs.append((refs[i + 1 + 2 * j], refs[i + 2 + 2 * j]))

    x = x_ref[:, :]
    h = _chain_fwd(x, params, upto)[-1]
    dsym = dg_ref[:, :] + jnp.swapaxes(dg_ref[:, :], 0, 1)  # (H, H)
    dh = ds_ref[0:1, :] + lax.dot_general(
        h.astype(jnp.bfloat16), dsym.astype(jnp.bfloat16),
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    dx = _chain_bwd_block(x, params, dh, upto, dparams_refs,
                          pl.program_id(0) == 0)
    dx_ref[:, :] = dx


def _pool_kernel(x_ref, *refs, nsample, hdims):
    """Full 3-layer chain + max/argmax over each object's ns slots."""
    params = []
    i = 0
    for j in range(3):
        w_ref, s_ref = refs[i], refs[i + 1]
        params.append((w_ref[:, :], s_ref[0:1, :], s_ref[1:2, :]))
        i += 2
    pooled_ref, arg_ref = refs[i], refs[i + 1]

    h3 = _chain_fwd(x_ref[:, :], params, 3)[-1]  # (rows, H3)
    rows, H3 = h3.shape
    nc = rows // nsample  # (g, center) groups in this block
    h3g = h3.reshape(nc, nsample, H3)
    mx = jnp.max(h3g, axis=1)  # (nc, H3)
    slot = lax.broadcasted_iota(jnp.int32, h3g.shape, 1)
    arg = jnp.min(jnp.where(h3g == mx[:, None, :], slot, nsample),
                  axis=1).astype(jnp.int32)
    pooled_ref[:, :] = mx
    arg_ref[:, :] = arg


def _pool_bwd_kernel(x_ref, *refs, nsample, hdims):
    """Route d_pooled to the saved argmax slot of each (center, channel),
    then chain back through the 3 layers."""
    params = []
    i = 0
    for j in range(3):
        w_ref, s_ref = refs[i], refs[i + 1]
        params.append((w_ref[:, :], s_ref[0:1, :], s_ref[1:2, :]))
        i += 2
    dpool_ref, arg_ref = refs[i], refs[i + 1]
    i += 2
    dx_ref = refs[i]
    dparams_refs = [(refs[i + 1 + 2 * j], refs[i + 2 + 2 * j])
                    for j in range(3)]

    x = x_ref[:, :]  # (C, rows)
    rows = x.shape[1]
    nc = rows // nsample
    H3 = dpool_ref.shape[1]
    slot = lax.broadcasted_iota(jnp.int32, (nc, nsample, H3), 1)
    dh3 = jnp.where(slot == arg_ref[:, :][:, None, :],
                    dpool_ref[:, :][:, None, :], 0.0).reshape(rows, H3)
    dx = _chain_bwd_block(x, params, dh3, 3, dparams_refs,
                          pl.program_id(0) == 0)
    dx_ref[:, :] = dx


# ---------------------------------------------------------------------------
# pallas_call wrappers
# ---------------------------------------------------------------------------


def _row_block(n_rows: int, row_quant: int, dims):
    """Rows per grid step: a multiple of ``row_quant`` that divides
    ``n_rows``, sized so the forward chain's VMEM residency (x + every h_j
    at f32, conservatively) stays ~12 MB. Rows ride the LANE dim of the
    (C, rows) input blocks, so multi-block grids also need 128-aligned
    block offsets (Mosaic lane-store rule) — quantize to lcm(quant, 128)
    unless the whole array is one block."""
    if n_rows % row_quant != 0:
        raise ValueError(f"rows {n_rows} not a multiple of {row_quant} "
                         "(need whole 8-row groups / whole centers)")
    import math

    quant = math.lcm(row_quant, 128)
    if n_rows % quant != 0:
        return n_rows  # single block (full lane dim: no offset alignment)
    target = max(quant, (12 << 20) // max(1, 4 * sum(dims)))
    per = max(1, target // quant) * quant
    per = min(per, n_rows)
    while n_rows % per != 0:
        per -= quant
    return per


def _layer_operands(params):
    ops, specs = [], []
    const = lambda shape: pl.BlockSpec(shape, lambda g: (0,) * len(shape),
                                       memory_space=pltpu.VMEM)
    for (w, a, b) in params:
        wb = w.astype(jnp.bfloat16)
        s = jnp.concatenate([a.reshape(1, -1), b.reshape(1, -1)], axis=0)
        ops += [wb, s.astype(jnp.float32)]
        specs += [const(wb.shape), const(s.shape)]
    return ops, specs


def _interpret_default(interpret):
    if interpret is None:
        return jax.default_backend() != "tpu"
    return interpret


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def mlp_stats(x, params, upto: int, interpret: bool | None = None):
    """Sum and gram of h_upto over all rows. x (C, R) TRANSPOSED rows (see
    _dot_cr for why); params tuple of (W (C_j, H_j), a (H_j,), b (H_j,)).
    Returns (sum (H,), gram (H, H))."""
    s8, gram = _mlp_stats_fwd_impl(x, params, upto, interpret)
    return s8.sum(axis=0), gram


def _mlp_stats_fwd_impl(x, params, upto, interpret):
    C, R = x.shape
    H = params[upto - 1][0].shape[1]
    per = _row_block(R, _ACC_ROWS, (C,) + tuple(p[0].shape[1] for p in params[:upto]))
    ops, specs = _layer_operands(params[:upto])
    kern = functools.partial(_stats_kernel, upto=upto,
                             hdims=tuple(p[0].shape[1] for p in params))
    s8, gram = pl.pallas_call(
        kern,
        grid=(R // per,),
        in_specs=[pl.BlockSpec((C, per), lambda g: (0, g),
                               memory_space=pltpu.VMEM)] + specs,
        out_specs=(
            pl.BlockSpec((_ACC_ROWS, H), lambda g: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, H), lambda g: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((_ACC_ROWS, H), jnp.float32),
            jax.ShapeDtypeStruct((H, H), jnp.float32),
        ),
        interpret=_interpret_default(interpret),
        compiler_params=None if _interpret_default(interpret)
        else pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(x, *ops)
    return s8, gram


def _mlp_stats_fwd(x, params, upto, interpret):
    out = mlp_stats(x, params, upto, interpret)
    return out, (x, params)


def _mlp_stats_bwd(upto, interpret, res, cots):
    x, params = res
    dS, dG = cots
    C, R = x.shape
    per = _row_block(R, _ACC_ROWS, (C,) + tuple(p[0].shape[1] for p in params[:upto]))
    ops, specs = _layer_operands(params[:upto])
    const = lambda shape: pl.BlockSpec(shape, lambda g: (0,) * len(shape),
                                       memory_space=pltpu.VMEM)
    H = params[upto - 1][0].shape[1]
    dS2 = dS.reshape(1, H).astype(jnp.float32)
    # pad the 1-row cotangent to 8 sublanes (Mosaic tile rule); row 0 real
    dS8 = jnp.concatenate([dS2, jnp.zeros((_ACC_ROWS - 1, H), jnp.float32)],
                          axis=0)
    out_specs = [pl.BlockSpec((C, per), lambda g: (0, g),
                              memory_space=pltpu.VMEM)]
    out_shapes = [jax.ShapeDtypeStruct((C, R), jnp.float32)]
    for j in range(upto):
        cj, hj = params[j][0].shape
        out_specs += [const((cj, hj)), const((2, hj))]
        out_shapes += [jax.ShapeDtypeStruct((cj, hj), jnp.float32),
                       jax.ShapeDtypeStruct((2, hj), jnp.float32)]
    kern = functools.partial(_stats_bwd_kernel, upto=upto,
                             hdims=tuple(p[0].shape[1] for p in params))
    outs = pl.pallas_call(
        kern,
        grid=(R // per,),
        in_specs=([pl.BlockSpec((C, per), lambda g: (0, g),
                                memory_space=pltpu.VMEM)] + specs
                  + [const((_ACC_ROWS, H)), const((H, H))]),
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shapes),
        interpret=_interpret_default(interpret),
        compiler_params=None if _interpret_default(interpret)
        else pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(x, *ops, dS8, dG.astype(jnp.float32))
    dx = outs[0].astype(x.dtype)
    dparams = []
    for j in range(len(params)):
        if j < upto:
            dw = outs[1 + 2 * j].astype(params[j][0].dtype)
            ds = outs[2 + 2 * j]
            da = ds[0].astype(params[j][1].dtype)
            db = ds[1].astype(params[j][2].dtype)
        else:  # layers beyond `upto` receive zero cotangents
            dw = jnp.zeros_like(params[j][0])
            da = jnp.zeros_like(params[j][1])
            db = jnp.zeros_like(params[j][2])
        dparams.append((dw, da, db))
    return dx, tuple(dparams)


mlp_stats.defvjp(_mlp_stats_fwd, _mlp_stats_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def mlp_pool(x, params, nsample: int, interpret: bool | None = None):
    """3-layer chain + max over each consecutive ``nsample`` rows.

    x (C, R) TRANSPOSED rows with R = n_centers * nsample (slot-minor: rows
    of one center are consecutive); returns pooled (R // nsample, H3)."""
    pooled, _ = _mlp_pool_fwd_impl(x, params, nsample, interpret)
    return pooled


def _mlp_pool_fwd_impl(x, params, nsample, interpret):
    C, R = x.shape
    H3 = params[2][0].shape[1]
    per = _row_block(R, nsample * _ACC_ROWS, (C,) + tuple(p[0].shape[1] for p in params))
    ops, specs = _layer_operands(params)
    nc = per // nsample
    kern = functools.partial(_pool_kernel, nsample=nsample,
                             hdims=tuple(p[0].shape[1] for p in params))
    pooled, arg = pl.pallas_call(
        kern,
        grid=(R // per,),
        in_specs=[pl.BlockSpec((C, per), lambda g: (0, g),
                               memory_space=pltpu.VMEM)] + specs,
        out_specs=(
            pl.BlockSpec((nc, H3), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nc, H3), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((R // nsample, H3), jnp.float32),
            jax.ShapeDtypeStruct((R // nsample, H3), jnp.int32),
        ),
        interpret=_interpret_default(interpret),
        compiler_params=None if _interpret_default(interpret)
        else pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(x, *ops)
    return pooled, arg


def _mlp_pool_fwd(x, params, nsample, interpret):
    pooled, arg = _mlp_pool_fwd_impl(x, params, nsample, interpret)
    return pooled, (x, params, arg)


def _mlp_pool_bwd(nsample, interpret, res, dpooled):
    x, params, arg = res
    C, R = x.shape
    per = _row_block(R, nsample * _ACC_ROWS, (C,) + tuple(p[0].shape[1] for p in params))
    nc = per // nsample
    ops, specs = _layer_operands(params)
    const = lambda shape: pl.BlockSpec(shape, lambda g: (0,) * len(shape),
                                       memory_space=pltpu.VMEM)
    H3 = params[2][0].shape[1]
    out_specs = [pl.BlockSpec((C, per), lambda g: (0, g),
                              memory_space=pltpu.VMEM)]
    out_shapes = [jax.ShapeDtypeStruct((C, R), jnp.float32)]
    for j in range(3):
        cj, hj = params[j][0].shape
        out_specs += [const((cj, hj)), const((2, hj))]
        out_shapes += [jax.ShapeDtypeStruct((cj, hj), jnp.float32),
                       jax.ShapeDtypeStruct((2, hj), jnp.float32)]
    kern = functools.partial(_pool_bwd_kernel, nsample=nsample,
                             hdims=tuple(p[0].shape[1] for p in params))
    outs = pl.pallas_call(
        kern,
        grid=(R // per,),
        in_specs=([pl.BlockSpec((C, per), lambda g: (0, g),
                                memory_space=pltpu.VMEM)] + specs
                  + [pl.BlockSpec((nc, H3), lambda g: (g, 0),
                                  memory_space=pltpu.VMEM),
                     pl.BlockSpec((nc, H3), lambda g: (g, 0),
                                  memory_space=pltpu.VMEM)]),
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shapes),
        interpret=_interpret_default(interpret),
        compiler_params=None if _interpret_default(interpret)
        else pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(x, *ops, dpooled.astype(jnp.float32), arg)
    dx = outs[0].astype(x.dtype)
    dparams = []
    for j in range(3):
        dw = outs[1 + 2 * j].astype(params[j][0].dtype)
        ds = outs[2 + 2 * j]
        dparams.append((dw, ds[0].astype(params[j][1].dtype),
                        ds[1].astype(params[j][2].dtype)))
    return dx, tuple(dparams)


mlp_pool.defvjp(_mlp_pool_fwd, _mlp_pool_bwd)


# ---------------------------------------------------------------------------
# Composite: grouped rows -> train-BN folded MLP -> pooled.
#
# Split into a PURE core (arrays in, arrays out — safe to jax.shard_map over
# a dp mesh, with the batch moments psum'd inside over ``axis_name``) and a
# thin module wrapper that reads the SharedMLP's parameters and writes the
# BN running-statistics updates OUTSIDE any shard_map (nnx state mutation
# inside a raw shard_map body would leak tracers).
# ---------------------------------------------------------------------------


def fused_trainable_sa_fn(x, convs, bns, ns: int, axis_name=None,
                          interpret: bool | None = None):
    """Pure core. x (C, R) TRANSPOSED grouped rows (R = n_centers * ns,
    slot-minor; see _dot_cr for the layout rationale); convs = (W1, W2, W3)
    with W_j (C_j, H_j); bns[j] = (scale|None, bias|None, eps) — train-mode
    BatchNorm folded analytically.

    Returns (pooled (R//ns, H3) f32, ((mean_h, var_h) per layer) for the
    running-stat updates). Gradients flow through the batch statistics
    exactly as in torch/flax BN (the fold is differentiable).
    """
    R = x.shape[1]
    n_total = jnp.float32(R)
    if axis_name is not None:
        n_total = n_total * jax.lax.psum(1, axis_name)

    def pmean_moments(s, g):
        if axis_name is not None:
            s = jax.lax.psum(s, axis_name)
            g = jax.lax.psum(g, axis_name)
        return s / n_total, g / n_total

    def fold(w, bn, mean_in, gram_in):
        scale, bias, eps = bn
        w32 = w.astype(jnp.float32)
        mean_h = mean_in @ w32
        var_h = jnp.maximum(
            jnp.einsum("ch,cd,dh->h", w32, gram_in, w32,
                       precision=jax.lax.Precision.HIGHEST)
            - mean_h * mean_h, 0.0)
        a = jax.lax.rsqrt(var_h + eps)
        if scale is not None:
            a = a * scale.astype(jnp.float32)
        b = -mean_h * a
        if bias is not None:
            b = b + bias.astype(jnp.float32)
        return a, b, mean_h, var_h

    # layer 1: input moments straight from the (C, R) rows (XLA fused
    # reduce + one (C, C) HIGHEST dot — C is tiny)
    s0 = jnp.sum(x.astype(jnp.float32), axis=1)
    g0 = jax.lax.dot_general(x, x, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32,
                             precision=jax.lax.Precision.HIGHEST)
    mean0, gram0 = pmean_moments(s0, g0)
    a1, b1, mh1, vh1 = fold(convs[0], bns[0], mean0, gram0)

    p1 = ((convs[0], a1, b1),)
    s1, g1 = mlp_stats(x, p1, 1, interpret)
    mean1, gram1 = pmean_moments(s1, g1)
    a2, b2, mh2, vh2 = fold(convs[1], bns[1], mean1, gram1)

    p2 = (p1[0], (convs[1], a2, b2))
    s2, g2 = mlp_stats(x, p2, 2, interpret)
    mean2, gram2 = pmean_moments(s2, g2)
    a3, b3, mh3, vh3 = fold(convs[2], bns[2], mean2, gram2)

    p3 = (p2[0], p2[1], (convs[2], a3, b3))
    pooled = mlp_pool(x, p3, ns, interpret)
    stats = ((mh1, vh1), (mh2, vh2), (mh3, vh3))
    return pooled, stats


def supported(G: int, m: int, ns: int, dp: int = 1) -> bool:
    """Shape gate for the fused trainable path: whole centers per block AND
    8-divisible center counts per shard (Mosaic sublane tiling of the
    pooled/argmax blocks)."""
    if dp > 1 and G % dp != 0:
        return False
    return ((G // max(dp, 1)) * m) % _ACC_ROWS == 0


def fused_trainable_sa(grouped: Array, mlp, interpret: bool | None = None,
                       mesh=None) -> Array:
    """SharedMLP (3 ConvBNReLU layers, BatchNorm TRAIN mode) + max-pool over
    the sample axis, fused.

    grouped: (G, m, ns, C) — CUDA-padded groups (empty slots duplicate the
    first hit / point 0), so pooling needs no mask. mlp: the
    modules.layers.pointnet.SharedMLP. Updates each layer's BN running
    statistics with the same momentum rule as ConvBNReLU._folded; returns
    pooled (G, m, H3) in the BN out dtype.

    Under a dp mesh (``mesh``), the core shard_maps over 'dp' with the
    moments psum'd inside — the exact cross-replica SyncBatchNorm semantics
    ConvBNReLU gets from its ``axis_name``.
    """
    G, m, ns, C = grouped.shape
    layers = list(mlp.layers)
    assert len(layers) == 3
    # transpose to (C, R): the kernels' op-boundary layout (small channel
    # counts pad 8 sublanes instead of 128 lanes — see _dot_cr)
    x = jnp.transpose(grouped.reshape(G * m * ns, C))
    convs = tuple(layer.conv.kernel.value for layer in layers)
    bns = tuple((None if layer.bn.scale is None else layer.bn.scale.value,
                 None if layer.bn.bias is None else layer.bn.bias.value,
                 layer.bn.epsilon) for layer in layers)

    if mesh is not None:
        from jax.sharding import PartitionSpec as P

        # None scale/bias can't ride shard_map operands; GPS BN always has
        # affine params, so just require them here
        assert all(s is not None and b is not None
                   for (s, b, _e) in bns), "fused trainable SA needs affine BN"

        def body(x, *flat):
            convs_ = flat[0:3]
            bns_ = tuple((flat[3 + 2 * j], flat[4 + 2 * j],
                          layers[j].bn.epsilon) for j in range(3))
            return fused_trainable_sa_fn(x, convs_, bns_, ns,
                                         axis_name="dp",
                                         interpret=interpret)

        flat_bn = []
        for (s, b, _e) in bns:
            flat_bn += [s, b]
        # x shards on its ROW dim (dim 1 of the (C, R) layout — R//dp stays
        # whole-objects because rows are (g, center, slot)-ordered); pooled
        # is dim-0 sharded; the moment outputs are psum'd inside and
        # therefore shard-identical -> replicated out spec
        in_specs = (P(None, "dp"),) + (P(),) * 9
        out_specs = (P("dp"), tuple((P(), P()) for _ in range(3)))
        pooled, stats = jax.shard_map(
            body, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
            check_vma=False)(x, *convs, *flat_bn)
    else:
        pooled, stats = fused_trainable_sa_fn(x, convs, bns, ns,
                                              axis_name=None,
                                              interpret=interpret)

    # running-stat updates (same momentum rule as nnx.BatchNorm / _folded)
    sg = jax.lax.stop_gradient
    for layer, (mh, vh) in zip(layers, stats):
        bn = layer.bn
        bn.mean.value = sg(bn.momentum * bn.mean.value
                           + (1 - bn.momentum) * mh)
        bn.var.value = sg(bn.momentum * bn.var.value
                          + (1 - bn.momentum) * vh)

    bn = layers[2].bn
    out_dtype = bn.dtype or jnp.promote_types(grouped.dtype, jnp.float32)
    return pooled.reshape(G, m, -1).astype(out_dtype)
