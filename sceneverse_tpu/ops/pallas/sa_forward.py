"""Fully-fused set-abstraction FORWARD kernel: FPS + ball query + grouping +
SharedMLP (+ folded frozen BatchNorm + ReLU) + max-pool, one VMEM pass.

The two-stage path (sample_group kernel -> XLA MLP) writes the grouped
(G, m, ns, C) tensor to HBM (1.3GB lane-padded at GPS scale) and streams
multi-hundred-MB MLP intermediates. Here the grouped block never leaves
VMEM: the kernel applies the per-point MLP on the (C, cols) gather result in
registers and writes only the max-pooled (C_out, m) per object — HBM output
shrinks ~256x and the MLP becomes a handful of well-shaped MXU dots.

Restriction: BatchNorm must be frozen/eval (stats folded into scale/shift) —
exactly the GPS configuration (reference all_pretrain.yaml:216 freeze: True,
pcd_openvocab_encoder.py:121-129 freeze_bn). Training with live BN stats uses
the two-stage path. Forward-only: the frozen encoder is stop-gradient'd
downstream, so no VJP is required (and none is defined).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sceneverse_tpu.ops.pallas.sample_group import _shift_scan_cols

Array = jax.Array


def _kernel(pts_ref, ptst_ref, w1_ref, s1_ref, w2_ref, s2_ref, w3_ref, s3_ref,
            pooled_ref, newxyz_ref, *, npoint, nsample, radius, n, bo, hs):
    """Block of ``bo`` objects. w_i refs are (H_i, Cin_i) bf16 (pre-transposed
    kernels); s_i refs are (2, H_i) f32 [scale; shift] (BN folded, or
    [1; bias]). pooled_ref (bo, H3, m) f32; newxyz_ref (bo, 8, m) f32."""
    h1, h2, h3 = hs
    x = pts_ref[:, 0, :]
    y = pts_ref[:, 1, :]
    z = pts_ref[:, 2, :]
    valid = (x * x + y * y + z * z) > 1e-3
    lane = lax.broadcasted_iota(jnp.int32, (bo, n), 1)
    m_iota = lax.broadcasted_iota(jnp.int32, (bo, npoint), 1)

    # ---- FPS across the block (identical to sample_group._kernel) ----
    def fps_body(j, carry):
        old, mindist, idxs = carry
        sel = lane == old
        xi = jnp.sum(jnp.where(sel, x, 0.0), axis=1, keepdims=True)
        yi = jnp.sum(jnp.where(sel, y, 0.0), axis=1, keepdims=True)
        zi = jnp.sum(jnp.where(sel, z, 0.0), axis=1, keepdims=True)
        d = (x - xi) ** 2 + (y - yi) ** 2 + (z - zi) ** 2
        mindist = jnp.where(valid, jnp.minimum(mindist, d), mindist)
        cand = jnp.where(valid, mindist, -1.0)
        best = jnp.max(cand, axis=1, keepdims=True)
        new = jnp.min(
            jnp.where(cand == best, lane, n), axis=1, keepdims=True
        ).astype(jnp.int32)
        idxs = jnp.where(m_iota == j, new, idxs)
        return new, mindist, idxs

    init = (jnp.zeros((bo, 1), jnp.int32),
            jnp.full((bo, n), 1e10, jnp.float32),
            jnp.zeros((bo, npoint), jnp.int32))
    _, _, fps_idxs = lax.fori_loop(1, npoint, fps_body, init)

    def center_body(i, acc):
        cxa, cya, cza = acc
        cur = jnp.sum(jnp.where(m_iota == i, fps_idxs, 0), axis=1, keepdims=True)
        sel = lane == cur
        put = m_iota == i
        cxa = jnp.where(put, jnp.sum(jnp.where(sel, x, 0.0), 1, keepdims=True), cxa)
        cya = jnp.where(put, jnp.sum(jnp.where(sel, y, 0.0), 1, keepdims=True), cya)
        cza = jnp.where(put, jnp.sum(jnp.where(sel, z, 0.0), 1, keepdims=True), cza)
        return cxa, cya, cza

    zeros_m = jnp.zeros((bo, npoint), jnp.float32)
    cxa, cya, cza = lax.fori_loop(0, npoint, center_body,
                                  (zeros_m, zeros_m, zeros_m))
    newxyz_ref[:, 0, :] = cxa
    newxyz_ref[:, 1, :] = cya
    newxyz_ref[:, 2, :] = cza

    # ---- per-object: ball query + gather + MLP + max-pool ----
    ns_c = max(1, min(nsample, 256 // npoint))
    while nsample % ns_c != 0:
        ns_c -= 1
    cols = npoint * ns_c
    col_slot = lax.broadcasted_iota(jnp.int32, (n, cols), 1) // npoint
    row_pt_m = lax.broadcasted_iota(jnp.int32, (n, npoint), 0)

    w1 = w1_ref[:, :]
    w2 = w2_ref[:, :]
    w3 = w3_ref[:, :]
    # s refs are (H, 2) so the per-row affine broadcasts over columns
    # without any in-register transpose (Mosaic has none)
    a1, b1 = s1_ref[:, 0:1], s1_ref[:, 1:2]
    a2, b2 = s2_ref[:, 0:1], s2_ref[:, 1:2]
    a3, b3 = s3_ref[:, 0:1], s3_ref[:, 1:2]

    def dotT(w, h):  # (H, Cin) x (Cin, cols) -> (H, cols), f32 accumulate
        return lax.dot_general(
            w, h.astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    for b in range(bo):
        xT = ptst_ref[b, :, 0:1]
        yT = ptst_ref[b, :, 1:2]
        zT = ptst_ref[b, :, 2:3]
        cxr = cxa[b:b + 1, :]
        cyr = cya[b:b + 1, :]
        czr = cza[b:b + 1, :]
        d2T = (xT - cxr) ** 2 + (yT - cyr) ** 2 + (zT - czr) ** 2
        withinT = (d2T < radius * radius).astype(jnp.float32)
        ranksT = _shift_scan_cols(withinT, n)
        countr = ranksT[n - 1:n, :]
        firstT = jnp.min(jnp.where(withinT > 0, row_pt_m, n), axis=0,
                         keepdims=True)
        firstT = jnp.where(firstT == n, 0, firstT)
        first_onehot = (row_pt_m == firstT).astype(jnp.float32)

        within_rep = pltpu.repeat(withinT, ns_c, 1)
        ranks_rep = pltpu.repeat(ranksT, ns_c, 1)
        first_rep = pltpu.repeat(first_onehot, ns_c, 1)
        count_rep = pltpu.repeat(countr, ns_c, 1)
        centers_b = jnp.concatenate([cxr, cyr, czr], axis=0)  # (3, m)
        centers_rep = pltpu.repeat(centers_b, ns_c, 1)  # (3, cols)
        pts_b = pts_ref[b, :, :].astype(jnp.bfloat16)

        pooled = jnp.full((h3, npoint), -3.0e38, jnp.float32)
        for chunk in range(nsample // ns_c):
            slot_f = (col_slot + (chunk * ns_c + 1)).astype(jnp.float32)
            hit = within_rep * (ranks_rep == slot_f).astype(jnp.float32)
            sel = jnp.where(slot_f <= count_rep, hit, first_rep)
            grouped = lax.dot_general(
                pts_b, sel.astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (C, cols)
            g = jnp.concatenate(
                [grouped[0:3, :] - centers_rep, grouped[3:, :]], axis=0
            )  # (C, cols): centered xyz ++ features
            h = jnp.maximum(dotT(w1, g) * a1 + b1, 0.0)
            h = jnp.maximum(dotT(w2, h) * a2 + b2, 0.0)
            h = jnp.maximum(dotT(w3, h) * a3 + b3, 0.0)  # (H3, cols)
            for sl in range(ns_c):
                seg = slice(sl * npoint, (sl + 1) * npoint)
                pooled = jnp.maximum(pooled, h[:, seg])
        pooled_ref[b, :, :] = pooled


@functools.partial(jax.jit, static_argnames=("npoint", "nsample", "radius",
                                             "interpret", "block_objects"))
def fused_sa_forward(pts: Array, npoint: int, nsample: int, radius: float,
                     w1, s1, w2, s2, w3, s3, interpret: bool = False,
                     block_objects: int = 16):
    """Fused frozen-SA forward.

    Args:
      pts: (G, N, C) f32, xyz-first channels.
      w_i: (H_i, Cin_i) pre-transposed layer kernels (any float dtype).
      s_i: (H_i, 2) f32 columns [scale, shift] (eval-BN folded affine).
    Returns:
      pooled: (G, npoint, H3) f32 — post-MLP max-pooled features,
      new_xyz: (G, npoint, 3) f32.
    """
    G, N, C = pts.shape
    bo = block_objects
    while G % bo != 0:
        bo //= 2
    hs = (w1.shape[0], w2.shape[0], w3.shape[0])
    pts_t = jnp.swapaxes(pts, 1, 2).astype(jnp.float32)
    pts_f = pts.astype(jnp.float32)
    w1, w2, w3 = (w.astype(jnp.bfloat16) for w in (w1, w2, w3))
    s1, s2, s3 = (s.astype(jnp.float32) for s in (s1, s2, s3))

    kernel = functools.partial(
        _kernel, npoint=npoint, nsample=nsample, radius=float(radius),
        n=N, bo=bo, hs=hs,
    )
    const = lambda *shape: pl.BlockSpec(shape, lambda g: (0,) * len(shape),
                                        memory_space=pltpu.VMEM)
    pooled, newxyz = pl.pallas_call(
        kernel,
        grid=(G // bo,),
        in_specs=[
            pl.BlockSpec((bo, C, N), lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bo, N, C), lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            const(*w1.shape), const(*s1.shape),
            const(*w2.shape), const(*s2.shape),
            const(*w3.shape), const(*s3.shape),
        ],
        out_specs=(
            pl.BlockSpec((bo, hs[2], npoint), lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bo, 8, npoint), lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((G, hs[2], npoint), jnp.float32),
            jax.ShapeDtypeStruct((G, 8, npoint), jnp.float32),
        ),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(pts_t, pts_f, w1, s1, w2, s2, w3, s3)

    return jnp.swapaxes(pooled, 1, 2), jnp.swapaxes(newxyz[:, 0:3, :], 1, 2)


def fold_shared_mlp(shared_mlp):
    """Extract (wT, [scale; shift]) per layer from a SharedMLP with
    frozen/eval BatchNorm: BN(conv(x)) = conv(x) * a + b with
    a = gamma / sqrt(var + eps), b = beta - mean * a."""
    import numpy as np

    params = []
    for layer in shared_mlp.layers:
        w = layer.conv.kernel[...]  # (din, dout)
        wT = jnp.swapaxes(w, 0, 1)
        if layer.bn is not None:
            bn = layer.bn
            a = bn.scale[...] / jnp.sqrt(bn.var[...] + bn.epsilon)
            b = bn.bias[...] - bn.mean[...] * a
        else:
            a = jnp.ones((w.shape[1],), jnp.float32)
            b = (layer.conv.bias[...] if layer.conv.bias is not None
                 else jnp.zeros((w.shape[1],), jnp.float32))
        params.append((wT, jnp.stack([a, b], axis=1)))
    return params


# ---------------------------------------------------------------------------
# Autodiff-opaque wrapper: the frozen path is stop-gradient'd downstream, but
# jax still LINEARIZES the forward when a surrounding value_and_grad runs —
# and the pallas call has no JVP rule. A zero-tangent custom_jvp makes the
# kernel opaque; it is only ever used under freeze=True where these gradients
# are discarded anyway.
# ---------------------------------------------------------------------------
@functools.partial(jax.custom_jvp, nondiff_argnums=(1, 2, 3))
def fused_sa_forward_frozen(pts, npoint, nsample, radius,
                            w1, s1, w2, s2, w3, s3):
    return fused_sa_forward(pts, npoint, nsample, radius,
                            w1, s1, w2, s2, w3, s3)


@fused_sa_forward_frozen.defjvp
def _fsa_jvp(npoint, nsample, radius, primals, tangents):
    del tangents
    out = fused_sa_forward_frozen(primals[0], npoint, nsample, radius,
                                  *primals[1:])
    return out, jax.tree.map(jnp.zeros_like, out)
