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
            pooled_ref, newxyz_ref, g_ref, *, npoint, nsample, radius, n, bo,
            hs):
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

    # ---- FPS across the block (same selection math as sample_group._kernel).
    # The coords of the point picked at step j-1 are already extracted inside
    # step j's distance update, so the centers accumulate in the same loop —
    # a second extraction pass over npoint would double the reduction count
    # (it measured as ~half the kernel's FPS time).
    zeros_m = jnp.zeros((bo, npoint), jnp.float32)

    def fps_body(j, carry):
        old, mindist, idxs, cxa, cya, cza = carry
        sel = lane == old
        xi = jnp.sum(jnp.where(sel, x, 0.0), axis=1, keepdims=True)
        yi = jnp.sum(jnp.where(sel, y, 0.0), axis=1, keepdims=True)
        zi = jnp.sum(jnp.where(sel, z, 0.0), axis=1, keepdims=True)
        put = m_iota == (j - 1)
        cxa = jnp.where(put, xi, cxa)
        cya = jnp.where(put, yi, cya)
        cza = jnp.where(put, zi, cza)
        d = (x - xi) ** 2 + (y - yi) ** 2 + (z - zi) ** 2
        mindist = jnp.where(valid, jnp.minimum(mindist, d), mindist)
        cand = jnp.where(valid, mindist, -1.0)
        best = jnp.max(cand, axis=1, keepdims=True)
        new = jnp.min(
            jnp.where(cand == best, lane, n), axis=1, keepdims=True
        ).astype(jnp.int32)
        idxs = jnp.where(m_iota == j, new, idxs)
        return new, mindist, idxs, cxa, cya, cza

    init = (jnp.zeros((bo, 1), jnp.int32),
            jnp.full((bo, n), 1e10, jnp.float32),
            jnp.zeros((bo, npoint), jnp.int32),
            zeros_m, zeros_m, zeros_m)
    last, _, fps_idxs, cxa, cya, cza = lax.fori_loop(1, npoint, fps_body, init)

    # final center: the point chosen at step npoint-1 (loop extracted only
    # through npoint-2); also covers npoint == 1 where the loop never runs
    sel = lane == last
    put = m_iota == (npoint - 1)
    cxa = jnp.where(put, jnp.sum(jnp.where(sel, x, 0.0), 1, keepdims=True), cxa)
    cya = jnp.where(put, jnp.sum(jnp.where(sel, y, 0.0), 1, keepdims=True), cya)
    cza = jnp.where(put, jnp.sum(jnp.where(sel, z, 0.0), 1, keepdims=True), cza)
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

    # Stage 1 — per-object ball query + gather into the VMEM scratch. The
    # grouped (C, npoint*nsample) slab per object is cheap to hold; deferring
    # the MLP lets stage 2 batch it across objects (3 wide MXU dots per
    # segment instead of 3 tiny dots per object per chunk — the per-call MXU
    # overhead of ~200 small matmuls per block dominated this kernel).
    opc = npoint * nsample  # scratch columns per object
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
        # hoist the slot-index algebra out of the chunk loop: comparing
        # (ranks - slot) / (count - slot) against a per-chunk scalar saves
        # two full-width adds per chunk
        slot0 = col_slot.astype(jnp.float32)
        ranks_rel = ranks_rep - slot0
        count_rel = count_rep - slot0

        for chunk in range(nsample // ns_c):
            c1 = jnp.float32(chunk * ns_c + 1)
            hit = within_rep * (ranks_rel == c1).astype(jnp.float32)
            sel = jnp.where(count_rel >= c1, hit, first_rep)
            grouped = lax.dot_general(
                pts_b, sel.astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (C, cols)
            g = jnp.concatenate(
                [grouped[0:3, :] - centers_rep, grouped[3:, :]], axis=0
            )  # (C, cols): centered xyz ++ features
            off = b * opc + chunk * cols
            g_ref[:, off:off + cols] = g

    # Stage 2 — object-batched MLP + slot max-pool. Numerics are identical
    # to the per-object dots: each scratch column goes through the same
    # bf16-operand / f32-accumulate contraction regardless of batching.
    sobj = max(1, 4096 // opc)
    while bo % sobj != 0:
        sobj -= 1
    for s in range(0, bo, sobj):
        g = g_ref[:, s * opc:(s + sobj) * opc]
        h = jnp.maximum(dotT(w1, g) * a1 + b1, 0.0)
        h = jnp.maximum(dotT(w2, h) * a2 + b2, 0.0)
        h = jnp.maximum(dotT(w3, h) * a3 + b3, 0.0)  # (H3, sobj*opc)
        for bb in range(sobj):
            pooled = jnp.full((h3, npoint), -3.0e38, jnp.float32)
            for sl in range(nsample):
                seg = slice(bb * opc + sl * npoint,
                            bb * opc + (sl + 1) * npoint)
                pooled = jnp.maximum(pooled, h[:, seg])
            pooled_ref[s + bb, :, :] = pooled


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
        scratch_shapes=[pltpu.VMEM((C, bo * npoint * nsample), jnp.float32)],
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
