"""Fused FPS + ball-query + grouping Pallas kernel — the PointNet++
set-abstraction front end in one VMEM-resident pass.

Why: the XLA composition (lax.fori FPS -> top_k ball query ->
take_along_axis gathers) round-trips HBM on every step and dominated the GPS
forward (~190ms of 268ms at batch 64x80 objects on v5e). Kernel design:

  * grid step = a block of ``BO`` objects; the sequential FPS loop runs
    vectorized across the block's objects (objects on sublanes, points on
    lanes — full VPU width),
  * ball-query ranks use a log-step shift-add scan (pltpu.roll + mask), not
    cumsum (unsupported in Mosaic) and not an O(N^2) triangular matmul,
  * the grouped gather is ONE f32 one-hot matmul per object on the MXU with
    HIGHEST precision (one-hot x value is exact; default bf16-pass matmuls
    would round the coordinates),
  * ball-query indices fall out of the same selection matrix via an
    iota-weighted column sum.

Semantics match sceneverse_tpu.ops.pointops (and therefore the reference
CUDA kernels, sampling_gpu.cu / ball_query_gpu.cu) exactly; parity is
enforced by tests/test_pallas_sample_group.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_EXACT = lax.Precision.HIGHEST  # 3-pass f32 on MXU: exact for one-hot gathers


def _kernel(pts_ref, ptst_ref, out_ref, newxyz_ref, fpsidx_ref, bqidx_ref,
            *, npoint, nsample, radius, n, c, bo, exact):
    """One block of ``bo`` objects per grid step.

    pts_ref  (bo, C, N) f32 — rows 0..2 xyz;
    ptst_ref (bo, N, C) f32 — same data, point-major (for sublane access);
    out_ref  (bo, nsample, C+3, npoint) f32;
    newxyz_ref (bo, 8, npoint) f32; fpsidx_ref (bo, 8, npoint) i32;
    bqidx_ref (bo, nsample, npoint) i32.
    """
    x = pts_ref[:, 0, :]  # (bo, N)
    y = pts_ref[:, 1, :]
    z = pts_ref[:, 2, :]
    valid = (x * x + y * y + z * z) > 1e-3
    lane = lax.broadcasted_iota(jnp.int32, (bo, n), 1)
    m_iota = lax.broadcasted_iota(jnp.int32, (bo, npoint), 1)

    # ------------- FPS, vectorized across the block's objects -------------
    # Centers fold into the same loop: step j's distance update already
    # extracts the coords of the point picked at step j-1, so a second
    # npoint-iteration extraction pass would double the reduction count.
    zeros_m = jnp.zeros((bo, npoint), jnp.float32)

    def fps_body(j, carry):
        old, mindist, idxs, cxa, cya, cza = carry  # old (bo, 1) i32
        sel = lane == old  # (bo, N)
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
        ).astype(jnp.int32)  # first-max tie-break
        idxs = jnp.where(m_iota == j, new, idxs)
        return new, mindist, idxs, cxa, cya, cza

    init = (jnp.zeros((bo, 1), jnp.int32),
            jnp.full((bo, n), 1e10, jnp.float32),
            jnp.zeros((bo, npoint), jnp.int32),
            zeros_m, zeros_m, zeros_m)
    last, _, fps_idxs, cxa, cya, cza = lax.fori_loop(1, npoint, fps_body, init)
    fpsidx_ref[:, 0, :] = fps_idxs

    # final center: the point picked at step npoint-1 (also the npoint == 1
    # case, where the loop never runs and last == index 0)
    sel = lane == last
    put = m_iota == (npoint - 1)
    cxa = jnp.where(put, jnp.sum(jnp.where(sel, x, 0.0), 1, keepdims=True), cxa)
    cya = jnp.where(put, jnp.sum(jnp.where(sel, y, 0.0), 1, keepdims=True), cya)
    cza = jnp.where(put, jnp.sum(jnp.where(sel, z, 0.0), 1, keepdims=True), cza)
    newxyz_ref[:, 0, :] = cxa
    newxyz_ref[:, 1, :] = cya
    newxyz_ref[:, 2, :] = cza

    # ------ per-object ball query + grouping (transposed, chunked MXU dots) --
    # slots are processed in chunks of ns_c (so the (N, m*ns_c) selection
    # temporaries fit scoped VMEM); columns within a chunk: j = s_local*m + c
    ns_c = max(1, min(nsample, 256 // npoint))
    while nsample % ns_c != 0:
        ns_c -= 1
    cols = npoint * ns_c
    col_slot = lax.broadcasted_iota(jnp.int32, (n, cols), 1) // npoint
    row_pt = lax.broadcasted_iota(jnp.int32, (n, cols), 0)  # k
    row_pt_m = lax.broadcasted_iota(jnp.int32, (n, npoint), 0)

    for b in range(bo):  # static unroll over the block
        xT = ptst_ref[b, :, 0:1]  # (N, 1)
        yT = ptst_ref[b, :, 1:2]
        zT = ptst_ref[b, :, 2:3]
        cxr = cxa[b:b + 1, :]  # (1, m)
        cyr = cya[b:b + 1, :]
        czr = cza[b:b + 1, :]
        d2T = (xT - cxr) ** 2 + (yT - cyr) ** 2 + (zT - czr) ** 2  # (N, m)
        withinT = (d2T < radius * radius).astype(jnp.float32)  # (N, m)
        ranksT = _shift_scan_cols(withinT, n)  # (N, m) inclusive along rows
        countr = ranksT[n - 1:n, :]  # (1, m)
        # first hit row per center; 0 when the ball is empty (CUDA zero-init)
        firstT = jnp.min(
            jnp.where(withinT > 0, row_pt_m, n), axis=0, keepdims=True
        )  # (1, m)
        firstT = jnp.where(firstT == n, 0, firstT)
        first_onehot = (row_pt_m == firstT).astype(jnp.float32)  # (N, m)

        # chunk-repeated views: tile along slots (period m)
        within_rep = pltpu.repeat(withinT, ns_c, 1)
        ranks_rep = pltpu.repeat(ranksT, ns_c, 1)
        first_rep = pltpu.repeat(first_onehot, ns_c, 1)
        count_rep = pltpu.repeat(countr, ns_c, 1)
        centers_b = jnp.concatenate([cxr, cyr, czr], axis=0)  # (3, m)
        pts_b = pts_ref[b, :, :]
        pts_dot = pts_b if exact else pts_b.astype(jnp.bfloat16)
        row_f = row_pt.astype(jnp.float32)

        for chunk in range(nsample // ns_c):
            slot_f = (col_slot + (chunk * ns_c + 1)).astype(jnp.float32)
            hit = within_rep * (ranks_rep == slot_f).astype(jnp.float32)
            sel = jnp.where(slot_f <= count_rep, hit, first_rep)  # (N, cols)
            # exact: 3-pass f32 MXU (lossless one-hot gather, for eval/parity)
            # fast: single-pass bf16 — lossless w.r.t. the bf16 training path
            # (the first MLP layer casts its input to bf16 anyway)
            grouped = lax.dot_general(
                pts_dot, sel if exact else sel.astype(jnp.bfloat16),
                (((1,), (0,)), ((), ())),
                precision=_EXACT if exact else lax.Precision.DEFAULT,
                preferred_element_type=jnp.float32,
            )  # (C, cols)
            # bq indices: iota-weighted column sums (exact in f32 for N<2^24)
            idx_f = jnp.sum(row_f * sel, axis=0, keepdims=True)
            for sl in range(ns_c):  # static: aligned contiguous writes
                s = chunk * ns_c + sl
                seg = slice(sl * npoint, (sl + 1) * npoint)
                out_ref[b, s, 0:3, :] = grouped[0:3, seg] - centers_b
                out_ref[b, s, 3:, :] = grouped[:, seg]
                bqidx_ref[b, s, :] = idx_f[0, seg].astype(jnp.int32)


def _shift_scan_cols(a: Array, n: int) -> Array:
    """Inclusive prefix-sum DOWN the rows (axis 0) of (N, m) f32.

    pltpu.roll follows numpy semantics (out[i] = x[i - s]); the wrapped head
    is masked off each step.
    """
    row = lax.broadcasted_iota(jnp.int32, a.shape, 0)
    r = a
    shift = 1
    while shift < n:
        rolled = pltpu.roll(r, shift, 0)
        r = r + jnp.where(row < shift, 0.0, rolled)
        shift *= 2
    return r


@functools.partial(jax.jit, static_argnames=("npoint", "nsample", "radius",
                                             "interpret", "block_objects",
                                             "exact"))
def fused_sample_and_group(pts: Array, npoint: int, nsample: int,
                           radius: float, interpret: bool = False,
                           block_objects: int = 16, exact: bool = True):
    """Fused SA front end.

    Args:
      pts: (G, N, C) float32 point clouds, channels-last, xyz first.
    Returns:
      grouped: (G, npoint, nsample, C) — centered xyz ++ raw non-xyz channels
               (QueryAndGroup(use_xyz=True) layout),
      new_xyz: (G, npoint, 3),
      fps_idx: (G, npoint) int32,
      bq_idx:  (G, npoint, nsample) int32.
    """
    G, N, C = pts.shape
    bo = block_objects
    while G % bo != 0:
        bo //= 2
    pts_t = jnp.swapaxes(pts, 1, 2).astype(jnp.float32)  # (G, C, N)
    pts_f = pts.astype(jnp.float32)

    kernel = functools.partial(
        _kernel, npoint=npoint, nsample=nsample, radius=float(radius),
        n=N, c=C, bo=bo, exact=exact,
    )
    out, newxyz, fpsidx, bqidx = pl.pallas_call(
        kernel,
        grid=(G // bo,),
        in_specs=[
            pl.BlockSpec((bo, C, N), lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bo, N, C), lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((bo, nsample, C + 3, npoint), lambda g: (g, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bo, 8, npoint), lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bo, 8, npoint), lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bo, nsample, npoint), lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((G, nsample, C + 3, npoint), jnp.float32),
            jax.ShapeDtypeStruct((G, 8, npoint), jnp.float32),
            jax.ShapeDtypeStruct((G, 8, npoint), jnp.int32),
            jax.ShapeDtypeStruct((G, nsample, npoint), jnp.int32),
        ),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(pts_t, pts_f)

    # out layout: (G, ns, C+3, m)
    centered = jnp.einsum("gscm->gmsc", out[:, :, 0:3])  # (G, m, ns, 3)
    raw = jnp.einsum("gscm->gmsc", out[:, :, 3:])  # (G, m, ns, C)
    grouped = jnp.concatenate([centered, raw[:, :, :, 3:]], axis=-1)
    new_xyz = jnp.swapaxes(newxyz[:, 0:3, :], 1, 2)
    fps_idx = fpsidx[:, 0, :]
    bq_idx = jnp.swapaxes(bqidx, 1, 2)  # (G, m, ns)
    return grouped, new_xyz, fps_idx, bq_idx


# ---------------------------------------------------------------------------
# Differentiable front door for the SA module: forward = fused kernel,
# backward = deterministic scatter-adds from the saved indices (the CUDA
# reference uses atomicAdd backward kernels, group_points_gpu.cu:44-74).
# ---------------------------------------------------------------------------
@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4, 5))
def sample_and_group(pts: Array, npoint: int, nsample: int, radius: float,
                     exact: bool = True, interpret: bool = False):
    """(G, N, C) -> (grouped (G, m, ns, C), new_xyz (G, m, 3))."""
    grouped, new_xyz, _, _ = fused_sample_and_group(
        pts, npoint, nsample, radius, exact=exact, interpret=interpret
    )
    return grouped, new_xyz


def _sg_fwd(pts, npoint, nsample, radius, exact, interpret):
    grouped, new_xyz, fps_idx, bq_idx = fused_sample_and_group(
        pts, npoint, nsample, radius, exact=exact, interpret=interpret
    )
    return (grouped, new_xyz), (fps_idx, bq_idx, pts.shape)


def _sg_bwd(npoint, nsample, radius, exact, interpret, res, grads):
    fps_idx, bq_idx, shape = res
    dgrouped, dnew = grads
    G, N, C = shape
    base = (jnp.arange(G, dtype=jnp.int32) * N)[:, None]
    bq_flat = (bq_idx.reshape(G, -1) + base).reshape(-1)  # (G*m*ns,)
    fps_flat = (fps_idx + base).reshape(-1)  # (G*m,)

    dpts = jnp.zeros((G * N, C), dgrouped.dtype)
    # grouped[..., :3] = xyz[bq] - xyz[fps-center]; grouped[..., 3:] = feats[bq]
    dpts = dpts.at[bq_flat].add(dgrouped.reshape(-1, C))
    dcenter = -jnp.sum(dgrouped[..., :3], axis=2).reshape(-1, 3)  # (G*m, 3)
    dcenter = dcenter + dnew.reshape(-1, 3)
    dpts = dpts.at[fps_flat, :3].add(dcenter)
    return (dpts.reshape(G, N, C),)


sample_and_group.defvjp(_sg_fwd, _sg_bwd)
