"""Fully-fused set-abstraction FORWARD kernel: FPS + ball query + grouping +
SharedMLP (+ folded frozen BatchNorm + ReLU) + max-pool, one VMEM pass.

The two-stage path (sample_group kernel -> XLA MLP) writes the grouped
(G, m, ns, C) tensor to HBM (1.3GB lane-padded at GPS scale) and streams
multi-hundred-MB MLP intermediates. Here the grouped block never leaves
VMEM and only the max-pooled (m, C_out) per object is written.

The per-object pipeline runs in the TRANSPOSED (centers-on-sublanes,
points-on-lanes) orientation: masks are (m, N) instead of (N, m), which
cuts their vreg footprint 4x at m=32 (no 32→128 lane padding), the rank
prefix-sum scans along lanes, the MLP weights load in their natural
(Cin, H) layout, and both the single (bo, C, N) input and the (bo, m, H3)
output stream lane-compact. This measured 2.9x faster than the
(N, m)-oriented version at GPS SA1 scale with bit-identical outputs.
Grouped slabs land in a VMEM scratch so the shared MLP runs object-batched
(3 wide MXU dots per segment rather than 3 tiny dots per object per chunk).

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

Array = jax.Array


def _scan_lanes(a: Array, n: int) -> Array:
    """Inclusive prefix-sum along lanes (axis 1) of (m, N) f32.

    pltpu.roll follows numpy semantics (out[i] = x[i - s]); the wrapped head
    is masked off each step."""
    col = lax.broadcasted_iota(jnp.int32, a.shape, 1)
    r = a
    shift = 1
    while shift < n:
        rolled = pltpu.roll(r, shift, 1)
        r = r + jnp.where(col < shift, 0.0, rolled)
        shift *= 2
    return r


def _row_to_col(row: Array, m: int) -> Array:
    """(1, m) -> (m, 1). Mosaic has no in-register transpose; broadcast the
    row over sublanes, mask the diagonal, reduce over lanes (m <= 128)."""
    b = jnp.broadcast_to(row, (m, m))
    i = lax.broadcasted_iota(jnp.int32, (m, m), 0)
    j = lax.broadcasted_iota(jnp.int32, (m, m), 1)
    return jnp.sum(jnp.where(i == j, b, 0.0), axis=1, keepdims=True)


def _stage2_pool_dense(g_ref, wm_ref, pooled_ref, w2, a2, b2, w3, a3, b3, *,
                       npoint, n, bo, h3, opc):
    """Dense-pairs stage 2: object-batched MLP layers 2..3 over all
    (center, point) pairs, then a within-masked max over points with the
    empty-ball fallback pair (c, 0).

    The mask scratch is stored TRANSPOSED — (n, m) per object — so the pool
    is one reshape + masked max over the leading (point) axis instead of n
    python-unrolled (m, h3) maxima per object (the unrolled form was
    instruction-issue-bound, not VPU-bound)."""
    m = npoint
    sobj = max(1, 4096 // opc)
    while bo % sobj != 0:
        sobj -= 1

    def dot(h, w):
        return lax.dot_general(h.astype(jnp.bfloat16), w,
                               (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)

    for s in range(0, bo, sobj):
        h = g_ref[s * opc:(s + sobj) * opc, :]
        h = jnp.maximum(dot(h, w2) * a2 + b2, 0.0)
        h = jnp.maximum(dot(h, w3) * a3 + b3, 0.0)  # (sobj*opc, H3)
        for bb in range(sobj):
            o = s + bb
            wmt = wm_ref[o * n:(o + 1) * n, :]  # (n, m) transposed within
            h3d = h[bb * opc:(bb + 1) * opc, :].reshape(n, m, h3)
            masked = jnp.where(wmt[:, :, None] > 0, h3d, -3.0e38)
            pooled = jnp.max(masked, axis=0)  # (m, h3)
            count_col = _row_to_col(jnp.sum(wmt, axis=0, keepdims=True), m)
            # pair (c, 0): empty-ball pick (CUDA zero-init -> point 0)
            pooled_ref[o, :, :] = jnp.where(count_col > 0, pooled, h3d[0])


def _kernel_dense_batched(ptsT_ref, cin_ref, xyz_ref,
                          w1_ref, s1_ref, w2_ref, s2_ref, w3_ref, s3_ref,
                          pooled_ref, *, npoint, radius, n, bo, hs,
                          pool4d=True):
    """DENSE path vectorized over CHUNKS of objects (the SA2 configuration:
    nsample >= n, centers from the split FPS kernel).

    The per-object dense loop in `_kernel` issues ~10 tiny vector ops and two
    sub-tile dots per object; at bo=64 that is instruction-issue-bound, not
    VPU/MXU-bound (the same structure as SA1's measured 13 ms n-independent
    overhead). Measured iterations (BASELINE.md round 5): (1) whole-block
    values — 2.1x SLOWER (the ~17 MB f32 intermediates saturate VMEM and
    serialize Mosaic's pipeline); (2) object chunks + an XLA-side
    pre-repeated (8, G*n*m) centers operand — still 2.1x slower at every
    chunk size, pool form irrelevant: the pre-repeated operand's VMEM tiling
    makes its DMA 512-byte-strided. This version keeps the chunking
    (`bo_c = max(1, 4096 // opc)` objects per iteration) but computes
    everything from NATURAL-layout operands in-kernel:

      * masks: (bo_c, n, m) in one shot — points splat into sublanes,
        centers into lanes, no flattened coordinate operand.
      * layer-1 projection: one (C, bo_c*n) x (C, H1) MXU dot per chunk (K
        and per-element accumulation order identical to the per-object
        dots -> bit-equal).
      * the centering term: center coords transpose lanes->sublanes via a
        batched one-hot mask (one op per chunk), one (bo_c*m, 3) x (3, H1)
        dot, then 4D broadcasts pair it against the projected points.
      * pool: one masked max over the point axis of the chunk's
        (bo_c, n, m, h3) activations, with the empty-ball (c, 0) fallback.

    Pair-row layout (p-major, r = p*m + c) and all numerics (bf16-operand /
    f32-accumulate dots, bf16 round-trip of projected points AND of the h1
    activations — matching `_kernel`'s bf16 g_ref scratch) are IDENTICAL to
    `_kernel`'s dense path — outputs are bit-equal
    (tests/test_sa_forward.py)."""
    m = npoint
    opc = m * n
    h1, h2, h3 = hs
    w1 = w1_ref[:, :]
    w2 = w2_ref[:, :]
    w3 = w3_ref[:, :]
    a1, b1 = s1_ref[0:1, :], s1_ref[1:2, :]
    a2, b2 = s2_ref[0:1, :], s2_ref[1:2, :]
    a3, b3 = s3_ref[0:1, :], s3_ref[1:2, :]

    bo_c = max(1, min(bo, 4096 // opc))
    while bo % bo_c != 0:
        bo_c -= 1
    rows_c = bo_c * n

    def dot0(x, w):
        return lax.dot_general(x.astype(jnp.bfloat16), w,
                               (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)

    def dot1(h, w):
        return lax.dot_general(h.astype(jnp.bfloat16), w,
                               (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)

    def rows_to_cols(a):
        """(bo_c, m) lanes -> (bo_c*m, 1) sublane column (batched one-hot
        lane transpose — same trick as _row_to_col, one op per chunk)."""
        b = jnp.broadcast_to(a[:, None, :], (bo_c, m, m))
        i = lax.broadcasted_iota(jnp.int32, (bo_c, m, m), 1)
        j = lax.broadcasted_iota(jnp.int32, (bo_c, m, m), 2)
        return jnp.sum(jnp.where(i == j, b, 0.0), axis=2,
                       keepdims=True).reshape(bo_c * m, 1)

    for s in range(0, bo, bo_c):
        # ---- within masks: (bo_c, n, m) in one shot (points splat into
        # sublanes, centers into lanes — no pre-flattened coord operand) ----
        x = xyz_ref[s:s + bo_c, 0, :]
        y = xyz_ref[s:s + bo_c, 1, :]
        z = xyz_ref[s:s + bo_c, 2, :]  # (bo_c, n)
        cxa = cin_ref[s:s + bo_c, 0, :]
        cya = cin_ref[s:s + bo_c, 1, :]
        cza = cin_ref[s:s + bo_c, 2, :]  # (bo_c, m)
        d2 = ((x[:, :, None] - cxa[:, None, :]) ** 2
              + (y[:, :, None] - cya[:, None, :]) ** 2
              + (z[:, :, None] - cza[:, None, :]) ** 2)  # (bo_c, n, m)
        within = (d2 < radius * radius).astype(jnp.float32).reshape(
            rows_c, m)

        # ---- layer-1 pair features ----
        pw = dot0(ptsT_ref[:, s * n:s * n + rows_c], w1)  # (bo_c*n, H1)
        # bf16 round-trip: bit-match with `_kernel`'s dense/selection paths
        pw = pw.astype(jnp.bfloat16).astype(jnp.float32)
        # centers3 rows via the batched one-hot transpose, then ONE dot —
        # same contraction (K=3, f32 accumulate) as `_kernel`'s per-object
        # cw1 -> bit-equal
        centers3 = jnp.concatenate(
            [rows_to_cols(cxa), rows_to_cols(cya), rows_to_cols(cza)],
            axis=1)  # (bo_c*m, 3)
        cw1 = lax.dot_general(
            centers3.astype(jnp.bfloat16), w1[0:3, :],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        ).reshape(bo_c, m, h1)
        pw4 = jnp.broadcast_to(
            pw.reshape(bo_c, n, 1, h1), (bo_c, n, m, h1))
        cw14 = jnp.broadcast_to(cw1[:, None, :, :], (bo_c, n, m, h1))
        # bf16 round-trip matches `_kernel`'s bf16 g_ref scratch
        g = jnp.maximum(
            a1 * (pw4 - cw14) + b1, 0.0).astype(jnp.bfloat16).reshape(
            bo_c * opc, h1)

        # ---- stage 2 + masked pool, fused into the chunk ----
        h = jnp.maximum(dot1(g, w2) * a2 + b2, 0.0)
        h = jnp.maximum(dot1(h, w3) * a3 + b3, 0.0)  # (bo_c*opc, H3)
        if pool4d:
            h4 = h.reshape(bo_c, n, m, h3)
            w4 = within.reshape(bo_c, n, m)[:, :, :, None]
            pooled = jnp.max(jnp.where(w4 > 0, h4, -3.0e38), axis=1)
            count = jnp.sum(within.reshape(bo_c, n, m), axis=1)  # (bo_c, m)
            # pair (c, 0): empty-ball pick (CUDA zero-init -> point 0)
            pooled_ref[s:s + bo_c, :, :] = jnp.where(
                count[:, :, None] > 0, pooled, h4[:, 0])
        else:
            # per-object 3D pool (bisection variant: isolates the 4D
            # where/max lowering from the batched stage 1)
            for bb in range(bo_c):
                h3d = h[bb * opc:(bb + 1) * opc, :].reshape(n, m, h3)
                wmt = within[bb * n:(bb + 1) * n, :]  # (n, m)
                masked = jnp.where(wmt[:, :, None] > 0, h3d, -3.0e38)
                pooled = jnp.max(masked, axis=0)  # (m, h3)
                count_col = _row_to_col(
                    jnp.sum(wmt, axis=0, keepdims=True), m)
                pooled_ref[s + bb, :, :] = jnp.where(
                    count_col > 0, pooled, h3d[0])


def _fps_inline(x, y, z, lane, newxyz_ref, *, npoint, n, bo):
    """FPS selection over (bo, n) coordinate rows; writes (bo, 8, m) centers
    into newxyz_ref and returns (cxa, cya, cza) center accumulators.

    The coords of the point picked at step j-1 are extracted inside step j's
    distance update, so the centers accumulate in the same loop. Invalid
    (near-origin pad) points carry mindist = -1 from the start: min(-1, d)
    keeps -1 (d >= 0) and the argmax can never pick them, so no per-step
    valid-masking is needed."""
    valid = (x * x + y * y + z * z) > 1e-3
    m_iota = lax.broadcasted_iota(jnp.int32, (bo, npoint), 1)
    zeros_m = jnp.zeros((bo, npoint), jnp.float32)

    def fps_body(j, carry):
        old, mindist, cxa, cya, cza = carry
        sel = lane == old
        xi = jnp.sum(jnp.where(sel, x, 0.0), axis=1, keepdims=True)
        yi = jnp.sum(jnp.where(sel, y, 0.0), axis=1, keepdims=True)
        zi = jnp.sum(jnp.where(sel, z, 0.0), axis=1, keepdims=True)
        put = m_iota == (j - 1)
        cxa = jnp.where(put, xi, cxa)
        cya = jnp.where(put, yi, cya)
        cza = jnp.where(put, zi, cza)
        d = (x - xi) ** 2 + (y - yi) ** 2 + (z - zi) ** 2
        mindist = jnp.minimum(mindist, d)
        best = jnp.max(mindist, axis=1, keepdims=True)
        new = jnp.min(
            jnp.where(mindist == best, lane, n), axis=1, keepdims=True
        ).astype(jnp.int32)
        return new, mindist, cxa, cya, cza

    init = (jnp.zeros((bo, 1), jnp.int32),
            jnp.where(valid, 1e10, -1.0),
            zeros_m, zeros_m, zeros_m)
    last, _, cxa, cya, cza = lax.fori_loop(1, npoint, fps_body, init)
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
    newxyz_ref[:, 3:, :] = jnp.zeros((bo, 5, npoint), jnp.float32)
    return cxa, cya, cza


def _fps_kernel(pts_ref, newxyz_ref, *, npoint, n, bo):
    """Standalone FPS over a (large) block of objects -> (bo, 8, m) centers.

    Split out of the fused kernel because FPS is the one SEQUENTIAL phase:
    npoint dependent steps of tiny vector ops. At small n (SA2: n=32) the
    fused kernel's per-level block size is capped by its stage-1/2 unroll and
    scratch, leaving FPS instruction/latency-bound across many grid steps;
    running FPS alone at block_objects in the hundreds packs the per-step ops
    into full vregs and amortizes the serial chain over 8-32x more objects."""
    x = pts_ref[:, 0, :]
    y = pts_ref[:, 1, :]
    z = pts_ref[:, 2, :]
    lane = lax.broadcasted_iota(jnp.int32, (bo, n), 1)
    _fps_inline(x, y, z, lane, newxyz_ref, npoint=npoint, n=n, bo=bo)


def _fps_kernel_t(pts_ref, newxyz_ref, *, npoint, n, bo):
    """LANE-TRANSPOSED standalone FPS: objects on LANES, points on sublanes.

    pts_ref (3, n, bo) f32; newxyz_ref (8, npoint, bo) f32.

    At small n (SA2: n=32) the row-oriented `_fps_kernel` fills only n/128
    of each vreg's lanes — every (bo, n) array occupies 4x the vregs its
    payload needs, so each of the npoint sequential FPS steps issues ~4x
    the vector ops. Putting OBJECTS on lanes packs vregs full at any block
    width: per-object reductions (the argmax over candidate points, the
    one-hot coordinate extraction) become sublane reductions, which the VPU
    supports directly. Same elementwise math, exact one-hot sums and
    segment max -> outputs are bit-identical to `_fps_kernel`. Measured
    (v5e, SA2 shapes G=5120, n=32, m=16): FPS phase 5.4 -> 1.6 ms.
    """
    x = pts_ref[0, :, :]  # (n, bo)
    y = pts_ref[1, :, :]
    z = pts_ref[2, :, :]
    row = lax.broadcasted_iota(jnp.int32, (n, bo), 0)
    valid = (x * x + y * y + z * z) > 1e-3
    m_iota = lax.broadcasted_iota(jnp.int32, (npoint, bo), 0)
    zeros_m = jnp.zeros((npoint, bo), jnp.float32)

    def fps_body(j, carry):
        old, mindist, cxa, cya, cza = carry  # old: (1, bo) int32
        sel = row == old
        xi = jnp.sum(jnp.where(sel, x, 0.0), axis=0, keepdims=True)  # (1,bo)
        yi = jnp.sum(jnp.where(sel, y, 0.0), axis=0, keepdims=True)
        zi = jnp.sum(jnp.where(sel, z, 0.0), axis=0, keepdims=True)
        put = m_iota == (j - 1)
        cxa = jnp.where(put, xi, cxa)
        cya = jnp.where(put, yi, cya)
        cza = jnp.where(put, zi, cza)
        d = (x - xi) ** 2 + (y - yi) ** 2 + (z - zi) ** 2
        mindist = jnp.minimum(mindist, d)
        best = jnp.max(mindist, axis=0, keepdims=True)
        new = jnp.min(
            jnp.where(mindist == best, row, n), axis=0, keepdims=True
        ).astype(jnp.int32)
        return new, mindist, cxa, cya, cza

    init = (jnp.zeros((1, bo), jnp.int32),
            jnp.where(valid, 1e10, -1.0),
            zeros_m, zeros_m, zeros_m)
    last, _, cxa, cya, cza = lax.fori_loop(1, npoint, fps_body, init)
    sel = row == last
    put = m_iota == (npoint - 1)
    cxa = jnp.where(put, jnp.sum(jnp.where(sel, x, 0.0), 0, keepdims=True),
                    cxa)
    cya = jnp.where(put, jnp.sum(jnp.where(sel, y, 0.0), 0, keepdims=True),
                    cya)
    cza = jnp.where(put, jnp.sum(jnp.where(sel, z, 0.0), 0, keepdims=True),
                    cza)
    newxyz_ref[0, :, :] = cxa
    newxyz_ref[1, :, :] = cya
    newxyz_ref[2, :, :] = cza
    newxyz_ref[3:, :, :] = jnp.zeros((5, npoint, bo), jnp.float32)


def _kernel(pts_ref, *refs, npoint, nsample, radius,
            n, bo, hs, stages=3, centers_in=False):
    """Block of ``bo`` objects. pts_ref (bo, C, N) f32, rows 0..2 = xyz.
    w_i refs are (Cin_i, H_i) bf16 (natural conv layout); s_i refs are
    (2, H_i) f32 [scale; shift] rows (BN folded, or [1; bias]).
    pooled_ref (bo, m, H3) f32; newxyz_ref (bo, 8, m) f32;
    g_ref VMEM scratch (bo*m*nsample, H1) bf16 (post-layer-1 activations).

    MLP layer 1 is FOLDED INTO the selection dot: selection is linear, so
    selm @ pts @ w1 == selm @ (pts @ w1), and the xyz-centering distributes
    (g - [c;0]) @ w1 = g@w1 - c@w1[:3]. The raw selection dot has C (6/131)
    output lanes — <5%/50% MXU N-utilization; pre-projecting to H1 (64/128)
    lanes makes the big K=N-points contraction run at full output tiles and
    drops layer 1 from stage 2. One-hot selection keeps it exact w.r.t. the
    bf16-projected per-point values."""
    if centers_in:
        (cin_ref, w1_ref, s1_ref, w2_ref, s2_ref, w3_ref, s3_ref,
         pooled_ref, newxyz_ref, g_ref, *scratch) = refs
    else:
        (w1_ref, s1_ref, w2_ref, s2_ref, w3_ref, s3_ref,
         pooled_ref, newxyz_ref, g_ref, *scratch) = refs
    h1, h2, h3 = hs
    m = npoint
    x = pts_ref[:, 0, :]
    y = pts_ref[:, 1, :]
    z = pts_ref[:, 2, :]
    lane = lax.broadcasted_iota(jnp.int32, (bo, n), 1)

    if centers_in:
        # FPS ran in its own wide-block kernel (_fps_kernel); pass through
        cxa = cin_ref[:, 0, :]
        cya = cin_ref[:, 1, :]
        cza = cin_ref[:, 2, :]
        newxyz_ref[:, :, :] = cin_ref[:, :, :]
    else:
        cxa, cya, cza = _fps_inline(x, y, z, lane, newxyz_ref,
                                    npoint=npoint, n=n, bo=bo)
    if stages <= 1:  # bisection probe: FPS only
        pooled_ref[:, :, :] = jnp.zeros((bo, npoint, hs[2]), jnp.float32)
        return

    # ---- Stage 1 ----
    # Two statically-selected formulations:
    #
    #  * DENSE (nsample >= n, e.g. SA2: n = nsample = 32): with max pooling,
    #    ball-query selection is VACUOUS — every within-ball point is
    #    selected (count <= n <= nsample) and CUDA's pad-with-first slots
    #    only duplicate existing group members, which a max ignores. So the
    #    group never needs materializing: compute layer-1 features for ALL
    #    (center, point) pairs straight from the w1-fold,
    #        h1[c,p] = relu(a1 * (pw[p] - cw1[c]) + b1),
    #    a pure broadcast — no rank scan, no one-hot selection dots — and
    #    max-pool under the within mask, falling back to the pair (c, 0)
    #    for empty balls (CUDA zero-init picks point 0).
    #
    #  * SELECTION (nsample < n, e.g. SA1: n=1024, nsample=32): dense pairs
    #    would be n/nsample x more MLP work, so groups are gathered by
    #    one-hot matmuls against per-(center, slot) rank targets.
    dense = nsample >= n
    ns_c = max(1, min(nsample, 256 // npoint))
    while nsample % ns_c != 0:
        ns_c -= 1
    rows = npoint * ns_c  # selection rows per chunk (slot-major: r = sl*m + c)
    lane_n = lax.broadcasted_iota(jnp.int32, (m, n), 1)
    row_slot1 = (lax.broadcasted_iota(jnp.int32, (rows, 1), 0) // m
                 ).astype(jnp.float32) + 1.0  # (rows, 1): local slot + 1
    opc = npoint * (n if dense else nsample)  # scratch rows per object

    w1 = w1_ref[:, :]
    w2 = w2_ref[:, :]
    w3 = w3_ref[:, :]
    a1, b1 = s1_ref[0:1, :], s1_ref[1:2, :]  # (1, H) rows broadcast over cols
    a2, b2 = s2_ref[0:1, :], s2_ref[1:2, :]
    a3, b3 = s3_ref[0:1, :], s3_ref[1:2, :]

    if dense:
        wm_ref = scratch[0]  # (bo*n, m) f32 TRANSPOSED within masks (pool)
        for b in range(bo):
            cx_col = _row_to_col(cxa[b:b + 1, :], m)
            cy_col = _row_to_col(cya[b:b + 1, :], m)
            cz_col = _row_to_col(cza[b:b + 1, :], m)
            # (n, m) orientation: points on sublanes matches the p-major
            # pair-row layout, so the pool stage reduces the leading axis
            px_col = _row_to_col(x[b:b + 1, :], n)
            py_col = _row_to_col(y[b:b + 1, :], n)
            pz_col = _row_to_col(z[b:b + 1, :], n)
            d2t = ((px_col - cxa[b:b + 1, :]) ** 2
                   + (py_col - cya[b:b + 1, :]) ** 2
                   + (pz_col - cza[b:b + 1, :]) ** 2)  # (n, m)
            wm_ref[b * n:(b + 1) * n, :] = (
                d2t < radius * radius).astype(jnp.float32)
            centers3 = jnp.concatenate([cx_col, cy_col, cz_col], 1)  # (m, 3)
            cw1 = lax.dot_general(
                centers3.astype(jnp.bfloat16), w1[0:3, :],
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
            )  # (m, H1)
            pw = lax.dot_general(
                pts_ref[b, :, :].astype(jnp.bfloat16), w1,
                (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
            )  # (n, H1) = pts @ w1
            # bf16 round-trip so pair values bit-match the selection path's
            # bf16 pw gather
            pw = pw.astype(jnp.bfloat16).astype(jnp.float32)
            # p-major pair rows r = p*m + c: pw element-repeats (one
            # broadcast over an inserted sublane-group axis), cw1
            # block-repeats
            pw_rep = jnp.broadcast_to(
                pw[:, None, :], (n, m, h1)).reshape(n * m, h1)
            cw1_rep = pltpu.repeat(cw1, n, 0)  # (n*m, H1)
            g_ref[b * opc:(b + 1) * opc, :] = jnp.maximum(
                a1 * (pw_rep - cw1_rep) + b1, 0.0).astype(jnp.bfloat16)

        if stages >= 3:
            _stage2_pool_dense(g_ref, wm_ref, pooled_ref, w2, a2, b2, w3,
                               a3, b3, npoint=npoint, n=n, bo=bo, h3=h3,
                               opc=opc)
        else:
            pooled_ref[:, :, :] = jnp.zeros((bo, npoint, h3), jnp.float32)
        return

    for b in range(bo):
        x_row = x[b:b + 1, :]
        y_row = y[b:b + 1, :]
        z_row = z[b:b + 1, :]
        cx_col = _row_to_col(cxa[b:b + 1, :], m)
        cy_col = _row_to_col(cya[b:b + 1, :], m)
        cz_col = _row_to_col(cza[b:b + 1, :], m)
        d2 = ((x_row - cx_col) ** 2 + (y_row - cy_col) ** 2
              + (z_row - cz_col) ** 2)  # (m, n)
        within = (d2 < radius * radius).astype(jnp.float32)
        ranks = _scan_lanes(within, n)
        count_col = ranks[:, n - 1:n]  # (m, 1)
        # slot-targeted selection: slot s (0-based) takes the within-point of
        # rank s+1 when count > s, the FIRST within point (rank 1) when
        # 0 < count <= s (CUDA pad-with-first), and point 0 when the ball is
        # empty (CUDA zero-init). Giving non-within points rank -1 — except
        # lane 0, which keeps rank 0 so an all-empty row matches target 0 —
        # collapses the whole selection to ONE broadcast compare per chunk
        # against a per-row (lane-constant) target column. Within-point ranks
        # are unique (1..count), so the compare yields an exact one-hot.
        ranksW = jnp.where(within > 0, ranks,
                           jnp.where(lane_n == 0, 0.0, -1.0))  # (m, n)
        ranksW_rep = pltpu.repeat(ranksW, ns_c, 0)  # (rows, n)
        count_rep = pltpu.repeat(count_col, ns_c, 0)  # (rows, 1)
        fallback = jnp.minimum(count_rep, 1.0)  # rank 1 if any hit else 0
        centers3 = jnp.concatenate([cx_col, cy_col, cz_col], axis=1)  # (m, 3)
        # layer-1 contribution of the xyz-centering: (g - [c;0]) @ w1
        # = g@w1 - c@w1[:3]; folded with the BN affine into one adjust row
        cw1 = lax.dot_general(
            centers3.astype(jnp.bfloat16), w1[0:3, :],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )  # (m, H1)
        adj1 = b1 - a1 * pltpu.repeat(cw1, ns_c, 0)  # (rows, H1)
        # pre-project the whole object once: (pts @ w1)^T, K=C is tiny
        pw = lax.dot_general(
            w1, pts_ref[b, :, :].astype(jnp.bfloat16),
            (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16)  # (H1, n)

        for chunk in range(nsample // ns_c):
            gs1 = row_slot1 + jnp.float32(chunk * ns_c)  # slot+1, (rows, 1)
            target = jnp.where(count_rep >= gs1, gs1, fallback)  # (rows, 1)
            selm = (ranksW_rep == target).astype(jnp.bfloat16)  # (rows, n)
            gh = lax.dot_general(
                selm, pw,
                (((1,), (1,)), ((), ())),  # contract the point dim (lanes)
                preferred_element_type=jnp.float32,
            )  # (rows, H1) — one-hot selection of pre-projected rows
            off = b * opc + chunk * rows
            # bf16 store is lossless w.r.t. stage 2, whose dots cast the
            # activations to bf16 anyway; halves the scratch footprint
            g_ref[off:off + rows, :] = jnp.maximum(
                a1 * gh + adj1, 0.0).astype(jnp.bfloat16)

    # ---- Stage 2: object-batched MLP (layers 2..3; layer 1 ran fused with
    # the selection) + slot max-pool. Numerics identical to per-object dots:
    # each scratch row goes through the same bf16-operand / f32-accumulate
    # contraction regardless of batching. ----
    if stages <= 2:
        pooled_ref[:, :, :] = jnp.zeros((bo, npoint, h3), jnp.float32)
        return
    sobj = max(1, 4096 // opc)
    while bo % sobj != 0:
        sobj -= 1

    def dot(h, w):
        return lax.dot_general(h.astype(jnp.bfloat16), w,
                               (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)

    for s in range(0, bo, sobj):
        h = g_ref[s * opc:(s + sobj) * opc, :]
        h = jnp.maximum(dot(h, w2) * a2 + b2, 0.0)
        h = jnp.maximum(dot(h, w3) * a3 + b3, 0.0)  # (sobj*opc, H3)
        # slot-major rows (r = sl*m + c): the slot max is one reduction over
        # an inserted leading axis, not nsample unrolled (m, h3) maxima
        pooled_ref[s:s + sobj, :, :] = jnp.max(
            h.reshape(sobj, nsample, npoint, h3), axis=1)


@functools.partial(jax.jit, static_argnames=("npoint", "nsample", "radius",
                                             "interpret", "block_objects",
                                             "stages", "split_fps",
                                             "fps_block_objects",
                                             "dense_batched"))
def fused_sa_forward(pts: Array, npoint: int, nsample: int, radius: float,
                     w1, s1, w2, s2, w3, s3, interpret: bool = False,
                     block_objects: int = 16, stages: int = 3,
                     split_fps: bool = False, fps_block_objects: int = 512,
                     dense_batched: bool = False):
    """Fused frozen-SA forward.

    Args:
      pts: (G, N, C) f32, xyz-first channels.
      w_i: (H_i, Cin_i) pre-transposed layer kernels (any float dtype) —
        the public contract matches fold_shared_mlp; the kernel consumes
        them re-transposed to the natural (Cin_i, H_i) layout.
      s_i: (H_i, 2) f32 columns [scale, shift] (eval-BN folded affine).
      split_fps: run FPS as its own wide-block kernel (fps_block_objects)
        feeding centers into the main kernel — same math/bits, amortizes
        the serial FPS chain when block_objects is capped small by the
        stage-1/2 unroll (the SA2 configuration).
      dense_batched: use the loop-free `_kernel_dense_batched` stage 1
        (bit-equal; requires the dense configuration nsample >= N with
        split_fps and stages == 3 — silently falls back otherwise).
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
    w1n, w2n, w3n = (jnp.swapaxes(w, 0, 1).astype(jnp.bfloat16)
                     for w in (w1, w2, w3))
    s1n, s2n, s3n = (jnp.swapaxes(s, 0, 1).astype(jnp.float32)
                     for s in (s1, s2, s3))

    centers = None
    if split_fps:
        fbo = fps_block_objects
        while G % fbo != 0:
            fbo //= 2
        # lane-transposed FPS: objects on lanes (full vreg fill at small N).
        # npoint must tile sublanes (8-divisible); N <= 128 keeps the
        # (N, fbo) working set at one sublane-tile group per lane-tile; and
        # when the grid has >1 block the lane-dim block offsets g*fbo must be
        # 128-aligned (Mosaic lane-store rule; interpret mode doesn't check).
        transposed = (N <= 128 and npoint % 8 == 0
                      and (fbo == G or fbo % 128 == 0))
        if transposed:
            kern = functools.partial(_fps_kernel_t, npoint=npoint, n=N,
                                     bo=fbo)
            in_spec = pl.BlockSpec((3, N, fbo), lambda g: (0, 0, g),
                                   memory_space=pltpu.VMEM)
            out_spec = pl.BlockSpec((8, npoint, fbo), lambda g: (0, 0, g),
                                    memory_space=pltpu.VMEM)
            out_shape = jax.ShapeDtypeStruct((8, npoint, G), jnp.float32)
            operand = jnp.transpose(pts_t[:, 0:3, :], (1, 2, 0))  # (3, N, G)
        else:
            # row-oriented fallback: fbo on sublanes only needs 8-alignment.
            # FPS reads only xyz — stream a (G, 3, N) slice, not all C
            # channels (SA2's C=131 would blow the double-buffered VMEM
            # window at wide fbo).
            kern = functools.partial(_fps_kernel, npoint=npoint, n=N, bo=fbo)
            in_spec = pl.BlockSpec((fbo, 3, N), lambda g: (g, 0, 0),
                                   memory_space=pltpu.VMEM)
            out_spec = pl.BlockSpec((fbo, 8, npoint), lambda g: (g, 0, 0),
                                    memory_space=pltpu.VMEM)
            out_shape = jax.ShapeDtypeStruct((G, 8, npoint), jnp.float32)
            operand = pts_t[:, 0:3, :]
        centers = pl.pallas_call(
            kern,
            grid=(G // fbo,),
            in_specs=[in_spec],
            out_specs=out_spec,
            out_shape=out_shape,
            interpret=interpret,
            compiler_params=None if interpret else pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
        )(operand)
        if transposed:
            centers = jnp.transpose(centers, (2, 0, 1))  # (G, 8, npoint)

    _bo_b = bo
    # lane-dim block offsets (g*bo*N) must be 128-aligned when the grid has
    # more than one block; widen bo (within G-divisibility) to get there
    while _bo_b < G and (_bo_b * N) % 128 != 0 and G % (_bo_b * 2) == 0:
        _bo_b *= 2
    if (dense_batched and split_fps and nsample >= N and stages == 3
            and ((_bo_b * N) % 128 == 0 or _bo_b == G)):
        bo = _bo_b
        m = npoint
        opc = m * N
        # (C, G*N) channel-major points: ONE layer-1 dot per block, and its
        # lane-dim block offsets (g*bo*N) are 128-aligned at bo*N >= 128
        ptsT_cm = jnp.transpose(pts, (2, 0, 1)).reshape(C, G * N)
        import os

        kernel = functools.partial(
            _kernel_dense_batched, npoint=npoint, radius=float(radius),
            n=N, bo=bo, hs=hs,
            pool4d=os.environ.get("SCENEVERSE_SA2_POOL4D", "1") != "0",
        )
        const = lambda *shape: pl.BlockSpec(
            shape, lambda g: (0,) * len(shape), memory_space=pltpu.VMEM)
        pooled = pl.pallas_call(
            kernel,
            grid=(G // bo,),
            in_specs=[
                pl.BlockSpec((C, bo * N), lambda g: (0, g),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bo, 8, npoint), lambda g: (g, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bo, 3, N), lambda g: (g, 0, 0),
                             memory_space=pltpu.VMEM),
                const(*w1n.shape), const(*s1n.shape),
                const(*w2n.shape), const(*s2n.shape),
                const(*w3n.shape), const(*s3n.shape),
            ],
            out_specs=pl.BlockSpec((bo, npoint, hs[2]), lambda g: (g, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((G, npoint, hs[2]), jnp.float32),
            interpret=interpret,
            compiler_params=None if interpret else pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
        )(ptsT_cm, centers, pts_t[:, 0:3, :], w1n, s1n, w2n, s2n, w3n, s3n)
        return pooled, jnp.swapaxes(centers[:, 0:3, :], 1, 2)

    kernel = functools.partial(
        _kernel, npoint=npoint, nsample=nsample, radius=float(radius),
        n=N, bo=bo, hs=hs, stages=stages, centers_in=split_fps,
    )
    const = lambda *shape: pl.BlockSpec(shape, lambda g: (0,) * len(shape),
                                        memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((bo, C, N), lambda g: (g, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    operands = [pts_t]
    if split_fps:
        in_specs.append(pl.BlockSpec((bo, 8, npoint), lambda g: (g, 0, 0),
                                     memory_space=pltpu.VMEM))
        operands.append(centers)
    in_specs += [
        const(*w1n.shape), const(*s1n.shape),
        const(*w2n.shape), const(*s2n.shape),
        const(*w3n.shape), const(*s3n.shape),
    ]
    operands += [w1n, s1n, w2n, s2n, w3n, s3n]
    pooled, newxyz = pl.pallas_call(
        kernel,
        grid=(G // bo,),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((bo, npoint, hs[2]), lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bo, 8, npoint), lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((G, npoint, hs[2]), jnp.float32),
            jax.ShapeDtypeStruct((G, 8, npoint), jnp.float32),
        ),
        scratch_shapes=(
            [pltpu.VMEM((bo * npoint * min(nsample, N), hs[0]),
                        jnp.bfloat16)]
            + ([pltpu.VMEM((bo * N, npoint), jnp.float32)]
               if nsample >= N else [])  # dense: transposed within masks
        ),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(*operands)

    return pooled, jnp.swapaxes(newxyz[:, 0:3, :], 1, 2)


def fold_shared_mlp(shared_mlp):
    """Extract (wT, [scale; shift]) per layer from a SharedMLP with
    frozen/eval BatchNorm: BN(conv(x)) = conv(x) * a + b with
    a = gamma / sqrt(var + eps), b = beta - mean * a."""
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
@functools.partial(jax.custom_jvp,
                   nondiff_argnums=(1, 2, 3, 10, 11, 12, 13))
def fused_sa_forward_frozen(pts, npoint, nsample, radius,
                            w1, s1, w2, s2, w3, s3,
                            block_objects=16, split_fps=False,
                            interpret=False, dense_batched=False):
    return fused_sa_forward(pts, npoint, nsample, radius,
                            w1, s1, w2, s2, w3, s3,
                            block_objects=block_objects, split_fps=split_fps,
                            interpret=interpret, dense_batched=dense_batched)


@fused_sa_forward_frozen.defjvp
def _fsa_jvp(npoint, nsample, radius, block_objects, split_fps, interpret,
             dense_batched, primals, tangents):
    del tangents
    out = fused_sa_forward_frozen(primals[0], npoint, nsample, radius,
                                  *primals[1:], block_objects, split_fps,
                                  interpret, dense_batched)
    return out, jax.tree.map(jnp.zeros_like, out)
