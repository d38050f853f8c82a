"""Bespoke fused multi-head attention for the GPS towers (small L, full VMEM).

Why not XLA, and why not the generic flash kernel:

* XLA materializes the (B, H, L, T) score AND probability tensors in HBM
  every layer (bf16 ~52 MB each at B=128, L=130), plus a dropout mask chain
  and ~7 layout copies per layer around the attention einsums — a device
  trace (profile_analyze.py) put the prob/dropout fusions + copies at ~30%
  of the train step.
* The public TPU flash kernel (ops/pallas/attention.py) pads L to 128-block
  multiples (130 -> 256, 2x waste), cannot apply prob-dropout (training
  semantics), and needs the spatial towers' location prior as a
  materialized f32 (B, H, L, T) additive bias — measured NET SLOWER
  (840 -> 748 scenes/s, round 2).

This kernel is shaped to the GPS regime instead (L, T <= ~330 so one
(L, T) score block lives in VMEM per head; reference budget
all_pretrain.yaml:35-46):

* PACKED HEAD LAYOUT: q/k/v arrive and leave as (B, L, H*dh) — exactly what
  the in-projection matmuls produce and the out-projection consumes. The
  first-generation kernel took (B, H, L, dh), which forced XLA to
  materialize (B, T, H, dh) -> (B, H, T, dh) layout copies around every
  custom-call (a pallas_call pins operand layouts; XLA's own attention
  einsums fold those transposes for free): a device trace at batch 192
  showed 32 such copies per train step, ~12.7 ms — more than the SA kernels
  themselves. Heads are processed in 128-lane blocks (two dh=64 heads per
  block): per head, the off-head lanes of q (and of v/k on the grad side)
  are zero-masked with an iota select, so the wide dot contracts to exactly
  the per-head product while outputs accumulate additively into the packed
  lane block. The extra zero-lane MXU work is free — the old (L, 64) dots
  half-filled the 128-wide MXU contraction anyway.
* grid over the batch, all H heads unrolled per step — no L/T blocking, no
  online-softmax passes, exactly one (L, T) f32 score tile per head;
* key-padding arrives as an additive (B, T) f32 row (0 / -1e30) — the
  (L, T) mask never materializes;
* the spatial 'cond' gate (reference transformers.py:206-232) is computed
  IN-KERNEL from the per-query conditional weights (B, H, L, 8) and the
  pairwise locations (B, 5, L, T): the (B, H, L, T) gate tensor never
  touches HBM (this is what sank the flash-kernel attempt);
* attention-prob dropout runs on the in-kernel PRNG (seeded per (batch,
  head) — backward regenerates the identical mask), so no mask tensors or
  threefry chains in HBM; the RNG STREAM differs from the XLA path's
  threefry (dropout distribution is identical: uniform < keep_prob);
* backward is flash-style recompute: residuals are just the (B, H, L, 1)
  logsumexp and the forward output (for the delta trick
  rowsum(do*o) = <p, dp>, which holds with prob-dropout too since
  o = (p*mask)@v).

Numerics vs the XLA path: scores accumulate f32 and are NOT rounded to the
compute dtype before the (f32) softmax, i.e. the kernel is slightly MORE
precise than the bf16-logit XLA path; probabilities round to the value
dtype before the PV dot exactly like softmax_lowp. f32-in -> f32-compute.
Exactness tests run both paths in f32 (tests/test_fused_mha.py).
"""

from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_GATE_ENV = "SCENEVERSE_FUSED_MHA"
_LOG1E6 = math.log(1e-6)
_NEG = -1e30


def fused_mha_enabled() -> bool:
    """Gate for the bespoke fused attention. Default ON for TPU backends:
    measured 930.8 -> 995.6 scenes/s (+7.0%) on the full GPS train step at
    batch 128 on v5e (BASELINE.md round 3b). Set SCENEVERSE_FUSED_MHA=off to
    force the XLA path for bit-exact comparison against reference
    checkpoints evaluated in f32 (on-chip the two paths differ at MXU
    bf16-rounding level — loss rel ~3e-5 — because XLA's default-precision
    f32 matmuls and the kernel's round differently; interpret-mode grads
    match exactly on all leaves, tests/test_fused_mha.py) and for
    per-call-identical dropout streams."""
    v = os.environ.get(_GATE_ENV, "on").lower()
    if v in ("1", "on", "true"):
        # SCENEVERSE_PALLAS_INTERPRET=1 forces the kernel path on non-TPU
        # backends (runs the Pallas interpreter) — used by the 8-device CPU
        # mesh tests to exercise the kernels' grids under dp sharding
        if os.environ.get("SCENEVERSE_PALLAS_INTERPRET"):
            return True
        return jax.default_backend() == "tpu"
    return False


def fused_mha_supported(d_model: int, n_heads: int) -> bool:
    """True when `_block_geometry` can pack this head layout (callers pair
    this with `fused_mha_enabled()` and fall back to the XLA attention path
    otherwise — e.g. dh=48 with D>128 has no 128-aligned packing)."""
    if d_model % n_heads != 0:
        return False
    try:
        _block_geometry(d_model, d_model // n_heads)
        return True
    except ValueError:
        return False


def _block_geometry(D: int, dh: int):
    """(block_width, heads_per_block): pack heads into lane blocks whose
    offsets stay 128-aligned (Mosaic lane-store constraint)."""
    if D <= 128:
        return D, D // dh
    if dh % 128 == 0:
        return dh, 1
    if 128 % dh == 0 and D % 128 == 0:
        return 128, 128 // dh
    raise ValueError(
        f"unsupported packed-head geometry D={D} dh={dh}: need D <= 128, "
        f"dh % 128 == 0, or (128 % dh == 0 and D % 128 == 0)")


def _uniform01(shape):
    """(shape) f32 uniforms in [0, 1) from the per-core PRNG (24-bit)."""
    bits = pltpu.prng_random_bits(shape)
    # signed right-shift of the raw int32 bits can smear the sign bit; mask
    # to the low 24 bits explicitly (exact in f32)
    u24 = jnp.bitwise_and(bits, (1 << 24) - 1)
    return u24.astype(jnp.float32) * (1.0 / (1 << 24))


def _uniform01_hash(shape, seed):
    """Interpret-mode uniform fallback: `pltpu.prng_seed` has no CPU
    lowering even under the Pallas interpreter, so the 8-device CPU mesh
    tests (train-mode, dropout > 0) use a counter-based murmur3-finalizer
    hash over (per-(b,h) seed, element index) instead. Deterministic given
    the seed — backward regenerates the identical mask — but a DIFFERENT
    stream than the on-TPU hardware PRNG (dropout distribution identical)."""
    r = jax.lax.broadcasted_iota(jnp.uint32, shape, 0)
    c = jax.lax.broadcasted_iota(jnp.uint32, shape, 1)
    x = (r * jnp.uint32(shape[1]) + c
         + seed.astype(jnp.uint32) * jnp.uint32(0x9E3779B9))
    x = x ^ (x >> 16)
    x = x * jnp.uint32(0x85EBCA6B)
    x = x ^ (x >> 13)
    x = x * jnp.uint32(0xC2B2AE35)
    x = x ^ (x >> 16)
    return (x >> 8).astype(jnp.float32) * (1.0 / (1 << 24))


def _dropmask(shape, seed_scalar, keep, hw_prng):
    """(shape) bool keep-mask; hardware PRNG on TPU, hash in interpret."""
    if hw_prng:
        pltpu.prng_seed(seed_scalar)
        return _uniform01(shape) < keep
    return _uniform01_hash(shape, seed_scalar) < keep


def _gate_z(sw, locs, padrow):
    """Spatial 'cond' gate logits z (L, T) from per-query weights sw (L, 8)
    [bias, w0..w4, pad, pad] and location planes locs (5, L, T)."""
    z = sw[:, 0:1]
    for d in range(5):
        z = z + sw[:, d + 1:d + 2] * locs[d]
    return z


def _head_lane_mask(rows, bw, dh, i):
    """(rows, bw) bool: True on the dh lanes belonging to sub-head ``i``."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (rows, bw), 1)
    return (lane // dh) == i


def _zero_off_head(x, dh, i):
    """Zero every lane of ``x`` outside sub-head ``i``'s dh-lane segment."""
    return jnp.where(_head_lane_mask(x.shape[0], x.shape[1], dh, i), x,
                     jnp.zeros_like(x))


def _mha_fwd_kernel(q_ref, k_ref, v_ref, pad_ref, seed_ref, *rest,
                    scale, rate, gate, H, dh, hw_prng=True, bob=1):
    if gate:
        sw_ref, locs_ref, o_ref, lse_ref = rest
    else:
        o_ref, lse_ref = rest
    keep = 1.0 - rate
    L, D = q_ref.shape[1], q_ref.shape[2]
    bw, hpb = _block_geometry(D, dh)
    for bi in range(bob):
        b = pl.program_id(0) * bob + bi
        padrow = pad_ref[bi, :, :]  # (1, T) additive: 0 valid, -1e30 pad
        for j in range(D // bw):
            qp = q_ref[bi, :, j * bw:(j + 1) * bw]  # (L, bw)
            kp = k_ref[bi, :, j * bw:(j + 1) * bw]  # (T, bw)
            vp = v_ref[bi, :, j * bw:(j + 1) * bw]  # (T, bw)
            acc = jnp.zeros((L, bw), jnp.float32)
            for i in range(hpb):
                h = j * hpb + i
                # off-head q lanes zeroed -> the bw-wide contraction IS the
                # per-head (dh-wide) score dot
                s = jax.lax.dot_general(
                    _zero_off_head(qp, dh, i), kp, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) * scale + padrow  # (L, T) f32
                if gate:
                    z = _gate_z(sw_ref[bi, h], locs_ref[bi], padrow)
                    loc = jnp.maximum(jax.nn.log_sigmoid(z), _LOG1E6)
                    loc = jnp.where(padrow < -1.0, _LOG1E6, loc)
                    s = s + loc
                m = jnp.max(s, axis=1, keepdims=True)
                p = jnp.exp(s - m)
                tot = jnp.sum(p, axis=1, keepdims=True)
                lse_ref[bi, h] = m + jnp.log(tot)
                pn = (p / tot).astype(v_ref.dtype)  # value-dtype probs
                if rate > 0.0:
                    dropmask = _dropmask(pn.shape, seed_ref[0] + b * H + h,
                                         keep, hw_prng)
                    pn = jnp.where(dropmask, pn * (1.0 / keep),
                                   0.0).astype(v_ref.dtype)
                # off-head v lanes zeroed -> head outputs land disjoint; sum
                acc = acc + jax.lax.dot_general(
                    pn, _zero_off_head(vp, dh, i), (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            o_ref[bi, :, j * bw:(j + 1) * bw] = acc.astype(o_ref.dtype)


def _mha_bwd_kernel(q_ref, k_ref, v_ref, pad_ref, seed_ref, *rest,
                    scale, rate, gate, H, dh, hw_prng=True, bob=1):
    if gate:
        (sw_ref, locs_ref, do_ref, o_ref, lse_ref,
         dq_ref, dk_ref, dv_ref, dsw_ref) = rest
    else:
        do_ref, o_ref, lse_ref, dq_ref, dk_ref, dv_ref = rest
    keep = 1.0 - rate
    cdt = q_ref.dtype
    L, D = q_ref.shape[1], q_ref.shape[2]
    bw, hpb = _block_geometry(D, dh)
    for bi in range(bob):
        b = pl.program_id(0) * bob + bi
        padrow = pad_ref[bi, :, :]
        for j in range(D // bw):
            qp = q_ref[bi, :, j * bw:(j + 1) * bw]
            kp = k_ref[bi, :, j * bw:(j + 1) * bw]
            vp = v_ref[bi, :, j * bw:(j + 1) * bw]
            dop = do_ref[bi, :, j * bw:(j + 1) * bw]
            dof = dop.astype(jnp.float32)
            oof = o_ref[bi, :, j * bw:(j + 1) * bw].astype(jnp.float32)
            doo = dof * oof  # (L, bw); per-head delta = its masked row-sum
            dq_acc = jnp.zeros((L, bw), jnp.float32)
            dk_acc = jnp.zeros((kp.shape[0], bw), jnp.float32)
            dv_acc = jnp.zeros((kp.shape[0], bw), jnp.float32)
            for i in range(hpb):
                h = j * hpb + i
                mL = _head_lane_mask(L, bw, dh, i)
                qi = jnp.where(mL, qp, jnp.zeros_like(qp))
                s = jax.lax.dot_general(
                    qi, kp, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) * scale + padrow
                if gate:
                    z = _gate_z(sw_ref[bi, h], locs_ref[bi], padrow)
                    ls = jax.nn.log_sigmoid(z)
                    loc = jnp.where(padrow < -1.0, _LOG1E6,
                                    jnp.maximum(ls, _LOG1E6))
                    s = s + loc
                p = jnp.exp(s - lse_ref[bi, h])  # normalized probs, f32
                delta = jnp.sum(jnp.where(mL, doo, 0.0), axis=1,
                                keepdims=True)  # (L, 1)
                pb = p.astype(cdt)
                doi = jnp.where(mL, dop, jnp.zeros_like(dop)).astype(cdt)
                if rate > 0.0:
                    # fwd-identical mask (same seed derivation)
                    dropmask = _dropmask(p.shape, seed_ref[0] + b * H + h,
                                         keep, hw_prng)
                    a = jnp.where(dropmask, pb * (1.0 / keep),
                                  0.0).astype(cdt)
                else:
                    a = pb
                # doi's off-head lanes are zero -> dv lands only on head i's
                # lanes; accumulate additively into the packed block
                dv_acc = dv_acc + jax.lax.dot_general(  # a^T @ doi -> (T, bw)
                    a, doi, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                dp = jax.lax.dot_general(  # doi @ vp^T -> (L, T); doi masked
                    doi, vp, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                if rate > 0.0:
                    dp = jnp.where(dropmask, dp * (1.0 / keep), 0.0)
                ds = p * (dp - delta)  # (L, T) f32
                if gate:
                    active = (ls > _LOG1E6) & (padrow >= -1.0)
                    dz = jnp.where(active, ds * jax.nn.sigmoid(-z), 0.0)
                    cols = [jnp.sum(dz, axis=1, keepdims=True)]
                    for d in range(5):
                        cols.append(jnp.sum(dz * locs_ref[bi, d], axis=1,
                                            keepdims=True))
                    cols.append(jnp.zeros_like(cols[0]))
                    cols.append(jnp.zeros_like(cols[0]))
                    dsw_ref[bi, h] = jnp.concatenate(cols, axis=1)  # (L, 8)
                dsb = ds.astype(cdt)
                ki = _zero_off_head(kp, dh, i)
                dq_acc = dq_acc + jax.lax.dot_general(  # ds @ ki -> (L, bw)
                    dsb, ki, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) * scale
                dk_acc = dk_acc + jax.lax.dot_general(  # ds^T @ qi -> (T, bw)
                    dsb, qi, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) * scale
            dq_ref[bi, :, j * bw:(j + 1) * bw] = dq_acc.astype(dq_ref.dtype)
            dk_ref[bi, :, j * bw:(j + 1) * bw] = dk_acc.astype(dk_ref.dtype)
            dv_ref[bi, :, j * bw:(j + 1) * bw] = dv_acc.astype(dv_ref.dtype)


def _specs(B, H, L, T, D, gate, extra=(), bob=1):
    byb = lambda *shape: pl.BlockSpec(
        (bob,) + shape, lambda b: (b,) + (0,) * len(shape),
        memory_space=pltpu.VMEM)
    # pad row rides as (B, 1, T): Mosaic requires a block's sublane dim be
    # 8-divisible OR equal to the array dim — (1, T) blocks of a (B, T)
    # array violate that on real TPU (caught on-chip; interpret mode does
    # not enforce it)
    specs = [byb(L, D), byb(T, D), byb(T, D), byb(1, T),
             pl.BlockSpec(memory_space=pltpu.SMEM)]
    if gate:
        specs += [byb(H, L, 8), byb(5, L, T)]
    return specs + list(extra)


def _block_batch(B, gate):
    """Batch elements per grid step. >1 amortizes per-step grid overhead
    (the kernels run well above their FLOP floor at L<=130); VMEM bounds it.
    Default 4: measured +1% full-step on v5e (round 4: 1189.6 -> 1201.3
    scenes/s at batch 192, 1218.2 -> 1234.2 at batch 256; bob=8 was
    neutral-to-worse). Env override: SCENEVERSE_MHA_BLOCK_B."""
    env = os.environ.get("SCENEVERSE_MHA_BLOCK_B")
    cap = int(env) if env else 4
    bob = min(cap, B)
    while B % bob:
        bob -= 1
    return bob


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10, 11, 12))
def _fused_mha(q, k, v, padadd, sw8, locs5, seed, scale, rate, gate,
               interpret, H, dh):
    o, _ = _mha_fwd(q, k, v, padadd, sw8, locs5, seed, scale, rate, gate,
                    interpret, H, dh)
    return o


def _mha_fwd(q, k, v, padadd, sw8, locs5, seed, scale, rate, gate, interpret,
             H, dh):
    B, L, D = q.shape
    T = k.shape[1]
    bob = _block_batch(B, gate)
    kern = functools.partial(_mha_fwd_kernel, scale=scale, rate=rate,
                             gate=gate, H=H, dh=dh, hw_prng=not interpret,
                             bob=bob)
    ops = [q, k, v, padadd, seed] + ([sw8, locs5] if gate else [])
    o, lse = pl.pallas_call(
        kern,
        grid=(B // bob,),
        in_specs=_specs(B, H, L, T, D, gate, bob=bob),
        out_specs=(
            pl.BlockSpec((bob, L, D), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bob, H, L, 1), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            # o in the input compute dtype: the callers feed it straight to
            # the out-projection matmul, so an f32 o would cost a full HBM
            # round trip (write f32, read f32, write bf16 — a device trace
            # showed the convert+head-merge fusions at ~3.5 ms each at
            # batch 192). The PV dot still accumulates f32 in the MXU;
            # only the stored result rounds. f32-in stays f32-out (exact).
            jax.ShapeDtypeStruct((B, L, D), q.dtype),
            jax.ShapeDtypeStruct((B, H, L, 1), jnp.float32),
        ),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(*ops)
    return o, lse


def _fused_fwd(q, k, v, padadd, sw8, locs5, seed, scale, rate, gate,
               interpret, H, dh):
    o, lse = _mha_fwd(q, k, v, padadd, sw8, locs5, seed, scale, rate, gate,
                      interpret, H, dh)
    return o, (q, k, v, padadd, sw8, locs5, seed, o, lse)


def _fused_bwd(scale, rate, gate, interpret, H, dh, res, g):
    q, k, v, padadd, sw8, locs5, seed, o, lse = res
    B, L, D = q.shape
    T = k.shape[1]
    bob = _block_batch(B, gate)
    kern = functools.partial(_mha_bwd_kernel, scale=scale, rate=rate,
                             gate=gate, H=H, dh=dh, hw_prng=not interpret,
                             bob=bob)
    byb = lambda *shape: pl.BlockSpec(
        (bob,) + shape, lambda b: (b,) + (0,) * len(shape),
        memory_space=pltpu.VMEM)
    extra = [byb(L, D), byb(L, D), byb(H, L, 1)]  # do, o, lse
    out_specs = [byb(L, D), byb(T, D), byb(T, D)]
    out_shape = [
        jax.ShapeDtypeStruct(q.shape, q.dtype),
        jax.ShapeDtypeStruct(k.shape, k.dtype),
        jax.ShapeDtypeStruct(v.shape, v.dtype),
    ]
    if gate:
        out_specs.append(byb(H, L, 8))
        out_shape.append(jax.ShapeDtypeStruct(sw8.shape, jnp.float32))
    # g rides in its native dtype (= the primal output dtype); the kernel
    # upcasts per-head in VMEM — an .astype(f32) here would materialize a
    # full (B, L, D) f32 copy in HBM first
    ops = ([q, k, v, padadd, seed] + ([sw8, locs5] if gate else [])
           + [g, o, lse])
    outs = pl.pallas_call(
        kern,
        grid=(B // bob,),
        in_specs=_specs(B, H, L, T, D, gate, extra, bob=bob),
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(*ops)
    dq, dk, dv = outs[0], outs[1], outs[2]
    dsw = outs[3].astype(sw8.dtype) if gate else jnp.zeros_like(sw8)
    zseed = np.zeros(seed.shape, dtype=jax.dtypes.float0)
    return (dq, dk, dv, jnp.zeros_like(padadd), dsw,
            jnp.zeros_like(locs5), zseed)


_fused_mha.defvjp(_fused_fwd, _fused_bwd)


def fused_mha(q: Array, k: Array, v: Array, n_heads: int,
              key_padding_mask: Array | None = None,
              pad_additive: Array | None = None,
              gate_sw: Array | None = None,
              locs: Array | None = None,
              dropout_rate: float = 0.0,
              seed: Array | None = None,
              *, scale: float, interpret: bool | None = None) -> Array:
    """softmax(q k^T * scale [+ cond-gate] + pad) @ v, fused in VMEM.

    Args:
      q, k, v: (B, L/T, H*dh) PACKED head layout — exactly the in-projection
        outputs; no (B, H, L, dh) transpose exists anywhere (see module
        docstring). Any float dtype (compute dtype in and out;
        scores/softmax/lse stay f32 in VMEM regardless).
      n_heads: number of attention heads H (dh = D // H; the packing needs
        D <= 128, dh % 128 == 0, or 128 % dh == 0 with D % 128 == 0 —
        dh=64 GPS towers pack two heads per 128-lane block).
      key_padding_mask: (B, T) bool, True = PAD key (torch convention), OR
      pad_additive: (B, T) f32 additive logit row (e.g. HF's -1e4 bias) —
        exactly one of the two.
      gate_sw: (B, H, L, 6) conditional spatial weights [bias, w0..w4]
        (MultiHeadAttentionSpatial 'cond', reference transformers.py:206-232);
        enables the in-kernel gate. Requires ``locs``.
      locs: (B, L, T, 5) pairwise locations (transposed internally once).
      dropout_rate: attention-prob dropout (train); needs ``seed``.
      seed: (1,) int32 PRNG seed for dropout (per (batch, head) streams
        derived in-kernel; backward regenerates the identical mask).
    Returns:
      (B, L, H*dh) in q.dtype (f32 accumulation, rounded on store).
    """
    B, L, D = q.shape
    T = k.shape[1]
    if D % n_heads != 0:
        raise ValueError(f"D={D} not divisible by n_heads={n_heads}")
    dh = D // n_heads
    _block_geometry(D, dh)  # validate packing support eagerly
    if pad_additive is not None:
        padadd = pad_additive.astype(jnp.float32)
    elif key_padding_mask is not None:
        padadd = jnp.where(key_padding_mask, _NEG, 0.0).astype(jnp.float32)
    else:
        padadd = jnp.zeros((B, T), jnp.float32)
    padadd = padadd[:, None, :]  # (B, 1, T): see _specs sublane note
    gate = gate_sw is not None
    if gate:
        sw8 = jnp.pad(gate_sw.astype(jnp.float32), ((0, 0),) * 3 + ((0, 2),))
        locs5 = jnp.transpose(locs.astype(jnp.float32), (0, 3, 1, 2))
    else:  # dummies keep the custom_vjp signature static
        sw8 = jnp.zeros((B, n_heads, 1, 8), jnp.float32)
        locs5 = jnp.zeros((B, 5, 1, 1), jnp.float32)
    if dropout_rate > 0.0 and seed is None:
        raise ValueError("dropout_rate > 0 requires a seed")
    if seed is None:
        seed = jnp.zeros((1,), jnp.int32)
    seed = seed.astype(jnp.int32).reshape((1,))
    if interpret is None:
        # the kernel can only execute as a Mosaic program on TPU; any other
        # backend (the 8-device CPU test mesh) runs the interpreter
        interpret = jax.default_backend() != "tpu"
    rate, scale = float(dropout_rate), float(scale)

    # Under a dp mesh GSPMD would all-gather the operands and run the opaque
    # kernel replicated on every device (no partitioning rule for a
    # pallas_call): shard_map over 'dp' instead, so each device runs its own
    # batch shard. Per-shard dropout streams are decorrelated by folding the
    # dp index into the seed (golden-ratio odd constant); backward re-derives
    # the identical per-shard seed, so masks still match fwd/bwd.
    from sceneverse_tpu.parallel.mesh import ambient_dp_mesh, dp_shard_map

    mesh = ambient_dp_mesh()
    if mesh is not None and B % mesh.shape["dp"] == 0:
        def body(q, k, v, padadd, sw8, locs5, seed):
            if rate > 0.0:
                seed = seed + (jax.lax.axis_index("dp").astype(jnp.int32)
                               * jnp.int32(-1640531527))
            return _fused_mha(q, k, v, padadd, sw8, locs5, seed,
                              scale, rate, gate, interpret, n_heads, dh)

        return dp_shard_map(body, mesh, n_sharded=6, n_replicated=1)(
            q, k, v, padadd, sw8, locs5, seed)
    return _fused_mha(q, k, v, padadd, sw8, locs5, seed,
                      scale, rate, gate, interpret, n_heads, dh)
