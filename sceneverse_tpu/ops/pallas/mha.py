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
        return jax.default_backend() == "tpu"
    return False


def _uniform01(shape):
    """(shape) f32 uniforms in [0, 1) from the per-core PRNG (24-bit)."""
    bits = pltpu.prng_random_bits(shape)
    # signed right-shift of the raw int32 bits can smear the sign bit; mask
    # to the low 24 bits explicitly (exact in f32)
    u24 = jnp.bitwise_and(bits, (1 << 24) - 1)
    return u24.astype(jnp.float32) * (1.0 / (1 << 24))


def _gate_z(sw, locs_ref, padrow):
    """Spatial 'cond' gate logits z (L, T) from per-query weights sw (L, 8)
    [bias, w0..w4, pad, pad] and location planes locs_ref (1, 5, L, T)."""
    z = sw[:, 0:1]
    for d in range(5):
        z = z + sw[:, d + 1:d + 2] * locs_ref[0, d]
    return z


def _mha_fwd_kernel(q_ref, k_ref, v_ref, pad_ref, seed_ref, *rest,
                    scale, rate, gate, H):
    if gate:
        sw_ref, locs_ref, o_ref, lse_ref = rest
    else:
        o_ref, lse_ref = rest
    b = pl.program_id(0)
    padrow = pad_ref[0, :, :]  # (1, T) additive: 0 valid, -1e30 pad
    keep = 1.0 - rate
    for h in range(H):
        q = q_ref[0, h]  # (L, dh)
        k = k_ref[0, h]  # (T, dh)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale + padrow  # (L, T) f32
        if gate:
            z = _gate_z(sw_ref[0, h], locs_ref, padrow)
            loc = jnp.maximum(jax.nn.log_sigmoid(z), _LOG1E6)
            loc = jnp.where(padrow < -1.0, _LOG1E6, loc)
            s = s + loc
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s - m)
        tot = jnp.sum(p, axis=1, keepdims=True)
        lse_ref[0, h] = m + jnp.log(tot)
        pn = (p / tot).astype(v_ref.dtype)  # value-dtype probs (softmax_lowp)
        if rate > 0.0:
            pltpu.prng_seed(seed_ref[0] + b * H + h)
            dropmask = _uniform01(pn.shape) < keep
            pn = jnp.where(dropmask, pn * (1.0 / keep), 0.0).astype(v_ref.dtype)
        o_ref[0, h] = jax.lax.dot_general(
            pn, v_ref[0, h], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(o_ref.dtype)


def _mha_bwd_kernel(q_ref, k_ref, v_ref, pad_ref, seed_ref, *rest,
                    scale, rate, gate, H):
    if gate:
        (sw_ref, locs_ref, do_ref, o_ref, lse_ref,
         dq_ref, dk_ref, dv_ref, dsw_ref) = rest
    else:
        do_ref, o_ref, lse_ref, dq_ref, dk_ref, dv_ref = rest
    b = pl.program_id(0)
    padrow = pad_ref[0, :, :]
    keep = 1.0 - rate
    cdt = q_ref.dtype
    for h in range(H):
        q = q_ref[0, h]
        k = k_ref[0, h]
        v = v_ref[0, h]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale + padrow
        if gate:
            z = _gate_z(sw_ref[0, h], locs_ref, padrow)
            ls = jax.nn.log_sigmoid(z)
            loc = jnp.where(padrow < -1.0, _LOG1E6, jnp.maximum(ls, _LOG1E6))
            s = s + loc
        p = jnp.exp(s - lse_ref[0, h])  # normalized probs, f32
        do = do_ref[0, h].astype(jnp.float32)  # (L, dh)
        delta = jnp.sum(do * o_ref[0, h], axis=1, keepdims=True)  # (L, 1)
        pb = p.astype(cdt)
        dob = do.astype(cdt)
        if rate > 0.0:
            pltpu.prng_seed(seed_ref[0] + b * H + h)  # same bits as forward
            dropmask = _uniform01(p.shape) < keep
            a = jnp.where(dropmask, pb * (1.0 / keep), 0.0).astype(cdt)
        else:
            a = pb
        dv_ref[0, h] = jax.lax.dot_general(  # a^T @ do -> (T, dh)
            a, dob, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dv_ref.dtype)
        dp = jax.lax.dot_general(  # do @ v^T -> (L, T)
            dob, v, (((1,), (1,)), ((), ())),
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
                cols.append(jnp.sum(dz * locs_ref[0, d], axis=1, keepdims=True))
            cols.append(jnp.zeros_like(cols[0]))
            cols.append(jnp.zeros_like(cols[0]))
            dsw_ref[0, h] = jnp.concatenate(cols, axis=1)  # (L, 8)
        dsb = ds.astype(cdt)
        dq_ref[0, h] = (jax.lax.dot_general(
            dsb, k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale).astype(dq_ref.dtype)
        dk_ref[0, h] = (jax.lax.dot_general(
            dsb, q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale).astype(dk_ref.dtype)


def _specs(B, H, L, T, dh, gate, extra=()):
    byb = lambda *shape: pl.BlockSpec(
        (1,) + shape, lambda b: (b,) + (0,) * len(shape),
        memory_space=pltpu.VMEM)
    # pad row rides as (B, 1, T): Mosaic requires a block's sublane dim be
    # 8-divisible OR equal to the array dim — (1, T) blocks of a (B, T)
    # array violate that on real TPU (caught on-chip; interpret mode does
    # not enforce it)
    specs = [byb(H, L, dh), byb(H, T, dh), byb(H, T, dh), byb(1, T),
             pl.BlockSpec(memory_space=pltpu.SMEM)]
    if gate:
        specs += [byb(H, L, 8), byb(5, L, T)]
    return specs + list(extra)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10))
def _fused_mha(q, k, v, padadd, sw8, locs5, seed, scale, rate, gate,
               interpret):
    o, _ = _mha_fwd(q, k, v, padadd, sw8, locs5, seed, scale, rate, gate,
                    interpret)
    return o


def _mha_fwd(q, k, v, padadd, sw8, locs5, seed, scale, rate, gate, interpret):
    B, H, L, dh = q.shape
    T = k.shape[2]
    kern = functools.partial(_mha_fwd_kernel, scale=scale, rate=rate,
                             gate=gate, H=H)
    ops = [q, k, v, padadd, seed] + ([sw8, locs5] if gate else [])
    o, lse = pl.pallas_call(
        kern,
        grid=(B,),
        in_specs=_specs(B, H, L, T, dh, gate),
        out_specs=(
            pl.BlockSpec((1, H, L, dh), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, L, 1), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            # o in the input compute dtype: the callers feed it straight to
            # the out-projection matmul, so an f32 o would cost a full HBM
            # round trip (write f32, read f32, write bf16 — a device trace
            # showed the convert+head-merge fusions at ~3.5 ms each at
            # batch 192). The PV dot still accumulates f32 in the MXU;
            # only the stored result rounds. f32-in stays f32-out (exact).
            jax.ShapeDtypeStruct((B, H, L, dh), q.dtype),
            jax.ShapeDtypeStruct((B, H, L, 1), jnp.float32),
        ),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(*ops)
    return o, lse


def _fused_fwd(q, k, v, padadd, sw8, locs5, seed, scale, rate, gate,
               interpret):
    o, lse = _mha_fwd(q, k, v, padadd, sw8, locs5, seed, scale, rate, gate,
                      interpret)
    return o, (q, k, v, padadd, sw8, locs5, seed, o, lse)


def _fused_bwd(scale, rate, gate, interpret, res, g):
    q, k, v, padadd, sw8, locs5, seed, o, lse = res
    B, H, L, dh = q.shape
    T = k.shape[2]
    kern = functools.partial(_mha_bwd_kernel, scale=scale, rate=rate,
                             gate=gate, H=H)
    byb = lambda *shape: pl.BlockSpec(
        (1,) + shape, lambda b: (b,) + (0,) * len(shape),
        memory_space=pltpu.VMEM)
    extra = [byb(H, L, dh), byb(H, L, dh), byb(H, L, 1)]  # do, o, lse
    out_specs = [byb(H, L, dh), byb(H, T, dh), byb(H, T, dh)]
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
    # full (B, H, L, dh) f32 copy in HBM first
    ops = ([q, k, v, padadd, seed] + ([sw8, locs5] if gate else [])
           + [g, o, lse])
    outs = pl.pallas_call(
        kern,
        grid=(B,),
        in_specs=_specs(B, H, L, T, dh, gate, extra),
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


def fused_mha(q: Array, k: Array, v: Array,
              key_padding_mask: Array | None = None,
              pad_additive: Array | None = None,
              gate_sw: Array | None = None,
              locs: Array | None = None,
              dropout_rate: float = 0.0,
              seed: Array | None = None,
              *, scale: float, interpret: bool = False) -> Array:
    """softmax(q k^T * scale [+ cond-gate] + pad) @ v, fused in VMEM.

    Args:
      q, k, v: (B, H, L/T, dh), any float dtype (compute dtype in and out;
        scores/softmax/lse stay f32 in VMEM regardless).
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
      (B, H, L, dh) in q.dtype (f32 accumulation, rounded on store).
    """
    B, H, L, dh = q.shape
    T = k.shape[2]
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
        sw8 = jnp.zeros((B, H, 1, 8), jnp.float32)
        locs5 = jnp.zeros((B, 5, 1, 1), jnp.float32)
    if dropout_rate > 0.0 and seed is None:
        raise ValueError("dropout_rate > 0 requires a seed")
    if seed is None:
        seed = jnp.zeros((1,), jnp.int32)
    return _fused_mha(q, k, v, padadd, sw8, locs5,
                      seed.astype(jnp.int32).reshape((1,)),
                      float(scale), float(dropout_rate), gate, interpret)
