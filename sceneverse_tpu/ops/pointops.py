"""Point-cloud sampling/grouping ops, TPU-first.

These replace the reference's CUDA extension (reference
modules/third_party/pointnet2/_ext_src/src/{sampling,ball_query,group_points,
interpolate}_gpu.cu and the autograd wrappers in pointnet2_utils.py) with
jit-compilable XLA programs:

  * ``furthest_point_sample`` — the inherently sequential FPS loop becomes a
    ``lax.fori_loop`` whose body is a fully vectorized distance update over
    all (batch, point) lanes: VPU-friendly, no per-point Python.
  * ``ball_query`` — the CUDA "first nsample hits in index order" scan becomes
    a masked ``lax.top_k`` over an order-encoding integer key, preserving the
    reference's exact pad-with-first-hit semantics (ball_query_gpu.cu:27-41).
  * ``group_points`` / ``gather_points`` — plain gathers; XLA derives the
    scatter-add gradient (replacing the CUDA atomicAdd backward kernels).
  * ``three_nn`` / ``three_interpolate`` — ``lax.top_k`` + weighted gather;
    autodiff is free.

Layout note: the framework is channels-LAST ((..., N, C)) throughout — the
TPU-natural layout where the feature dim maps to vector lanes / MXU columns —
whereas the reference is channels-first ((B, C, N)).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

Array = jax.Array


@functools.partial(jax.jit, static_argnames=("npoint",))
def furthest_point_sample(xyz: Array, npoint: int) -> Array:
    """Iterative furthest point sampling.

    Matches reference sampling_gpu.cu:69-173 exactly:
      * ``idxs[0] = 0`` unconditionally,
      * points with squared magnitude <= 1e-3 are never candidates and never
        have their min-distance updated (the near-origin/padding skip at
        sampling_gpu.cu:100-101),
      * min-distance buffer initialised to 1e10 (sampling.cpp:74-76),
      * ties resolved to the lowest index (deterministic; the CUDA tree
        reduction is tie-nondeterministic, so any choice is parity-valid).

    Args:
      xyz: (B, N, 3) float point coordinates.
      npoint: number of samples m.

    Returns:
      (B, npoint) int32 indices. Non-differentiable (indices).
    """
    B, N, _ = xyz.shape
    xyz = xyz.astype(jnp.float32)
    valid = jnp.sum(xyz * xyz, axis=-1) > 1e-3  # (B, N)

    init_mindist = jnp.full((B, N), 1e10, dtype=jnp.float32)
    init_idxs = jnp.zeros((B, npoint), dtype=jnp.int32)
    init_old = jnp.zeros((B,), dtype=jnp.int32)

    def body(j, carry):
        old, mindist, idxs = carry
        last = jnp.take_along_axis(xyz, old[:, None, None], axis=1)  # (B,1,3)
        d = jnp.sum(jnp.square(xyz - last), axis=-1)  # (B, N)
        mindist = jnp.where(valid, jnp.minimum(mindist, d), mindist)
        cand = jnp.where(valid, mindist, -1.0)
        new = jnp.argmax(cand, axis=-1).astype(jnp.int32)  # (B,)
        idxs = lax.dynamic_update_index_in_dim(idxs, new, j, axis=1)
        return new, mindist, idxs

    _, _, idxs = lax.fori_loop(1, npoint, body, (init_old, init_mindist, init_idxs))
    return jax.lax.stop_gradient(idxs)


def gather_points(points: Array, idx: Array) -> Array:
    """Gather point features by index (channels-last).

    Reference: gather_points kernel, sampling_gpu.cu:8-57 (channels-first
    ``out[b,c,j] = points[b,c,idx[b,j]]``). The atomicAdd backward kernel is
    unnecessary here — XLA derives a deterministic scatter-add gradient.

    Args:
      points: (B, N, C).
      idx: (B, M) int32.

    Returns:
      (B, M, C).
    """
    return jnp.take_along_axis(points, idx[..., None], axis=1)


def group_points(points: Array, idx: Array) -> Array:
    """Group point features by index (channels-last).

    Reference: group_points kernel, group_points_gpu.cu:7-74 (channels-first
    ``out[b,c,j,k] = points[b,c,idx[b,j,k]]``); gradient = scatter-add.

    Args:
      points: (B, N, C).
      idx: (B, M, S) int32. PRECONDITION: every index must be in [0, N).
        The small-N one-hot path below returns silent ZEROS for an
        out-of-range index, while the take_along_axis path CLAMPS to the
        nearest valid row — callers with clamped/sentinel index schemes
        must mask themselves. ball_query/FPS always satisfy this (their
        outputs index their own inputs).

    Returns:
      (B, M, S, C).
    """
    B, M, S = idx.shape
    N, C = points.shape[1], points.shape[2]
    if N <= 128:
        # Small source sets (SA2: N=32): XLA lowers take_along_axis to an
        # elementwise gather and its grad to a sort-based scatter-add — a
        # b64 unfreeze device trace put SA2's group gathers at 54 ms/step
        # and the backward scatter at 36 ms/step (BASELINE.md round 4).
        # A one-hot batched matmul runs both on the MXU instead; autodiff
        # of the dot gives the backward scatter as the transposed one-hot
        # dot for free. Exactness: one-hot rows select single source rows
        # (one nonzero product of x*1.0 per output element), and HIGHEST
        # precision makes f32 passthrough bit-exact (default-precision f32
        # dots round operands to bf16).
        onehot = (idx.reshape(B, M * S)[:, :, None]
                  == jnp.arange(N, dtype=idx.dtype)).astype(points.dtype)
        out = jax.lax.dot_general(
            onehot, points, (((2,), (1,)), ((0,), (0,))),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=points.dtype)
        return out.reshape(B, M, S, C)
    flat = jnp.take_along_axis(points, idx.reshape(B, M * S, 1), axis=1)
    return flat.reshape(B, M, S, C)


@functools.partial(jax.jit, static_argnames=("radius", "nsample"))
def ball_query(radius: float, nsample: int, xyz: Array, new_xyz: Array) -> Array:
    """Indices of the first ``nsample`` points (in index order) within
    ``radius`` of each query center.

    Matches reference ball_query_gpu.cu:9-44 exactly, including:
      * strict ``d2 < radius^2`` inclusion,
      * *first-k in index order*, NOT nearest-k,
      * slots beyond the hit count filled with the FIRST hit
        (the cnt==0 fill loop at ball_query_gpu.cu:34-38),
      * all-zero output when a ball is empty (zero-initialised output buffer).

    TPU design: rather than a sequential scan over N, encode "is a hit" and
    index order into one integer key (hits get key=i, misses key=N+i) and take
    the nsample smallest via ``lax.top_k`` — O(N log k) on the VPU, fully
    batched, no data-dependent control flow.

    Args:
      radius: ball radius (static).
      nsample: max samples per ball (static).
      xyz: (B, N, 3) all points.
      new_xyz: (B, M, 3) query centers.

    Returns:
      (B, M, nsample) int32.
    """
    N = xyz.shape[1]
    d2 = jnp.sum(
        jnp.square(new_xyz[:, :, None, :] - xyz[:, None, :, :]), axis=-1
    )  # (B, M, N)
    within = d2 < (radius * radius)
    order = jnp.arange(N, dtype=jnp.int32)
    key = jnp.where(within, order, order + N)  # hits sort before misses
    k = min(nsample, N)  # CUDA allows nsample > N: extra slots pad-with-first
    neg_small, _ = lax.top_k(-key, k)  # k smallest keys, ascending
    idx = -neg_small  # (B, M, k), sorted: hits in index order first
    idx = jnp.where(idx >= N, idx - N, idx)
    count = jnp.sum(within, axis=-1, dtype=jnp.int32)  # (B, M)
    first = idx[..., :1]  # first hit if any; index 0 when ball empty
    if k < nsample:
        idx = jnp.concatenate(
            [idx, jnp.broadcast_to(first, (*first.shape[:-1], nsample - k))],
            axis=-1)
    slots = jnp.arange(nsample, dtype=jnp.int32)
    filled = slots[None, None, :] < count[..., None]
    return jnp.where(filled, idx, first)


@functools.partial(jax.jit)
def three_nn(unknown: Array, known: Array) -> tuple[Array, Array]:
    """Three nearest neighbors of each ``unknown`` point among ``known``.

    Reference: interpolate_gpu.cu:9-59 (brute-force running top-3).

    Args:
      unknown: (B, n, 3).
      known: (B, m, 3).

    Returns:
      dist: (B, n, 3) Euclidean distances (sqrt'd, like pointnet2_utils.py:139).
      idx: (B, n, 3) int32 neighbor indices.
    """
    d2 = jnp.sum(
        jnp.square(unknown[:, :, None, :] - known[:, None, :, :]), axis=-1
    )  # (B, n, m)
    neg, idx = lax.top_k(-d2, 3)
    return jnp.sqrt(jnp.maximum(-neg, 0.0)), idx.astype(jnp.int32)


def three_interpolate(features: Array, idx: Array, weight: Array) -> Array:
    """Weighted linear interpolation of 3-NN features (channels-last).

    Reference: interpolate_gpu.cu:71-100 + the atomicAdd grad kernel; here the
    gather+weighted-sum is natively differentiable.

    Args:
      features: (B, m, C) source features.
      idx: (B, n, 3) int32 3-NN indices into m.
      weight: (B, n, 3) interpolation weights.

    Returns:
      (B, n, C).
    """
    gathered = group_points(features, idx)  # (B, n, 3, C)
    return jnp.sum(gathered * weight[..., None], axis=2)
