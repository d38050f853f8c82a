"""Pairwise spatial geometry features for spatial-aware attention.

JAX rewrite of reference modules/utils.py:38-114 (``calc_pairwise_locs`` /
``calc_pairwise_locs_mv``): the 5-D pairwise geometric feature
[norm-dist, dz/dist, horiz-ratio, dy/dist2d, dx/dist2d] with per-scene
max-distance normalization, ``center`` and ``vertical_bottom`` modes.
O(O^2) at O<=80 objects — trivially fused elementwise work for the VPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def calc_pairwise_locs(
    obj_centers: Array,
    obj_whls: Array | None = None,
    eps: float = 1e-10,
    pairwise_rel_type: str = "center",
    spatial_dist_norm: bool = True,
    spatial_dim: int = 5,
) -> Array:
    """Pairwise spatial features between object centers.

    Args:
      obj_centers: (B, L, 3).
      obj_whls: (B, L, 3) box extents (needed for 'mlp'/'vertical_bottom').

    Returns:
      (B, L, L, spatial_dim) — or (B, L, L, 2*6) for 'mlp'.
    """
    if pairwise_rel_type == "mlp":
        obj_locs = jnp.concatenate([obj_centers, obj_whls], axis=2)  # (B,L,6)
        L = obj_locs.shape[1]
        a = jnp.repeat(obj_locs[:, :, None, :], L, axis=2)
        b = jnp.repeat(obj_locs[:, None, :, :], L, axis=1)
        return jnp.concatenate([a, b], axis=3)

    pairwise_locs = obj_centers[:, :, None, :] - obj_centers[:, None, :, :]
    pairwise_dists = jnp.sqrt(jnp.sum(jnp.square(pairwise_locs), axis=3) + eps)
    if spatial_dist_norm:
        max_dists = jnp.max(pairwise_dists.reshape(pairwise_dists.shape[0], -1), axis=1)
        norm_pairwise_dists = pairwise_dists / max_dists[:, None, None]
    else:
        norm_pairwise_dists = pairwise_dists

    if spatial_dim == 1:
        return norm_pairwise_dists[..., None]

    pairwise_dists_2d = jnp.sqrt(
        jnp.sum(jnp.square(pairwise_locs[..., :2]), axis=3) + eps
    )
    if pairwise_rel_type == "center":
        feats = jnp.stack(
            [
                norm_pairwise_dists,
                pairwise_locs[..., 2] / pairwise_dists,
                pairwise_dists_2d / pairwise_dists,
                pairwise_locs[..., 1] / pairwise_dists_2d,
                pairwise_locs[..., 0] / pairwise_dists_2d,
            ],
            axis=3,
        )
    elif pairwise_rel_type == "vertical_bottom":
        bottom_centers = obj_centers.at[:, :, 2].add(-obj_whls[:, :, 2])
        bottom_pairwise_locs = (
            bottom_centers[:, :, None, :] - bottom_centers[:, None, :, :]
        )
        bottom_pairwise_dists = jnp.sqrt(
            jnp.sum(jnp.square(bottom_pairwise_locs), axis=3) + eps
        )
        bottom_pairwise_dists_2d = jnp.sqrt(
            jnp.sum(jnp.square(bottom_pairwise_locs[..., :2]), axis=3) + eps
        )
        feats = jnp.stack(
            [
                norm_pairwise_dists,
                bottom_pairwise_locs[..., 2] / bottom_pairwise_dists,
                bottom_pairwise_dists_2d / bottom_pairwise_dists,
                pairwise_locs[..., 1] / pairwise_dists_2d,
                pairwise_locs[..., 0] / pairwise_dists_2d,
            ],
            axis=3,
        )
    else:
        raise NotImplementedError(f"unsupported pairwise_rel_type {pairwise_rel_type}")

    if spatial_dim == 4:
        feats = feats[..., 1:]
    return feats


def calc_pairwise_locs_mv(
    obj_centers: Array,
    pairwise_rel_type: str = "center",
    spatial_dist_norm: bool = True,
    spatial_dim: int = 5,
) -> Array:
    """Multi-view variant (reference modules/utils.py:89-114): centers only."""
    return calc_pairwise_locs(
        obj_centers,
        obj_whls=None,
        pairwise_rel_type=pairwise_rel_type,
        spatial_dist_norm=spatial_dist_norm,
        spatial_dim=spatial_dim,
    )
