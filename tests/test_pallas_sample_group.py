"""Parity tests: the fused Pallas sample+group kernel (interpret mode on CPU)
must match the reference-semantics XLA ops exactly."""

import jax.numpy as jnp
import numpy as np
import pytest

from sceneverse_tpu.ops.pallas.sample_group import fused_sample_and_group
from sceneverse_tpu.ops.pointops import (
    ball_query,
    furthest_point_sample,
    gather_points,
    group_points,
)


@pytest.mark.parametrize("G,N,C,m,ns,r", [(3, 64, 6, 8, 4, 0.7),
                                          (2, 128, 6, 16, 8, 0.5)])
def test_fused_matches_xla_ops(G, N, C, m, ns, r):
    rng = np.random.RandomState(0)
    pts = jnp.asarray(rng.randn(G, N, C).astype(np.float32))
    xyz = pts[:, :, :3]

    grouped, new_xyz, fps_idx, bq_idx = fused_sample_and_group(
        pts, m, ns, r, interpret=True
    )

    want_fps = furthest_point_sample(xyz, m)
    np.testing.assert_array_equal(np.asarray(fps_idx), np.asarray(want_fps))

    want_centers = gather_points(xyz, want_fps)
    np.testing.assert_allclose(np.asarray(new_xyz), np.asarray(want_centers),
                               rtol=1e-6)

    want_bq = ball_query(r, ns, xyz, want_centers)
    np.testing.assert_array_equal(np.asarray(bq_idx), np.asarray(want_bq))

    want_grouped_xyz = group_points(xyz, want_bq) - want_centers[:, :, None, :]
    want_feats = group_points(pts[:, :, 3:], want_bq)
    want = np.concatenate(
        [np.asarray(want_grouped_xyz), np.asarray(want_feats)], axis=-1
    )
    np.testing.assert_allclose(np.asarray(grouped), want, rtol=1e-5, atol=1e-6)


def test_fused_handles_origin_padding_points():
    rng = np.random.RandomState(1)
    pts = rng.randn(1, 64, 6).astype(np.float32) + 3.0
    pts[:, 40:, :3] = 0.0  # near-origin points: FPS must skip them
    grouped, new_xyz, fps_idx, bq_idx = fused_sample_and_group(
        jnp.asarray(pts), 8, 4, 0.8, interpret=True
    )
    assert not np.any(np.asarray(fps_idx) >= 40)
    want_fps = furthest_point_sample(jnp.asarray(pts[:, :, :3]), 8)
    np.testing.assert_array_equal(np.asarray(fps_idx), np.asarray(want_fps))
