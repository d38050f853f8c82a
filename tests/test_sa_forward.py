"""Parity test: the fully-fused SA forward kernel (interpret mode) must match
the two-stage path (XLA ops + SharedMLP with frozen BN) within bf16 matmul
tolerance."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

from sceneverse_tpu.modules.layers.pointnet import PointnetSAModule
from sceneverse_tpu.ops.pallas.sa_forward import fold_shared_mlp, fused_sa_forward


def test_fused_sa_forward_matches_two_stage():
    rng = np.random.RandomState(0)
    G, N, C, m, ns, r = 4, 64, 6, 8, 8, 0.8
    sa = PointnetSAModule(
        npoint=m, radius=r, nsample=ns, mlp=[3, 8, 8, 16],
        use_pallas=False, rngs=nnx.Rngs(0),
    )
    sa.eval()  # frozen BN stats
    # non-trivial BN stats
    for layer in sa.mlp.layers:
        k = layer.bn.mean[...].shape[0]
        layer.bn.mean[...] = jnp.asarray(rng.randn(k).astype(np.float32) * 0.1)
        layer.bn.var[...] = jnp.asarray(np.abs(rng.randn(k)).astype(np.float32) + 0.5)

    pts = jnp.asarray(rng.randn(G, N, C).astype(np.float32))
    xyz, feats = pts[..., :3], pts[..., 3:]
    new_xyz_ref, pooled_ref = sa(xyz, feats)

    (w1, s1), (w2, s2), (w3, s3) = fold_shared_mlp(sa.mlp)
    pooled, new_xyz = fused_sa_forward(
        pts, m, ns, r, w1, s1, w2, s2, w3, s3, interpret=True
    )
    np.testing.assert_allclose(np.asarray(new_xyz), np.asarray(new_xyz_ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(pooled), np.asarray(pooled_ref),
                               rtol=5e-2, atol=5e-2)  # bf16 matmuls
    # correlation check: bf16 rounding must not change structure
    a = np.asarray(pooled).ravel()
    b = np.asarray(pooled_ref).ravel()
    assert np.corrcoef(a, b)[0, 1] > 0.999


def test_fused_frozen_wiring():
    """PointNetPP.set_fused_frozen flips the flag on every SA level."""
    from sceneverse_tpu.modules.layers.pointnet import PointNetPP

    pnet = PointNetPP(
        sa_n_points=[16, 8, None], sa_n_samples=[8, 8, None],
        sa_radii=[0.2, 0.4, None], sa_mlps=[[3, 8, 8, 16], [16, 8, 8, 16],
                                            [16, 8, 8, 16]],
        rngs=nnx.Rngs(0),
    )
    pnet.set_fused_frozen(True)
    assert all(sa.fused_frozen for sa in pnet.encoder)


@pytest.mark.parametrize("N,ns,r", [(32, 32, 0.8), (16, 24, 0.8),
                                    (32, 32, 0.05)])  # 0.05: empty balls
def test_fused_sa_forward_dense_path(N, ns, r):
    """nsample >= n statically selects the DENSE formulation (selection-free
    all-pairs + masked max; SA2's configuration): parity vs the two-stage
    path, including CUDA's empty-ball point-0 fallback and ns > n (where the
    extra slots only duplicate group members — invisible to max pooling)."""
    rng = np.random.RandomState(1)
    G, C, m = 4, 6, 8
    sa = PointnetSAModule(
        npoint=m, radius=r, nsample=ns, mlp=[3, 8, 8, 16],
        use_pallas=False, rngs=nnx.Rngs(1),
    )
    sa.eval()
    for layer in sa.mlp.layers:
        k = layer.bn.mean[...].shape[0]
        layer.bn.mean[...] = jnp.asarray(rng.randn(k).astype(np.float32) * 0.1)
        layer.bn.var[...] = jnp.asarray(
            np.abs(rng.randn(k)).astype(np.float32) + 0.5)

    pts = jnp.asarray(rng.randn(G, N, C).astype(np.float32))
    xyz, feats = pts[..., :3], pts[..., 3:]
    new_xyz_ref, pooled_ref = sa(xyz, feats)

    (w1, s1), (w2, s2), (w3, s3) = fold_shared_mlp(sa.mlp)
    pooled, new_xyz = fused_sa_forward(
        pts, m, ns, r, w1, s1, w2, s2, w3, s3, interpret=True
    )
    np.testing.assert_allclose(np.asarray(new_xyz), np.asarray(new_xyz_ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(pooled), np.asarray(pooled_ref),
                               rtol=5e-2, atol=5e-2)
