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


@pytest.mark.parametrize(
    "G,N,m,fbo",
    [
        # SA2-like: N<=128, npoint%8==0, fbo==G -> lane-transposed kernel
        (16, 32, 16, 16),
        # fbo reduces to G (512->16): still transposed via fbo==G
        (16, 32, 16, 512),
        # npoint%8 != 0 -> row-oriented _fps_kernel branch
        (16, 32, 12, 16),
        # G=24, fbo=512 -> fbo reduces to 3 (24%512!=0 ... ends odd): G%8
        # mismatch exercises the fbo halving + row fallback (fbo=8 -> G%8==0)
        (24, 32, 16, 8),
        # multi-block grid with fbo%128 != 0 and fbo != G: the alignment
        # guard must route this to the row-oriented kernel (on-device the
        # transposed path would be rejected by Mosaic; interpret mode
        # wouldn't catch it)
        (32, 32, 16, 16),
    ],
)
def test_fused_sa_forward_split_fps_parity(G, N, m, fbo):
    """split_fps=True (FPS in its own kernel, transposed or row-oriented)
    must be bit-identical to the inline-FPS path: same one-hot sums and
    segment max, only the loop orientation differs."""
    rng = np.random.RandomState(3)
    C, ns, r = 6, N, 0.8
    sa = PointnetSAModule(
        npoint=m, radius=r, nsample=ns, mlp=[3, 8, 8, 16],
        use_pallas=False, rngs=nnx.Rngs(3),
    )
    sa.eval()
    pts = rng.randn(G, N, C).astype(np.float32)
    # a few near-origin pad points: FPS must skip them (mag<=1e-3 rule)
    pts[:, -2:, :3] = 1e-4
    pts = jnp.asarray(pts)
    (w1, s1), (w2, s2), (w3, s3) = fold_shared_mlp(sa.mlp)
    pooled0, xyz0 = fused_sa_forward(
        pts, m, ns, r, w1, s1, w2, s2, w3, s3, interpret=True,
        split_fps=False)
    pooled1, xyz1 = fused_sa_forward(
        pts, m, ns, r, w1, s1, w2, s2, w3, s3, interpret=True,
        split_fps=True, fps_block_objects=fbo)
    np.testing.assert_array_equal(np.asarray(xyz0), np.asarray(xyz1))
    np.testing.assert_array_equal(np.asarray(pooled0), np.asarray(pooled1))
    # and both match the two-stage reference semantics
    new_xyz_ref, pooled_ref = sa(pts[..., :3], pts[..., 3:])
    np.testing.assert_allclose(np.asarray(xyz1), np.asarray(new_xyz_ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(pooled1), np.asarray(pooled_ref),
                               rtol=5e-2, atol=5e-2)


@pytest.mark.parametrize(
    "G,N,m,ns,r,bo",
    [
        # SA2 geometry (scaled): multi-block grid, empty balls included
        (16, 32, 16, 32, 0.8, 4),
        (16, 32, 16, 32, 0.05, 4),   # mostly-empty balls: (c, 0) fallback
        (8, 32, 8, 48, 0.8, 8),      # ns > n, single block (bo == G)
        (12, 16, 8, 16, 0.8, 4),     # bo*N % 128 != 0: bo must widen/fallback
    ],
)
def test_fused_sa_forward_dense_batched_bitparity(G, N, m, ns, r, bo):
    """dense_batched=True (loop-free stage 1, pre-repeated centers operand)
    must be BIT-identical to the per-object dense kernel: same dots with the
    same contraction order per element, same mask math, same pool."""
    rng = np.random.RandomState(7)
    C = 6
    sa = PointnetSAModule(
        npoint=m, radius=r, nsample=ns, mlp=[3, 8, 8, 16],
        use_pallas=False, rngs=nnx.Rngs(7),
    )
    sa.eval()
    pts = rng.randn(G, N, C).astype(np.float32)
    pts[:, -2:, :3] = 1e-4  # FPS pad-skip rule active
    pts = jnp.asarray(pts)
    (w1, s1), (w2, s2), (w3, s3) = fold_shared_mlp(sa.mlp)
    pooled0, xyz0 = fused_sa_forward(
        pts, m, ns, r, w1, s1, w2, s2, w3, s3, interpret=True,
        block_objects=bo, split_fps=True, dense_batched=False)
    pooled1, xyz1 = fused_sa_forward(
        pts, m, ns, r, w1, s1, w2, s2, w3, s3, interpret=True,
        block_objects=bo, split_fps=True, dense_batched=True)
    np.testing.assert_array_equal(np.asarray(xyz0), np.asarray(xyz1))
    np.testing.assert_array_equal(np.asarray(pooled0), np.asarray(pooled1))
    # and against the two-stage reference semantics
    new_xyz_ref, pooled_ref = sa(pts[..., :3], pts[..., 3:])
    np.testing.assert_allclose(np.asarray(xyz1), np.asarray(new_xyz_ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(pooled1), np.asarray(pooled_ref),
                               rtol=5e-2, atol=5e-2)


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
