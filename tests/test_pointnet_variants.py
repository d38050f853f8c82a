"""SA/FP variant library tests (reference pointnet2_modules.py:78-496 +
the reference's own __main__ smoke at :499-518): shapes, pooling modes,
vote-index passthrough, and FP interpolation math."""

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from sceneverse_tpu.modules.layers.pointnet import (
    PointnetFPModule,
    PointnetLFPModuleMSG,
    PointnetSAModuleMSG,
    PointnetSAModuleMSGVotes,
    PointnetSAModuleVotes,
)
from sceneverse_tpu.ops.pointops import gather_points

B, N, C = 2, 64, 8
rng = np.random.RandomState(0)


def inputs():
    xyz = jnp.asarray(rng.randn(B, N, 3).astype(np.float32))
    feats = jnp.asarray(rng.randn(B, N, C).astype(np.float32))
    return xyz, feats


def test_sa_msg_concats_scales():
    xyz, feats = inputs()
    m = PointnetSAModuleMSG(
        npoint=16, radii=[0.5, 1.0], nsamples=[8, 16],
        mlps=[[C, 16], [C, 32]], rngs=nnx.Rngs(0))
    m.eval()
    new_xyz, out = m(xyz, feats)
    assert new_xyz.shape == (B, 16, 3)
    assert out.shape == (B, 16, 16 + 32)
    assert np.isfinite(np.asarray(out)).all()


def test_sa_votes_inds_passthrough_and_pooling():
    xyz, feats = inputs()
    inds = jnp.asarray(rng.randint(0, N, (B, 16)).astype(np.int32))
    for pooling in ("max", "avg", "rbf"):
        m = PointnetSAModuleVotes(
            mlp=[C, 16], npoint=16, radius=0.8, nsample=8, pooling=pooling,
            normalize_xyz=(pooling == "rbf"), rngs=nnx.Rngs(0))
        m.eval()
        new_xyz, out, out_inds = m(xyz, feats, inds=inds)
        # provided inds pass through untouched; new_xyz = gather(xyz, inds)
        np.testing.assert_array_equal(np.asarray(out_inds), np.asarray(inds))
        np.testing.assert_allclose(np.asarray(new_xyz),
                                   np.asarray(gather_points(xyz, inds)))
        assert out.shape == (B, 16, 16)
        assert np.isfinite(np.asarray(out)).all()


def test_sa_msg_votes():
    xyz, feats = inputs()
    m = PointnetSAModuleMSGVotes(
        mlps=[[C, 16], [C, 16]], npoint=8, radii=[0.5, 1.0], nsamples=[4, 8],
        rngs=nnx.Rngs(0))
    m.eval()
    new_xyz, out, inds = m(xyz, feats)
    assert out.shape == (B, 8, 32)
    assert inds.shape == (B, 8)


def test_fp_interpolation_matches_manual():
    xyz, _ = inputs()
    known = xyz[:, :16]
    known_feats = jnp.asarray(rng.randn(B, 16, C).astype(np.float32))
    fp = PointnetFPModule(mlp=[C, 12], bn=False, rngs=nnx.Rngs(0))
    fp.eval()
    out = fp(xyz, known, None, known_feats)
    assert out.shape == (B, N, 12)

    # manual inverse-distance 3-NN interpolation feeding the same MLP
    from sceneverse_tpu.ops.pointops import three_interpolate, three_nn

    dist, idx = three_nn(xyz, known)
    w = (1.0 / (dist + 1e-8))
    w = w / jnp.sum(w, axis=2, keepdims=True)
    interp = three_interpolate(known_feats, idx, w)
    want = fp.mlp(interp[:, :, None, :])[:, :, 0, :]
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), rtol=1e-5)


def test_fp_known_none_broadcasts():
    xyz, _ = inputs()
    global_feats = jnp.asarray(rng.randn(B, 1, C).astype(np.float32))
    fp = PointnetFPModule(mlp=[C, 12], rngs=nnx.Rngs(0))
    fp.eval()
    out = fp(xyz, None, None, global_feats)
    assert out.shape == (B, N, 12)
    # every position gets the same broadcast feature
    np.testing.assert_allclose(np.asarray(out[:, 0]), np.asarray(out[:, 1]),
                               rtol=1e-6)


def test_lfp_msg_shapes():
    xyz, feats = inputs()
    xyz2 = xyz[:, :16]
    feats2 = jnp.asarray(rng.randn(B, 16, 4).astype(np.float32))
    m = PointnetLFPModuleMSG(
        mlps=[[C, 16]], radii=[0.8], nsamples=[8], post_mlp=[16 + 4, 24],
        rngs=nnx.Rngs(0))
    m.eval()
    out = m(xyz2, xyz, feats2, feats)
    assert out.shape == (B, 16, 24)
    assert np.isfinite(np.asarray(out)).all()


def test_sa_votes_ret_unique_cnt():
    xyz, feats = inputs()
    m = PointnetSAModuleVotes(
        mlp=[C, 16], npoint=16, radius=0.8, nsample=8,
        sample_uniformly=True, ret_unique_cnt=True,
        rngs=nnx.Rngs(0))
    m.eval()
    new_xyz, out, inds, cnt = m(xyz, feats)
    assert cnt.shape == (B, 16)
    assert int(cnt.min()) >= 1 and int(cnt.max()) <= 8  # center always within


def test_sample_uniformly_refills_pad_slots():
    """sample_uniformly (reference pointnet2_utils.py:333-342): pad slots are
    re-drawn uniformly from the ball's unique points; kept slots unchanged."""
    import jax
    from sceneverse_tpu.modules.layers.pointnet import _query_group
    from sceneverse_tpu.ops.pointops import ball_query

    xyz, _ = inputs()
    new_xyz = xyz[:, :16]
    radius, nsample = 0.8, 8
    idx0 = np.asarray(ball_query(radius, nsample, xyz, new_xyz))
    d2 = np.sum((np.asarray(xyz)[:, None] - np.asarray(new_xyz)[:, :, None]) ** 2, -1)
    cnt = np.clip((d2 < radius * radius).sum(-1), 1, nsample)

    _, grouped_xyz = _query_group(
        xyz, new_xyz, None, radius, nsample, use_xyz=True,
        sample_uniformly=True, key=jax.random.PRNGKey(3))
    # recover the chosen indices by matching grouped offsets to points
    g = np.asarray(grouped_xyz) + np.asarray(new_xyz)[:, :, None, :]
    pts = np.asarray(xyz)
    for b in range(2):
        for m in range(16):
            c = cnt[b, m]
            uniq = set(idx0[b, m, :c])
            for s_ in range(nsample):
                # the grouped point must be one of the ball's unique points
                dists = np.sum((pts[b] - g[b, m, s_]) ** 2, -1)
                j = int(dists.argmin())
                assert dists[j] < 1e-9
                assert j in uniq


def test_bn_fold_matches_literal_batchnorm(monkeypatch):
    """ConvBNReLU's train-mode analytic BN fold (pointnet.py _folded):
    outputs, input/param grads, and running-stat updates match the literal
    conv -> nnx.BatchNorm -> relu pipeline in f32 (the fold computes the
    SAME fast-variance statistics from the conv input's mean/gram instead
    of from the materialized conv output)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from flax import nnx

    from sceneverse_tpu.modules.layers.pointnet import ConvBNReLU

    def run(mode):
        r = np.random.RandomState(3)
        x = jnp.asarray(r.randn(4, 5, 7, 6).astype(np.float32)) * 2.0 + 0.5
        monkeypatch.setenv("SCENEVERSE_BN_FOLD", mode)
        layer = ConvBNReLU(6, 16, bn=True, rngs=nnx.Rngs(0))
        layer.train()
        # non-trivial BN affine so dgamma/dbeta and the fold interact
        layer.bn.scale.value = jnp.asarray(
            r.randn(16).astype(np.float32) * 0.5 + 1.0)
        layer.bn.bias.value = jnp.asarray(np.linspace(-1, 1, 16,
                                                      dtype=np.float32))
        w = jnp.asarray(r.randn(4, 5, 7, 16).astype(np.float32))

        def loss(layer, x):
            return jnp.sum(layer(x) * w)

        (val, out), grads = nnx.value_and_grad(
            lambda m, x: (loss(m, x), m(x)), has_aux=True, argnums=(0, 1)
        )(layer, x)
        return val, out, grads, layer.bn.mean.value, layer.bn.var.value

    v_f, o_f, g_f, m_f, var_f = run("on")
    v_p, o_p, g_p, m_p, var_p = run("off")
    np.testing.assert_allclose(float(v_f), float(v_p), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(o_f), np.asarray(o_p),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(m_f), np.asarray(m_p),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(var_f), np.asarray(var_p),
                               rtol=1e-4, atol=1e-6)
    flat_f = jax.tree_util.tree_leaves(g_f)
    flat_p = jax.tree_util.tree_leaves(g_p)
    assert len(flat_f) == len(flat_p)
    for a, b in zip(flat_f, flat_p):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


def test_bn_fold_eval_mode_uses_running_stats(monkeypatch):
    """In eval mode the fold is bypassed: running statistics are used and
    not updated, identically with the knob on or off."""
    import jax.numpy as jnp
    import numpy as np
    from flax import nnx

    from sceneverse_tpu.modules.layers.pointnet import ConvBNReLU

    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(3, 4, 6).astype(np.float32))
    outs = []
    for mode in ("on", "off"):
        monkeypatch.setenv("SCENEVERSE_BN_FOLD", mode)
        layer = ConvBNReLU(6, 8, bn=True, rngs=nnx.Rngs(0))
        layer.eval()
        m0 = np.asarray(layer.bn.mean.value).copy()
        outs.append(np.asarray(layer(x)))
        np.testing.assert_array_equal(np.asarray(layer.bn.mean.value), m0)
    np.testing.assert_array_equal(outs[0], outs[1])
