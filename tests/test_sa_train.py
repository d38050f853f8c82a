"""Trainable fused-SA kernel (ops/pallas/sa_train.py) equivalence tests.

Three layers of proof, all in Pallas interpret mode on CPU:
1. value+grad parity of the pallas ops against a pure-JAX replica with the
   SAME rounding points (validates the custom VJPs including the
   batch-statistics cotangent path),
2. value+stats parity of the composite `fused_trainable_sa` against the
   incumbent XLA analytic-fold pipeline (SharedMLP + max) under mixed
   precision (validates the module integration),
3. dp-mesh shard_map == single-device on the same global batch (validates
   the in-shard psum moment normalization — SyncBatchNorm semantics).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

from sceneverse_tpu.modules.layers.pointnet import SharedMLP
from sceneverse_tpu.ops.pallas import sa_train

G, M, NS, C = 8, 4, 8, 6
SPEC = [C, 8, 8, 16]


def _params(seed=0):
    rng = np.random.RandomState(seed)
    params = []
    for cin, h in zip(SPEC, SPEC[1:]):
        w = jnp.asarray(rng.randn(cin, h).astype(np.float32) * 0.4)
        a = jnp.asarray(rng.rand(h).astype(np.float32) + 0.5)
        b = jnp.asarray(rng.randn(h).astype(np.float32) * 0.1)
        params.append((w, a, b))
    return tuple(params)


def _x(seed=1, rows=G * M * NS):
    rng = np.random.RandomState(seed)
    return jnp.asarray(rng.randn(rows, C).astype(np.float32))


# ------------------------------------------------------------------ replicas


def _f32dot(x, w):
    return jax.lax.dot_general(
        x.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)


def _ref_chain(x, params, upto):
    h = x
    for (w, a, b) in params[:upto]:
        h = jnp.maximum(_f32dot(h, w) * a + b, 0.0)
    return h


def _ref_stats(x, params, upto):
    h = _ref_chain(x, params, upto)
    hb = h.astype(jnp.bfloat16)
    s = jnp.sum(hb.astype(jnp.float32), axis=0)
    g = jax.lax.dot_general(hb, hb, (((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    return s, g


def _ref_pool(x, params, ns):
    h3 = _ref_chain(x, params, 3)
    return jnp.max(h3.reshape(-1, ns, h3.shape[-1]), axis=1)


# -------------------------------------------------------------------- tests


@pytest.mark.parametrize("upto", [1, 2])
def test_mlp_stats_matches_replica(upto):
    x, params = _x(), _params()
    s_k, g_k = sa_train.mlp_stats(jnp.transpose(x), params, upto, True)
    s_r, g_r = _ref_stats(x, params, upto)
    np.testing.assert_allclose(np.asarray(s_k), np.asarray(s_r),
                               rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(g_k), np.asarray(g_r),
                               rtol=1e-5, atol=1e-4)


@pytest.mark.parametrize("upto", [1, 2])
def test_mlp_stats_grads_match_replica(upto):
    x, params = _x(), _params()
    rngp = np.random.RandomState(7)
    H = SPEC[upto]
    cs = jnp.asarray(rngp.randn(H).astype(np.float32))
    cg = jnp.asarray(rngp.randn(H, H).astype(np.float32) * 0.1)

    def loss_k(x, params):
        s, g = sa_train.mlp_stats(jnp.transpose(x), params, upto, True)
        return jnp.sum(s * cs) + jnp.sum(g * cg)

    def loss_r(x, params):
        s, g = _ref_stats(x, params, upto)
        return jnp.sum(s * cs) + jnp.sum(g * cg)

    vk, gk = jax.value_and_grad(loss_k, argnums=(0, 1))(x, params)
    vr, gr = jax.value_and_grad(loss_r, argnums=(0, 1))(x, params)
    np.testing.assert_allclose(float(vk), float(vr), rtol=1e-5)
    for lk, lr in zip(jax.tree.leaves(gk), jax.tree.leaves(gr)):
        # the replica's autodiff quantizes cotangents to bf16 at its astype
        # boundaries (the kernel accumulates f32) — compare at bf16-ulp
        # scaled absolute tolerance
        lk, lr = np.asarray(lk, np.float32), np.asarray(lr, np.float32)
        atol = 5e-3 + 1e-2 * np.abs(lr).max()
        np.testing.assert_allclose(lk, lr, rtol=2e-2, atol=atol)


def test_mlp_pool_matches_replica_with_grads():
    x, params = _x(), _params()
    rngp = np.random.RandomState(8)
    cw = jnp.asarray(rngp.randn(G * M, SPEC[-1]).astype(np.float32))

    def loss_k(x, params):
        return jnp.sum(sa_train.mlp_pool(jnp.transpose(x), params, NS, True)
                       * cw)

    def loss_r(x, params):
        return jnp.sum(_ref_pool(x, params, NS) * cw)

    vk, gk = jax.value_and_grad(loss_k, argnums=(0, 1))(x, params)
    vr, gr = jax.value_and_grad(loss_r, argnums=(0, 1))(x, params)
    np.testing.assert_allclose(float(vk), float(vr), rtol=1e-5, atol=1e-5)
    for lk, lr in zip(jax.tree.leaves(gk), jax.tree.leaves(gr)):
        lk, lr = np.asarray(lk, np.float32), np.asarray(lr, np.float32)
        atol = 5e-3 + 1e-2 * np.abs(lr).max()
        np.testing.assert_allclose(lk, lr, rtol=2e-2, atol=atol)


def _mlp(seed=0, train=True):
    mlp = SharedMLP(SPEC, bn=True, rngs=nnx.Rngs(seed))
    if train:
        mlp.train()
    from sceneverse_tpu.utils.precision import set_compute_dtype

    set_compute_dtype(mlp, jnp.bfloat16)
    return mlp


def _replica_composite(grouped, mlp):
    """Pure-JAX replica of fused_trainable_sa's composite (same fold math,
    same rounding points as the kernels) — the deterministic gradient
    oracle. The incumbent module path is NOT a usable gradient oracle here:
    it max-pools the bf16-ROUNDED h3, where rounding collisions create
    positive ties whose gradient jnp.max duplicates across rows (measured:
    1 tie in 512 pools at these test shapes moves single param-grad entries
    by O(1)); the kernel pools pre-rounding f32 (tie-free a.s.), which is
    gradient-equivalent on untied data."""
    Gd, Md, NSd, Cd = grouped.shape
    x = grouped.reshape(-1, Cd)
    R = x.shape[0]
    layers = list(mlp.layers)

    def fold(layer, mean_in, gram_in):
        bn = layer.bn
        w = layer.conv.kernel.value.astype(jnp.float32)
        mean_h = mean_in @ w
        var_h = jnp.maximum(
            jnp.einsum("ch,cd,dh->h", w, gram_in, w,
                       precision=jax.lax.Precision.HIGHEST)
            - mean_h * mean_h, 0.0)
        a = jax.lax.rsqrt(var_h + bn.epsilon) * bn.scale.value.astype(
            jnp.float32)
        b = -mean_h * a + bn.bias.value.astype(jnp.float32)
        return a, b

    s0 = jnp.sum(x.astype(jnp.float32), axis=0)
    g0 = jax.lax.dot_general(x, x, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32,
                             precision=jax.lax.Precision.HIGHEST)
    a1, b1 = fold(layers[0], s0 / R, g0 / R)
    p = [(layers[0].conv.kernel.value, a1, b1)]
    s1, g1 = _ref_stats(x, p, 1)
    a2, b2 = fold(layers[1], s1 / R, g1 / R)
    p.append((layers[1].conv.kernel.value, a2, b2))
    s2, g2 = _ref_stats(x, p, 2)
    a3, b3 = fold(layers[2], s2 / R, g2 / R)
    p.append((layers[2].conv.kernel.value, a3, b3))
    return _ref_pool(x, p, NSd).reshape(Gd, Md, -1)


def test_composite_matches_xla_fold_pipeline(monkeypatch):
    """fused_trainable_sa vs the incumbent ConvBNReLU analytic-fold XLA
    path (values + BN running stats), and vs the pure-JAX replica composite
    (gradients — see _replica_composite for why the incumbent is not the
    gradient oracle)."""
    monkeypatch.setenv("SCENEVERSE_BN_BF16", "on")
    # the incumbent being compared against is the analytic-fold pipeline
    # (the fused kernel's own math); default flipped to off in round 5
    monkeypatch.setenv("SCENEVERSE_BN_FOLD", "on")
    rng = np.random.RandomState(3)
    grouped = jnp.asarray(rng.randn(G, M, NS, C).astype(np.float32))
    cw = jnp.asarray(rng.randn(G, M, SPEC[-1]).astype(np.float32))

    def loss_ref(mlp, grouped):
        return jnp.sum(jnp.max(mlp(grouped), axis=2).astype(jnp.float32)
                       * cw)

    def loss_replica(mlp, grouped):
        return jnp.sum(_replica_composite(grouped, mlp) * cw)

    def loss_fused(mlp, grouped):
        return jnp.sum(sa_train.fused_trainable_sa(
            grouped, mlp, interpret=True).astype(jnp.float32) * cw)

    outs = {}
    for name, loss in (("ref", loss_ref), ("replica", loss_replica),
                       ("fused", loss_fused)):
        mlp = _mlp()
        graphdef, state = nnx.split(mlp)

        def f(state, grouped, loss=loss):
            m = nnx.merge(graphdef, state)
            val = loss(m, grouped)
            _, new_state = nnx.split(m)
            return val, new_state

        (val, new_state), grads = jax.value_and_grad(
            f, argnums=(0,), has_aux=True)(state, grouped)
        outs[name] = (float(val), new_state, grads)

    v_ref, st_ref, _ = outs["ref"]
    _v_rep, _st_rep, g_rep = outs["replica"]
    v_fus, st_fus, g_fus = outs["fused"]
    # semantic check vs the INCUMBENT: loss value + BN running stats
    assert abs(v_ref - v_fus) <= 2e-3 * abs(v_ref) + 1e-3
    for lr, lf in zip(jax.tree.leaves(st_ref), jax.tree.leaves(st_fus)):
        lr, lf = np.asarray(lr), np.asarray(lf)
        if lr.dtype.kind == "f":
            np.testing.assert_allclose(lr, lf, rtol=2e-2, atol=2e-3)
    # gradient check vs the deterministic replica (bf16-ulp-scaled atol:
    # the replica's autodiff quantizes cotangents at its astype boundaries)
    for lr, lf in zip(jax.tree.leaves(g_rep), jax.tree.leaves(g_fus)):
        lr, lf = np.asarray(lr, np.float32), np.asarray(lf, np.float32)
        atol = 2e-2 + 1e-2 * np.abs(lr).max()
        np.testing.assert_allclose(lr, lf, rtol=3e-2, atol=atol)


def test_composite_dp_shard_map_matches_single(monkeypatch):
    """Under a dp mesh the moments psum across shards: global-batch BN
    (SyncBatchNorm semantics) -> identical pooled output to mesh=None."""
    monkeypatch.setenv("SCENEVERSE_PALLAS_INTERPRET", "1")
    from sceneverse_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(len(jax.devices()), mp=1)
    # per-shard center count must stay a multiple of 8 (sa_train.supported)
    G2 = 2 * mesh.shape["dp"]
    assert sa_train.supported(G2, M, NS, mesh.shape["dp"])
    rng = np.random.RandomState(4)
    grouped = jnp.asarray(rng.randn(G2, M, NS, C).astype(np.float32))

    mlp = _mlp()
    pooled_single = sa_train.fused_trainable_sa(grouped, mlp,
                                                interpret=True)
    mlp2 = _mlp()
    with mesh:
        pooled_mesh = sa_train.fused_trainable_sa(grouped, mlp2,
                                                  interpret=True, mesh=mesh)
    np.testing.assert_allclose(np.asarray(pooled_single),
                               np.asarray(pooled_mesh),
                               rtol=1e-5, atol=1e-5)
    # running stats identical too (psum'd moments == global moments)
    for l1, l2 in zip(jax.tree.leaves(nnx.state(mlp, nnx.BatchStat)),
                      jax.tree.leaves(nnx.state(mlp2, nnx.BatchStat))):
        np.testing.assert_allclose(np.asarray(l1), np.asarray(l2),
                                   rtol=1e-5, atol=1e-6)
