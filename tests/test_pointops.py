"""Unit tests for sceneverse_tpu.ops against independent numpy references that
transcribe the reference CUDA semantics (sampling_gpu.cu, ball_query_gpu.cu,
interpolate_gpu.cu) — plus gradient checks mirroring the reference's
pointnet2_test.py gradcheck of three_interpolate."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sceneverse_tpu.ops import (
    ball_query,
    calc_pairwise_locs,
    furthest_point_sample,
    gather_points,
    group_points,
    three_interpolate,
    three_nn,
)


# ---------------------------------------------------------------- numpy refs
def np_fps(xyz, npoint):
    """Transcription of furthest_point_sampling_kernel (sampling_gpu.cu:69-173)."""
    B, N, _ = xyz.shape
    idxs = np.zeros((B, npoint), dtype=np.int32)
    for b in range(B):
        temp = np.full(N, 1e10, dtype=np.float64)
        old = 0
        idxs[b, 0] = 0
        for j in range(1, npoint):
            best, besti = -1.0, 0
            p1 = xyz[b, old]
            for k in range(N):
                mag = float(np.sum(xyz[b, k] ** 2))
                if mag <= 1e-3:
                    continue
                d = float(np.sum((xyz[b, k] - p1) ** 2))
                d2 = min(d, temp[k])
                temp[k] = d2
                if d2 > best:
                    best, besti = d2, k
            old = besti
            idxs[b, j] = old
    return idxs


def np_ball_query(radius, nsample, xyz, new_xyz):
    """Transcription of query_ball_point_kernel (ball_query_gpu.cu:9-44)."""
    B, N, _ = xyz.shape
    M = new_xyz.shape[1]
    idx = np.zeros((B, M, nsample), dtype=np.int32)
    r2 = radius * radius
    for b in range(B):
        for j in range(M):
            cnt = 0
            for k in range(N):
                if cnt >= nsample:
                    break
                d2 = float(np.sum((new_xyz[b, j] - xyz[b, k]) ** 2))
                if d2 < r2:
                    if cnt == 0:
                        idx[b, j, :] = k
                    idx[b, j, cnt] = k
                    cnt += 1
    return idx


def np_three_nn(unknown, known):
    d2 = np.sum((unknown[:, :, None, :] - known[:, None, :, :]) ** 2, axis=-1)
    idx = np.argsort(d2, axis=-1, kind="stable")[..., :3]
    dist = np.sqrt(np.take_along_axis(d2, idx, axis=-1))
    return dist.astype(np.float32), idx.astype(np.int32)


# --------------------------------------------------------------------- tests
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_fps_matches_cuda_semantics(seed):
    rng = np.random.RandomState(seed)
    xyz = rng.randn(3, 64, 3).astype(np.float32)
    got = np.asarray(furthest_point_sample(jnp.asarray(xyz), 16))
    want = np_fps(xyz, 16)
    np.testing.assert_array_equal(got, want)


def test_fps_skips_near_origin_points():
    rng = np.random.RandomState(0)
    xyz = rng.randn(2, 32, 3).astype(np.float32) + 5.0
    xyz[:, 10:20, :] = 0.0  # padding points at the origin must never be picked
    got = np.asarray(furthest_point_sample(jnp.asarray(xyz), 8))
    want = np_fps(xyz, 8)
    np.testing.assert_array_equal(got, want)
    assert not np.any((got >= 10) & (got < 20))


@pytest.mark.parametrize("radius,nsample", [(0.5, 8), (1.0, 4), (0.05, 8)])
def test_ball_query_matches_cuda_semantics(radius, nsample):
    rng = np.random.RandomState(7)
    xyz = rng.randn(2, 48, 3).astype(np.float32)
    new_xyz = xyz[:, :12, :]
    got = np.asarray(ball_query(radius, nsample, jnp.asarray(xyz), jnp.asarray(new_xyz)))
    want = np_ball_query(radius, nsample, xyz, new_xyz)
    np.testing.assert_array_equal(got, want)


def test_ball_query_empty_ball_is_zero():
    xyz = jnp.ones((1, 8, 3))
    new_xyz = jnp.full((1, 2, 3), 100.0)
    got = np.asarray(ball_query(0.1, 4, xyz, new_xyz))
    np.testing.assert_array_equal(got, np.zeros((1, 2, 4), np.int32))


def test_gather_and_group_points():
    rng = np.random.RandomState(3)
    pts = rng.randn(2, 16, 5).astype(np.float32)
    idx = rng.randint(0, 16, size=(2, 6)).astype(np.int32)
    got = np.asarray(gather_points(jnp.asarray(pts), jnp.asarray(idx)))
    want = np.stack([pts[b][idx[b]] for b in range(2)])
    np.testing.assert_allclose(got, want)

    gidx = rng.randint(0, 16, size=(2, 6, 4)).astype(np.int32)
    got = np.asarray(group_points(jnp.asarray(pts), jnp.asarray(gidx)))
    want = np.stack([pts[b][gidx[b]] for b in range(2)])
    np.testing.assert_allclose(got, want)


def test_group_points_onehot_branch_bit_exact():
    # N <= 128 routes through the one-hot MXU matmul (pointops.py): HIGHEST
    # precision must make f32 passthrough BIT-exact vs fancy indexing, and
    # the N > 128 take_along_axis branch must agree too.
    rng = np.random.RandomState(7)
    for n in (32, 300):
        pts = rng.randn(3, n, 7).astype(np.float32)
        idx = rng.randint(0, n, size=(3, 5, 4)).astype(np.int32)
        got = np.asarray(group_points(jnp.asarray(pts), jnp.asarray(idx)))
        want = np.stack([pts[b][idx[b]] for b in range(3)])
        np.testing.assert_array_equal(got, want)


def test_group_points_grad_is_scatter_add():
    # CUDA backward uses atomicAdd (group_points_gpu.cu:44-74); XLA's derived
    # gradient must be the equivalent (deterministic) scatter-add.
    pts = jnp.ones((1, 4, 2))
    idx = jnp.array([[[0, 0, 1], [3, 3, 3]]], dtype=jnp.int32)  # repeats
    g = jax.grad(lambda p: jnp.sum(group_points(p, idx)))(pts)
    want = np.array([[[2.0, 2.0], [1.0, 1.0], [0.0, 0.0], [3.0, 3.0]]])
    np.testing.assert_allclose(np.asarray(g), want)


def test_three_nn():
    rng = np.random.RandomState(11)
    unknown = rng.randn(2, 20, 3).astype(np.float32)
    known = rng.randn(2, 7, 3).astype(np.float32)
    dist, idx = three_nn(jnp.asarray(unknown), jnp.asarray(known))
    wdist, widx = np_three_nn(unknown, known)
    np.testing.assert_array_equal(np.asarray(idx), widx)
    np.testing.assert_allclose(np.asarray(dist), wdist, rtol=1e-5, atol=1e-5)


def test_three_interpolate_forward_and_grad():
    rng = np.random.RandomState(5)
    feats = rng.randn(2, 7, 6).astype(np.float32)
    idx = rng.randint(0, 7, size=(2, 10, 3)).astype(np.int32)
    w = rng.rand(2, 10, 3).astype(np.float32)
    got = np.asarray(three_interpolate(jnp.asarray(feats), jnp.asarray(idx), jnp.asarray(w)))
    want = np.einsum("bnk,bnkc->bnc", w, np.stack([feats[b][idx[b]] for b in range(2)]))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    # numerical vs analytic gradient (mirrors reference pointnet2_test.py:18-30)
    f = lambda x: jnp.sum(jnp.sin(three_interpolate(x, jnp.asarray(idx), jnp.asarray(w))))
    analytic = np.asarray(jax.grad(f)(jnp.asarray(feats)))
    eps = 1e-3
    for _ in range(5):
        b, m, c = rng.randint(2), rng.randint(7), rng.randint(6)
        fp = feats.copy(); fp[b, m, c] += eps
        fm = feats.copy(); fm[b, m, c] -= eps
        num = (float(f(jnp.asarray(fp))) - float(f(jnp.asarray(fm)))) / (2 * eps)
        np.testing.assert_allclose(analytic[b, m, c], num, rtol=1e-2, atol=1e-2)


def test_calc_pairwise_locs_matches_reference_math():
    rng = np.random.RandomState(9)
    centers = rng.randn(2, 6, 3).astype(np.float32)
    whls = np.abs(rng.randn(2, 6, 3)).astype(np.float32)
    got = np.asarray(calc_pairwise_locs(jnp.asarray(centers), jnp.asarray(whls)))
    assert got.shape == (2, 6, 6, 5)

    # independent numpy transcription of modules/utils.py:49-68
    eps = 1e-10
    pl = centers[:, :, None, :] - centers[:, None, :, :]
    pd = np.sqrt(np.sum(pl**2, axis=3) + eps)
    maxd = pd.reshape(2, -1).max(axis=1)
    npd = pd / maxd[:, None, None]
    pd2 = np.sqrt(np.sum(pl[..., :2] ** 2, axis=3) + eps)
    want = np.stack(
        [npd, pl[..., 2] / pd, pd2 / pd, pl[..., 1] / pd2, pl[..., 0] / pd2], axis=3
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    got4 = calc_pairwise_locs(jnp.asarray(centers), jnp.asarray(whls), spatial_dim=4)
    np.testing.assert_allclose(np.asarray(got4), want[..., 1:], rtol=1e-5, atol=1e-5)
    got1 = calc_pairwise_locs(jnp.asarray(centers), jnp.asarray(whls), spatial_dim=1)
    np.testing.assert_allclose(np.asarray(got1)[..., 0], npd, rtol=1e-5, atol=1e-5)

    gvb = calc_pairwise_locs(
        jnp.asarray(centers), jnp.asarray(whls), pairwise_rel_type="vertical_bottom"
    )
    bc = centers.copy()
    bc[:, :, 2] -= whls[:, :, 2]
    bpl = bc[:, :, None, :] - bc[:, None, :, :]
    bpd = np.sqrt(np.sum(bpl**2, axis=3) + eps)
    bpd2 = np.sqrt(np.sum(bpl[..., :2] ** 2, axis=3) + eps)
    wantvb = np.stack(
        [npd, bpl[..., 2] / bpd, bpd2 / bpd, pl[..., 1] / pd2, pl[..., 0] / pd2], axis=3
    )
    np.testing.assert_allclose(np.asarray(gvb), wantvb, rtol=1e-4, atol=1e-4)
