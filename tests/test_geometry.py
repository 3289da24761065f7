"""Geometry-op unit tests.

Oracles are independent numpy reimplementations of the reference's pure-torch
fallbacks (models/openshape/pointnet_util.py:64-110, models/ulip/pointbert/
misc.py:40-60), per SURVEY.md §4 test strategy layer (1).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from uni_adapter_tpu.ops import geometry as G
from uni_adapter_tpu.ops.fps_pallas import fps_pallas


def np_fps(xyz: np.ndarray, npoint: int, start: int = 0) -> np.ndarray:
    """Numpy FPS oracle (same recurrence as pointnet_util.py:64-86)."""
    B, N, _ = xyz.shape
    out = np.zeros((B, npoint), dtype=np.int64)
    dist = np.full((B, N), np.inf)
    farthest = np.full((B,), start, dtype=np.int64)
    for i in range(npoint):
        out[:, i] = farthest
        c = xyz[np.arange(B), farthest][:, None, :]
        d = np.sum((xyz - c) ** 2, -1)
        dist = np.minimum(dist, d)
        farthest = np.argmax(dist, -1)
    return out


def np_ball_query(radius, nsample, xyz, new_xyz):
    """Numpy ball-query oracle (pointnet_util.py:89-110 semantics)."""
    B, N, _ = xyz.shape
    S = new_xyz.shape[1]
    sqd = (np.sum(new_xyz**2, -1)[:, :, None] + np.sum(xyz**2, -1)[:, None, :]
           - 2 * np.einsum("bsc,bnc->bsn", new_xyz, xyz))
    gi = np.broadcast_to(np.arange(N)[None, None], (B, S, N)).copy()
    gi[sqd > radius**2] = N
    gi = np.sort(gi, -1)[:, :, :nsample]
    first = gi[:, :, :1]
    return np.where(gi == N, first, gi)


@pytest.fixture
def pts():
    rng = np.random.default_rng(0)
    return rng.standard_normal((2, 256, 3)).astype(np.float32)


def test_square_distance(pts):
    d = np.asarray(G.square_distance(jnp.array(pts), jnp.array(pts)))
    ref = np.sum((pts[:, :, None] - pts[:, None]) ** 2, -1)
    np.testing.assert_allclose(d, ref, atol=1e-4)


def test_fps_matches_numpy_oracle(pts):
    got = np.asarray(G.farthest_point_sample(jnp.array(pts), 64))
    want = np_fps(pts, 64)
    np.testing.assert_array_equal(got, want)


def test_fps_pallas_matches_xla(pts):
    want = np.asarray(G.farthest_point_sample(jnp.array(pts), 64))
    got = np.asarray(fps_pallas(jnp.array(pts), 64, interpret=True))
    np.testing.assert_array_equal(got, want)


def test_fps_pallas_nonaligned_n():
    rng = np.random.default_rng(1)
    pts = rng.standard_normal((1, 200, 3)).astype(np.float32)  # not /128
    want = np_fps(pts, 32)
    got = np.asarray(fps_pallas(jnp.array(pts), 32, interpret=True))
    np.testing.assert_array_equal(got, want)


def test_fps_covers_spread_points():
    # FPS of K well-separated clusters must pick one point per cluster first.
    centers = np.array([[0, 0, 0], [10, 0, 0], [0, 10, 0], [0, 0, 10]], dtype=np.float32)
    rng = np.random.default_rng(2)
    pts = (centers[None, :, None] + 0.01 * rng.standard_normal((1, 4, 16, 3))).reshape(1, 64, 3).astype(np.float32)
    idx = np.asarray(G.farthest_point_sample(jnp.array(pts), 4))[0]
    clusters = set(idx // 16)
    assert clusters == {0, 1, 2, 3}


def test_knn_neighbourhood_sets(pts):
    x = jnp.array(pts)
    centers = G.fps_gather(x, 16)
    idx = np.asarray(G.knn_point(8, x, centers))
    # brute-force check
    sqd = np.sum((np.asarray(centers)[:, :, None] - pts[:, None]) ** 2, -1)
    want = np.argsort(sqd, -1)[:, :, :8]
    for b in range(idx.shape[0]):
        for s in range(idx.shape[1]):
            assert set(idx[b, s]) == set(want[b, s])


def test_ball_query_matches_oracle(pts):
    x = jnp.array(pts)
    centers = np.asarray(G.fps_gather(x, 16))
    got = np.asarray(G.query_ball_point(0.5, 8, x, jnp.array(centers)))
    want = np_ball_query(0.5, 8, pts, centers)
    np.testing.assert_array_equal(got, want)


def test_group_points_center_relative(pts):
    x = jnp.array(pts)
    nb, center, feats = G.group_points(x, jnp.ones_like(x), 16, 8)
    assert nb.shape == (2, 16, 8, 3)
    assert center.shape == (2, 16, 3)
    assert feats.shape == (2, 16, 8, 6)
    # each group contains its own center → one row of rel-xyz ≈ 0
    mins = np.asarray(jnp.min(jnp.sum(nb**2, -1), axis=-1))
    np.testing.assert_allclose(mins, 0.0, atol=1e-9)
    # color channel passes through unchanged
    np.testing.assert_allclose(np.asarray(feats[..., 3:]), 1.0)


def test_sample_and_group_shapes(pts):
    x = jnp.array(pts)
    new_xyz, new_points = G.sample_and_group(16, 0.4, 8, x, jnp.ones_like(x))
    assert new_xyz.shape == (2, 16, 3)
    assert new_points.shape == (2, 16, 8, 6)


def test_index_points_matmul_exact(pts):
    x = jnp.array(pts)
    idx = G.knn_point(8, x, G.fps_gather(x, 16))
    a = np.asarray(G.index_points(x, idx))
    b = np.asarray(G.index_points_matmul(x, idx))
    np.testing.assert_array_equal(a, b)        # bit-exact (fp32 one-hot)


def test_knn_approx_matches_exact_sets(pts):
    x = jnp.array(pts)
    centers = G.fps_gather(x, 16)
    exact = np.asarray(G.knn_point(8, x, centers))
    approx = np.asarray(G.knn_point(8, x, centers, approx=True))
    # on CPU approx_max_k falls back to exact; on TPU recall ≈ 1.0 —
    # compare as sets with a tolerance of one element per neighbourhood
    for b in range(exact.shape[0]):
        for s in range(exact.shape[1]):
            assert len(set(exact[b, s]) & set(approx[b, s])) >= 7


def test_fps_pallas_batched_matches_xla(pts):
    from uni_adapter_tpu.ops.fps_pallas import fps_pallas_batched
    want = np.asarray(G.farthest_point_sample(jnp.array(pts), 64))
    got = np.asarray(fps_pallas_batched(jnp.array(pts), 64, interpret=True))
    np.testing.assert_array_equal(got, want)


def test_fps_pallas_batched_odd_batch():
    from uni_adapter_tpu.ops.fps_pallas import fps_pallas_batched
    rng = np.random.default_rng(3)
    pts = rng.standard_normal((5, 200, 3)).astype(np.float32)  # B,N unaligned
    want = np_fps(pts, 32)
    got = np.asarray(fps_pallas_batched(jnp.array(pts), 32, interpret=True))
    np.testing.assert_array_equal(got, want)


def test_ball_query_empty_ball_clamps_to_last_index():
    """Degenerate case pin (VERDICT r1 weak #5): a query with NO point inside
    the radius yields all-sentinel indices; the reference (pointnet_util.py:
    89-110) would propagate sentinel N into the gather and index-error —
    this rebuild clamps to N-1 (documented deviation, geometry.py).  The
    path never occurs when queries come from FPS of the same cloud (the
    center itself is at distance 0), pinned here so any future change is
    deliberate."""
    pts = jnp.zeros((1, 16, 3), jnp.float32)                # all at origin
    far_query = jnp.full((1, 1, 3), 100.0, jnp.float32)     # empty ball
    idx = np.asarray(G.query_ball_point(0.1, 4, pts, far_query))
    assert (idx == 15).all()                                 # clamped N-1

    # sanity: a center ON a point keeps normal semantics (self at slot 0)
    near_query = jnp.zeros((1, 1, 3), jnp.float32)
    idx2 = np.asarray(G.query_ball_point(0.1, 4, pts, near_query))
    assert (idx2 == np.array([0, 1, 2, 3])).all()
