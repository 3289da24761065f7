"""Fused Pallas kNN kernel vs the XLA oracle (ops/geometry.knn_point).

Runs in interpreter mode on the CPU mesh (like the FPS kernel tests).  The
kernel's contract: identical neighbour index *sequences* on tie-free clouds
(ascending distance, lowest-index tie-break — the stable-TopK order);
identical neighbour *sets* always.  Reference semantics:
models/point_encoder.py:17-49 (dense distance matrix + topk).
"""
import numpy as np
import jax.numpy as jnp
import pytest

from uni_adapter_tpu.ops.geometry import knn_point, group_points
from uni_adapter_tpu.ops.knn_pallas import knn_pallas


def _rand(b, n, c=3, seed=0):
    return np.random.default_rng(seed).standard_normal((b, n, c)).astype(
        np.float32)


@pytest.mark.parametrize("B,S,N,k", [
    (2, 16, 128, 4),       # one tile
    (3, 40, 256, 8),       # S not a multiple of the fp32 sublane tile
    (2, 16, 200, 4),       # N not a multiple of the 128-lane tile
])
def test_knn_pallas_matches_xla(B, S, N, k):
    xyz = jnp.array(_rand(B, N, seed=B * N + k))
    q = jnp.array(_rand(B, S, seed=B * N + k + 1))
    ref = np.asarray(knn_point(k, xyz, q))
    got = np.asarray(knn_pallas(k, xyz, q, interpret=True))
    assert got.shape == (B, S, k)
    # tie-free random clouds: exact index-sequence agreement
    np.testing.assert_array_equal(ref, got)


def test_knn_pallas_query_tiling():
    """S large enough to hit the multi-tile grid path (s_tile splits)."""
    B, S, N, k = 1, 1100, 1024, 4
    xyz = jnp.array(_rand(B, N, seed=7))
    q = jnp.array(_rand(B, S, seed=8))
    ref = np.asarray(knn_point(k, xyz, q))
    got = np.asarray(knn_pallas(k, xyz, q, interpret=True))
    np.testing.assert_array_equal(ref, got)


def test_knn_pallas_tie_break_lowest_index():
    """Duplicate points: equal distances must resolve to the lowest index,
    the stable-TopK tie-break the XLA twin implements."""
    base = _rand(1, 8, seed=3)
    xyz = np.concatenate([base, base], axis=1)  # every point duplicated
    q = base.copy()
    ref = np.asarray(knn_point(3, jnp.array(xyz), jnp.array(q)))
    got = np.asarray(knn_pallas(3, jnp.array(xyz), jnp.array(q),
                                interpret=True))
    np.testing.assert_array_equal(ref, got)


def test_group_points_pallas_knn_same_neighbourhoods():
    """group_points(use_pallas_knn=True) produces the same neighbourhood
    tensors as the XLA path (downstream of identical index sequences)."""
    xyz = jnp.array(_rand(2, 128, seed=11))
    color = jnp.array(_rand(2, 128, seed=12))
    import uni_adapter_tpu.ops.knn_pallas as kp
    import functools
    orig = kp.knn_pallas
    # route the in-graph call through interpret mode for the CPU suite
    kp.knn_pallas = functools.partial(orig, interpret=True)
    try:
        n_ref, c_ref, f_ref = group_points(xyz, color, 16, 8)
        n_got, c_got, f_got = group_points(xyz, color, 16, 8,
                                           use_pallas_knn=True)
    finally:
        kp.knn_pallas = orig
    np.testing.assert_array_equal(np.asarray(c_ref), np.asarray(c_got))
    np.testing.assert_array_equal(np.asarray(n_ref), np.asarray(n_got))
    np.testing.assert_array_equal(np.asarray(f_ref), np.asarray(f_got))


@pytest.mark.parametrize("B,S,N,k,C", [
    (2, 16, 128, 4, 6),
    (3, 40, 200, 8, 6),      # S and N off the tile boundaries
    (2, 16, 128, 4, 3),      # xyz-only gather
])
def test_knn_gather_pallas_fused_exact(B, S, N, k, C):
    """Fused kNN+gather: identical indices AND bitwise-identical gathered
    features vs knn_point + index_points_matmul (the winner one-hot matmul
    inside the kernel has one nonzero per row, so fp32-HIGHEST reproduces
    each value exactly)."""
    from uni_adapter_tpu.ops.geometry import index_points_matmul
    from uni_adapter_tpu.ops.knn_pallas import knn_gather_pallas

    rng = np.random.default_rng(B * N + k)
    xyz = jnp.asarray(rng.standard_normal((B, N, 3)).astype(np.float32))
    q = jnp.asarray(rng.standard_normal((B, S, 3)).astype(np.float32))
    vals = jnp.asarray(rng.standard_normal((B, N, C)).astype(np.float32))
    idx_ref = knn_point(k, xyz, q)
    g_ref = np.asarray(index_points_matmul(vals, idx_ref))
    idx, g = knn_gather_pallas(k, xyz, q, vals, interpret=True)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(idx_ref))
    np.testing.assert_array_equal(np.asarray(g), g_ref)


def test_group_points_fused_gather_bitwise():
    """group_points(use_pallas_knn_gather=True) is bitwise-identical to the
    XLA path — same FPS centers, same neighbourhoods/features (the fused
    kernel's in-VMEM one-hot gather is exact)."""
    import functools

    import uni_adapter_tpu.ops.knn_pallas as kp

    xyz = jnp.array(_rand(2, 128, seed=13))
    color = jnp.array(_rand(2, 128, seed=14))
    orig = kp.knn_gather_pallas
    kp.knn_gather_pallas = functools.partial(orig, interpret=True)
    try:
        for col in (color, None):
            n_ref, c_ref, f_ref = group_points(xyz, col, 16, 8)
            n_got, c_got, f_got = group_points(xyz, col, 16, 8,
                                               use_pallas_knn_gather=True)
            np.testing.assert_array_equal(np.asarray(c_ref), np.asarray(c_got))
            np.testing.assert_array_equal(np.asarray(n_ref), np.asarray(n_got))
            if col is None:
                assert f_ref is None and f_got is None
            else:
                np.testing.assert_array_equal(np.asarray(f_ref),
                                              np.asarray(f_got))
    finally:
        kp.knn_gather_pallas = orig
