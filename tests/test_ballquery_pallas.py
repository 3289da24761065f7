"""Fused Pallas ball-query kernel vs the XLA oracle
(ops/geometry.query_ball_point).  Bitwise contract: identical indices in
every slot — the selection key is the integer lane index, so there are no
floating-point tie issues beyond the distance threshold itself (tested on
threshold-tie-free clouds).  Reference semantics:
models/openshape/pointnet_util.py:89-110.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from uni_adapter_tpu.ops.geometry import query_ball_point, sample_and_group
from uni_adapter_tpu.ops.ballquery_pallas import query_ball_pallas


def _uniform(b, n, seed=0):
    return np.random.default_rng(seed).uniform(
        -0.5, 0.5, (b, n, 3)).astype(np.float32)


@pytest.mark.parametrize("B,S,N,k,r", [
    (2, 16, 128, 8, 0.3),      # one tile
    (3, 40, 256, 8, 0.25),     # S off the sublane tile
    (2, 16, 200, 8, 0.3),      # N off the 128-lane tile
    (2, 16, 128, 8, 0.02),     # tiny radius → mostly-empty balls (clamped)
])
def test_ballquery_pallas_matches_xla(B, S, N, k, r):
    xyz = jnp.array(_uniform(B, N, seed=B * N))
    q = jnp.array(_uniform(B, S, seed=B * N + 1))
    ref = np.asarray(query_ball_point(r, k, xyz, q))
    got = np.asarray(query_ball_pallas(r, k, xyz, q, interpret=True))
    np.testing.assert_array_equal(ref, got)


def test_ballquery_pallas_overfull_ball():
    """More in-ball points than nsample: the first nsample by index."""
    xyz = jnp.array(_uniform(1, 64, seed=5)) * 0.05   # all points clustered
    q = jnp.zeros((1, 4, 3), jnp.float32)
    ref = np.asarray(query_ball_point(0.5, 8, xyz, q))
    got = np.asarray(query_ball_pallas(0.5, 8, xyz, q, interpret=True))
    np.testing.assert_array_equal(ref, got)


def test_sample_and_group_pallas_ballq_exact():
    """sample_and_group(use_pallas_ballq=True) is bitwise-identical."""
    import functools
    import uni_adapter_tpu.ops.ballquery_pallas as bq
    xyz = jnp.array(_uniform(2, 128, seed=9))
    feats = jnp.array(_uniform(2, 128, seed=10))
    orig = bq.query_ball_pallas
    bq.query_ball_pallas = functools.partial(orig, interpret=True)
    try:
        xyz_ref, pts_ref = sample_and_group(16, 0.3, 8, xyz, feats)
        xyz_got, pts_got = sample_and_group(16, 0.3, 8, xyz, feats,
                                            use_pallas_ballq=True)
    finally:
        bq.query_ball_pallas = orig
    np.testing.assert_array_equal(np.asarray(xyz_ref), np.asarray(xyz_got))
    np.testing.assert_array_equal(np.asarray(pts_ref), np.asarray(pts_got))
