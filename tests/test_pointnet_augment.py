"""PointNet++ MSG/FP modules and augmentation helpers."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from uni_adapter_tpu.data import augment
from uni_adapter_tpu.ops.pointnet import (PointNetFeaturePropagation,
                                          PointNetSetAbstractionMsg)


@pytest.fixture
def pts():
    rng = np.random.default_rng(0)
    return jnp.asarray(rng.standard_normal((2, 64, 3)), jnp.float32)


def test_msg_abstraction(pts):
    m = PointNetSetAbstractionMsg(
        npoint=16, radius_list=[0.2, 0.4], nsample_list=[8, 16],
        mlp_list=[[16, 24], [16, 32]])
    feats = jnp.ones((2, 64, 5))
    params = m.init(jax.random.PRNGKey(0), pts, feats)
    new_xyz, new_feats = m.apply(params, pts, feats)
    assert new_xyz.shape == (2, 16, 3)
    assert new_feats.shape == (2, 16, 24 + 32)   # concat over scales
    assert np.all(np.isfinite(np.asarray(new_feats)))


def test_feature_propagation(pts):
    coarse_xyz = pts[:, :16]
    coarse_feats = jnp.ones((2, 16, 12))
    m = PointNetFeaturePropagation(mlp=[20, 24])
    params = m.init(jax.random.PRNGKey(0), pts, coarse_xyz, None, coarse_feats)
    out = m.apply(params, pts, coarse_xyz, None, coarse_feats)
    assert out.shape == (2, 64, 24)
    # skip-connection path
    skip = jnp.ones((2, 64, 6))
    params = m.init(jax.random.PRNGKey(0), pts, coarse_xyz, skip, coarse_feats)
    out = m.apply(params, pts, coarse_xyz, skip, coarse_feats)
    assert out.shape == (2, 64, 24)


def test_fp_single_source(pts):
    m = PointNetFeaturePropagation(mlp=[8])
    one = jnp.ones((2, 1, 4))
    params = m.init(jax.random.PRNGKey(0), pts, pts[:, :1], None, one)
    out = m.apply(params, pts, pts[:, :1], None, one)
    assert out.shape == (2, 64, 8)


def test_separate_point_cloud(pts):
    kept, cropped = augment.separate_point_cloud(jax.random.PRNGKey(0), pts,
                                                 num_crop=16)
    assert kept.shape == (2, 48, 3) and cropped.shape == (2, 16, 3)
    # kept ∪ cropped = original points (as sets per batch)
    for b in range(2):
        all_pts = np.concatenate([np.asarray(kept[b]), np.asarray(cropped[b])])
        orig = np.asarray(pts[b])
        assert set(map(tuple, all_pts.round(5))) == set(map(tuple,
                                                            orig.round(5)))
    # cropped points cluster nearer the random direction than kept mean
    _, cropped2 = augment.separate_point_cloud(
        jax.random.PRNGKey(0), pts, 16,
        fixed_center=jnp.array([1.0, 0.0, 0.0]))
    assert np.asarray(cropped2)[0, :, 0].mean() > np.asarray(pts)[0, :, 0].mean()


def test_augmentations_shapes(pts):
    k = jax.random.PRNGKey(0)
    assert augment.jitter_points(k, pts).shape == pts.shape
    assert float(jnp.abs(augment.jitter_points(k, pts) - pts).max()) <= 0.05
    s = augment.random_scale(k, pts)
    ratio = np.asarray(s[0] / pts[0])
    assert np.allclose(ratio, ratio[0, 0])       # uniform per cloud
    r = augment.random_rotate_z(k, pts)
    # rotation preserves z and norms
    np.testing.assert_allclose(np.asarray(r[..., 2]), np.asarray(pts[..., 2]),
                               atol=1e-5)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(r), axis=-1),
                               np.linalg.norm(np.asarray(pts), axis=-1),
                               atol=1e-4)
    n = augment.normalize_cloud(pts)
    assert float(jnp.linalg.norm(n, axis=-1).max()) <= 1.0 + 1e-5


def test_worker_seed_distinct():
    a = augment.worker_seed(42, 0)
    b = augment.worker_seed(42, 1)
    assert not np.array_equal(np.asarray(a), np.asarray(b))
