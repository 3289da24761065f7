"""dVAE / DGCNN / folding decoder tests + PPTA cache types + part-seg loader."""
import os

import numpy as np
import h5py
import jax
import jax.numpy as jnp
import pytest

from uni_adapter_tpu.models import dvae


@pytest.fixture
def pts():
    rng = np.random.default_rng(0)
    return jnp.asarray(rng.standard_normal((2, 64, 3)), jnp.float32)


def test_graph_feature_shapes(pts):
    x = jnp.ones((2, 64, 8))
    g = dvae.graph_feature(pts, x, k=4)
    assert g.shape == (2, 64, 4, 16)
    # center channel passthrough: second half equals the center feature
    np.testing.assert_allclose(np.asarray(g[..., 8:]), 1.0)
    np.testing.assert_allclose(np.asarray(g[..., :8]), 0.0)  # nb − ctr = 0


def test_dgcnn_forward(pts):
    m = dvae.DGCNN(output_channel=32)
    f = jnp.ones((2, 64, 16))
    params = m.init(jax.random.PRNGKey(0), f, pts)
    out = m.apply(params, f, pts)
    assert out.shape == (2, 64, 32)
    assert np.all(np.isfinite(np.asarray(out)))


def test_folding_decoder(pts):
    m = dvae.FoldingDecoder(num_fine=32)
    fg = jnp.ones((2, 8, 48))
    params = m.init(jax.random.PRNGKey(0), fg)
    coarse, fine = m.apply(params, fg)
    assert coarse.shape == (2, 8, 8, 3)
    assert fine.shape == (2, 8, 32, 3)


def test_discrete_vae_end_to_end(pts):
    m = dvae.DiscreteVAE(num_group=8, group_size=8, encoder_dims=32,
                         tokens_dims=24, decoder_dims=32, num_tokens=16)
    rng = jax.random.PRNGKey(0)
    params = m.init(rng, pts, rng)
    ret = m.apply(params, pts, rng)
    whole_coarse, whole_fine, coarse, fine, neighborhood, logits = ret
    assert whole_fine.shape == (2, 8 * 8, 3)
    assert logits.shape == (2, 8, 16)
    rec, klv = dvae.dvae_loss(ret, neighborhood)
    assert np.isfinite(float(rec)) and np.isfinite(float(klv))
    assert float(rec) > 0


def test_chamfer_identity():
    a = jnp.asarray(np.random.default_rng(0).standard_normal((1, 16, 3)),
                    jnp.float32)
    assert float(dvae.chamfer_l1(a, a)) == pytest.approx(0.0, abs=1e-6)


def test_ppta_cache_types():
    from uni_adapter_tpu.models.ppta import PPTAPreset, Projected

    preset = PPTAPreset(dim=32, depth=1, heads=4, mlp_dim=64, sa_dim=24,
                        patches=16, prad=0.4, nsamp=8)
    rng = np.random.default_rng(0)
    xyz = jnp.asarray(rng.standard_normal((1, 64, 3)), jnp.float32)
    feats = jnp.concatenate([xyz, jnp.ones_like(xyz)], -1)

    local = Projected(preset=preset, out_channel=20, cache_type="local",
                      n_cluster=3, dtype=jnp.float32)
    p = local.init(jax.random.PRNGKey(0), xyz, feats)
    out = local.apply(p, xyz, feats)
    assert out.shape == (3, 20)

    hier = Projected(preset=preset, out_channel=20, cache_type="hierarchical",
                     n_cluster=3, dtype=jnp.float32)
    p = hier.init(jax.random.PRNGKey(0), xyz, feats)
    cls, centers = hier.apply(p, xyz, feats)
    assert cls.shape == (1, 20) and centers.shape == (3, 20)


def test_partseg_loader(tmp_path):
    from uni_adapter_tpu.data.datasets import ShapeNetPartSeg

    rng = np.random.default_rng(0)
    with h5py.File(os.path.join(tmp_path, "occlusion_4.h5"), "w") as f:
        f["data"] = rng.standard_normal((5, 128, 3)).astype(np.float32)
        f["label"] = rng.integers(0, 16, (5, 1)).astype(np.int64)
        f["pid"] = rng.integers(0, 50, (5, 128)).astype(np.int64)
    ds = ShapeNetPartSeg(str(tmp_path), "occlusion", npoints=64)
    assert len(ds) == 5
    pc, label, seg = ds[0]
    assert pc.shape == (64, 3) and seg.shape == (64,)
    assert ds.seg_num_all == 50
    # class_choice filtering
    ds2 = ShapeNetPartSeg(str(tmp_path), "occlusion", npoints=32,
                          class_choice="chair")
    assert ds2.seg_num_all == 4 and ds2.seg_start_index == 12
