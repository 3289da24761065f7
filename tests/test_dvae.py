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
    rec, klv = dvae.dvae_loss(ret)
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


# ---------------------------------------------------------------------------
# Training loop (beyond-parity: the reference ships inference only)

def test_dvae_train_step_decreases_loss():
    import optax  # noqa: F401  (env guard)
    from uni_adapter_tpu.models.dvae_train import (
        DVAESchedule, dvae_train_step, init_train_state, make_optimizer)

    model = dvae.DiscreteVAE(num_group=8, group_size=8, encoder_dims=16,
                        tokens_dims=16, decoder_dims=16, num_tokens=32)
    rng = jax.random.PRNGKey(0)
    pts = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 3), jnp.float32)
    tx = make_optimizer(lr=3e-3, total_steps=100, warmup_steps=1)
    sched = DVAESchedule(temp_anneal_steps=50, kl_warmup_steps=10)
    state = init_train_state(model, rng, pts, tx)

    losses = []
    for _ in range(24):
        state, metrics = dvae_train_step(model, tx, sched, state, pts, rng)
        assert np.isfinite(float(metrics["loss"]))
        losses.append(float(metrics["loss"]))
    assert int(state.step) == 24
    # per-step Gumbel noise makes single losses stochastic: compare windows
    assert np.mean(losses[-4:]) < np.mean(losses[:4])


def test_dvae_schedule_endpoints():
    from uni_adapter_tpu.models.dvae_train import DVAESchedule, schedule_at

    sched = DVAESchedule(temp_start=1.0, temp_end=0.0625,
                         temp_anneal_steps=100, kl_weight=0.1,
                         kl_warmup_steps=10)
    t0, k0 = schedule_at(sched, jnp.int32(0))
    t1, k1 = schedule_at(sched, jnp.int32(100))
    t2, k2 = schedule_at(sched, jnp.int32(10_000))  # past the anneal: clamped
    assert np.isclose(float(t0), 1.0) and np.isclose(float(k0), 0.0)
    assert np.isclose(float(t1), 0.0625, rtol=1e-5)
    assert np.isclose(float(t2), 0.0625, rtol=1e-5)
    assert np.isclose(float(k1), 0.1) and np.isclose(float(k2), 0.1)


def test_dvae_train_epoch_scan_matches_loop():
    from uni_adapter_tpu.models.dvae_train import (
        DVAESchedule, dvae_train_step, init_train_state, make_optimizer,
        train_epoch)

    model = dvae.DiscreteVAE(num_group=4, group_size=8, encoder_dims=8,
                        tokens_dims=8, decoder_dims=8, num_tokens=16)
    rng = jax.random.PRNGKey(2)
    batches = jax.random.normal(jax.random.PRNGKey(3), (3, 2, 32, 3),
                                jnp.float32)
    tx = make_optimizer(lr=1e-3, total_steps=10, warmup_steps=1)
    sched = DVAESchedule(temp_anneal_steps=5, kl_warmup_steps=2)
    s_loop = init_train_state(model, rng, batches[0], tx)
    s_scan = init_train_state(model, rng, batches[0], tx)

    losses = []
    for i in range(batches.shape[0]):
        s_loop, m = dvae_train_step(model, tx, sched, s_loop, batches[i], rng)
        losses.append(float(m["loss"]))
    s_scan, metrics = train_epoch(model, tx, sched, s_scan, batches, rng)

    np.testing.assert_allclose(np.asarray(metrics["loss"]),
                               np.asarray(losses), rtol=1e-5)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                rtol=1e-5, atol=1e-6),
        s_loop.params, s_scan.params)


def test_dvae_train_step_data_parallel_matches_single():
    """The dVAE train step under a batch-sharded jit on the 8-device mesh
    produces the same parameters as the single-device step (DP composes
    from the outside — models/dvae_train.py design note)."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from uni_adapter_tpu.models.dvae_train import (
        DVAESchedule, dvae_train_step, init_train_state, make_optimizer)

    model = dvae.DiscreteVAE(num_group=4, group_size=8, encoder_dims=8,
                             tokens_dims=8, decoder_dims=8, num_tokens=16)
    rng = jax.random.PRNGKey(4)
    batch = jax.random.normal(jax.random.PRNGKey(5), (8, 32, 3), jnp.float32)
    tx = make_optimizer(lr=1e-3, total_steps=10, warmup_steps=1)
    sched = DVAESchedule(temp_anneal_steps=5, kl_warmup_steps=2)
    state = init_train_state(model, rng, batch, tx)

    s_single, m_single = dvae_train_step(model, tx, sched, state, batch, rng)

    mesh = Mesh(np.array(jax.devices()[:8]), ("dp",))
    sharded = jax.device_put(batch, NamedSharding(mesh, P("dp")))
    s_dp, m_dp = dvae_train_step(model, tx, sched, state, sharded, rng)

    np.testing.assert_allclose(float(m_single["loss"]), float(m_dp["loss"]),
                               rtol=1e-5)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                rtol=1e-4, atol=1e-6),
        s_single.params, s_dp.params)
