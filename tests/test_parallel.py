"""Multi-device tests on the virtual 8-CPU mesh (SURVEY.md §4 layer 5).

'sharded' mode must equal independent per-shard single-device runs;
'psum' mode must equal a single-device run over the concatenated global
batch (the sufficient statistics are additive ⇒ exact merging)."""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from uni_adapter_tpu import engine
from uni_adapter_tpu.config import CacheConfig, Config, DotaConfig, ModelConfig
from uni_adapter_tpu.models.uni3d import Uni3D
from uni_adapter_tpu.parallel import mesh as pmesh

K, D, N, T = 5, 32, 48, 8


@pytest.fixture(scope="module")
def setup():
    assert len(jax.devices()) >= 4, "conftest must provide virtual devices"
    model = Uni3D(trans_dim=48, embed_dim=D, num_group=8, group_size=8,
                  encoder_dim=24, depth=1, num_heads=4, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    pc0 = jnp.array(rng.standard_normal((1, N, 6)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), pc0)
    text = rng.standard_normal((K, D)).astype(np.float32)
    text /= np.linalg.norm(text, axis=1, keepdims=True)
    pcs = rng.standard_normal((T, 1, N, 3)).astype(np.float32)
    rgbs = np.ones_like(pcs)
    targets = rng.integers(0, K, (T, 1)).astype(np.int32)
    return model, params, jnp.array(text), pcs, rgbs, targets


def _cfg(method="dota", **dota_kw):
    if method == "dota":
        dc = DotaConfig(use_dota=True, use_mode_dota=False, **dota_kw)
    elif method == "mode":
        dc = DotaConfig(use_dota=False, use_mode_dota=True, mode_M=2,
                        res_learning=False, **dota_kw)
    elif method == "gmm":
        dc = DotaConfig(use_dota=False, use_mode_dota=False,
                        use_gmm_dota=True, mode_M=2, **dota_kw)
    else:
        dc = DotaConfig(use_dota=False, use_mode_dota=False,
                        use_adaptive_dota=True, **dota_kw)
    return Config(model=ModelConfig(compute_dtype="float32"), dota=dc,
                  cache=CacheConfig(shot_capacity=3, cg_max_iter=10))


def test_mesh_creation():
    m = pmesh.make_mesh(4)
    assert m.devices.size == 4 and m.axis_names == ("data",)
    assert pmesh.is_primary()


def test_sharded_matches_independent_runs(setup):
    model, params, text, pcs, rgbs, targets = setup
    cfg = _cfg("dota")
    n = 4
    mesh = pmesh.make_mesh(n)
    states, summary = pmesh.run_stream_sharded(
        cfg, model, params, text, pcs, rgbs, targets, mesh=mesh, seed=42)

    # oracle: run each contiguous shard independently on one device
    per = T // n
    total_correct = np.zeros(3)
    for s in range(n):
        sl = slice(s * per, (s + 1) * per)
        _, outs = engine.run_stream_scan(
            cfg, model, params, text, jnp.array(pcs[sl]), jnp.array(rgbs[sl]),
            jnp.array(targets[sl]), seed=42 + s)
        total_correct += np.asarray(jnp.sum(outs.correct, axis=0))
    want_acc1 = 100.0 * total_correct[0] / T
    assert summary["acc1"] == pytest.approx(want_acc1, abs=1e-5)
    assert summary["n_samples"] == T
    # per-shard states stacked on axis 0
    assert np.asarray(states.method_state.mu).shape[0] == n


@pytest.mark.parametrize("method", ["dota", "mode", "gmm", "adaptive"])
def test_psum_matches_global_batch(setup, method):
    model, params, text, pcs, rgbs, targets = setup
    # noise off so the only difference between the two runs is the sharding
    cfg = _cfg(method, noise_std=0.0)
    n = 2
    mesh = pmesh.make_mesh(n)
    state_p, summary = pmesh.run_stream_psum(
        cfg, model, params, text, pcs, rgbs, targets, mesh=mesh, seed=42)

    # oracle: single device, n·B samples per step
    pcs_g = pcs.reshape(T // n, n, N, 3)
    rgbs_g = rgbs.reshape(T // n, n, N, 3)
    targets_g = targets.reshape(T // n, n)
    state_1, outs = engine.run_stream_scan(
        cfg, model, params, text, jnp.array(pcs_g), jnp.array(rgbs_g),
        jnp.array(targets_g), seed=42)

    counts_attr = "C" if method == "gmm" else "c"   # GMMDotaState names it C
    if method == "dota":
        np.testing.assert_allclose(np.asarray(state_p.method_state.mu),
                                   np.asarray(state_1.method_state.mu),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(state_p.method_state.c),
                                   np.asarray(state_1.method_state.c),
                                   rtol=1e-5)
    else:
        np.testing.assert_allclose(np.asarray(state_p.method_state.mu),
                                   np.asarray(state_1.method_state.mu),
                                   rtol=1e-3, atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(getattr(state_p.method_state, counts_attr)),
            np.asarray(getattr(state_1.method_state, counts_attr)),
            rtol=1e-4, atol=1e-5)
    want = engine.summarize(outs, T)
    assert summary["acc1"] == pytest.approx(want["acc1"], abs=1e-5)


def test_psum_adaptive_splits_match_global_batch(setup):
    """Component splits fire identically under psum and match the
    single-device global-batch oracle slot for slot: the fit psums the
    sufficient statistics, so every device holds the SAME state when the
    50-fit split check fires, and the split decisions (ascending-index
    selection, reverse-execution placement) are deterministic functions of
    that state.  120 batch-1 samples over 2 devices = 60 fit calls —
    crossing the split-check boundary with a low threshold (sigma 5e-4 →
    threshold 5e-3, far under the ~1/D fitted variance)."""
    from uni_adapter_tpu.adapt import adaptive

    model, params, text, _, _, _ = setup
    cfg = _cfg("adaptive", noise_std=0.0, sigma=5e-4)
    n, steps = 2, 60
    rng = np.random.default_rng(3)
    pcs = rng.standard_normal((steps * n, 1, N, 3)).astype(np.float32)
    rgbs = np.ones_like(pcs)
    targets = rng.integers(0, K, (steps * n, 1)).astype(np.int32)

    mesh = pmesh.make_mesh(n)
    state_p, summary = pmesh.run_stream_psum(
        cfg, model, params, text, pcs, rgbs, targets, mesh=mesh, seed=42)

    state_1, outs = engine.run_stream_scan(
        cfg, model, params, text,
        jnp.array(pcs.reshape(steps, n, N, 3)),
        jnp.array(rgbs.reshape(steps, n, N, 3)),
        jnp.array(targets.reshape(steps, n)), seed=42)

    n_p = np.asarray(adaptive.num_modes_per_class(state_p.method_state))
    n_1 = np.asarray(adaptive.num_modes_per_class(state_1.method_state))
    assert n_p.sum() > K, "stream never triggered a split"
    assert list(n_p) == list(n_1)
    mask = np.asarray(state_1.method_state.mask)
    np.testing.assert_array_equal(np.asarray(state_p.method_state.mask),
                                  mask)
    sel = np.broadcast_to(mask[..., None],
                          state_1.method_state.mu.shape)
    for name in ("mu", "var"):
        a = np.asarray(getattr(state_p.method_state, name))
        b = np.asarray(getattr(state_1.method_state, name))
        np.testing.assert_allclose(a[sel], b[sel], rtol=1e-3, atol=1e-5,
                                   err_msg=name)
    np.testing.assert_allclose(np.asarray(state_p.method_state.c),
                               np.asarray(state_1.method_state.c),
                               rtol=1e-4, atol=1e-5)
    assert summary["acc1"] == pytest.approx(
        engine.summarize(outs, steps * n)["acc1"], abs=1e-5)


def test_psum_rejects_cache_method(setup):
    model, params, text, pcs, rgbs, targets = setup
    cfg = Config(model=ModelConfig(compute_dtype="float32"),
                 dota=DotaConfig(use_dota=False, use_mode_dota=False),
                 cache=CacheConfig(shot_capacity=2, cg_max_iter=5))
    with pytest.raises(ValueError, match="additive"):
        pmesh.run_stream_psum(cfg, model, params, text, pcs, rgbs, targets,
                              mesh=pmesh.make_mesh(2))


def test_streams_sharded_matches_vmapped(setup):
    """shard_map(vmap(scan)) over streams == single-device vmapped run."""
    model, params, text, pcs, rgbs, targets = setup
    cfg = _cfg("mode", noise_std=0.0)
    C = 4
    rng = np.random.default_rng(1)
    pcs_c = rng.standard_normal((C, 4, 1, N, 3)).astype(np.float32)
    rgbs_c = np.ones_like(pcs_c)
    tg_c = rng.integers(0, K, (C, 4, 1)).astype(np.int32)

    states_s, summary_s = pmesh.run_streams_sharded(
        cfg, model, params, text, pcs_c, rgbs_c, tg_c,
        mesh=pmesh.make_mesh(2), seed=42)
    states_v, outs_v = engine.run_streams_vmapped(
        cfg, model, params, text, jnp.asarray(pcs_c), jnp.asarray(rgbs_c),
        jnp.asarray(tg_c), seed=42)
    summaries_v = engine.summarize_vmapped(outs_v, 4)

    np.testing.assert_allclose(np.asarray(states_s.method_state.mu),
                               np.asarray(states_v.method_state.mu),
                               rtol=1e-4, atol=1e-5)
    for c in range(C):
        assert summary_s["acc1_per_stream"][c] == pytest.approx(
            summaries_v[c]["acc1"], abs=1e-5)


def test_streams_sharded_rejects_ragged(setup):
    model, params, text, pcs, rgbs, targets = setup
    cfg = _cfg("mode")
    bad = np.zeros((3, 2, 1, N, 3), np.float32)   # 3 streams over 2 devices
    with pytest.raises(ValueError, match="divide"):
        pmesh.run_streams_sharded(cfg, model, params, text, bad,
                                  np.ones_like(bad),
                                  np.zeros((3, 2, 1), np.int32),
                                  mesh=pmesh.make_mesh(2))
