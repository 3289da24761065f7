"""run_streams_vmapped must reproduce per-stream sequential trajectories
exactly (same seeds ⇒ same noise ⇒ same states and logits)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from uni_adapter_tpu import engine
from uni_adapter_tpu.config import CacheConfig, Config, DotaConfig, ModelConfig
from uni_adapter_tpu.models.uni3d import Uni3D

C, K, D, N, T = 3, 4, 24, 48, 4


@pytest.fixture(scope="module")
def setup():
    model = Uni3D(trans_dim=32, embed_dim=D, num_group=8, group_size=8,
                  encoder_dim=16, depth=1, num_heads=4, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    pc0 = jnp.asarray(rng.standard_normal((1, N, 6)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), pc0)
    text = rng.standard_normal((K, D)).astype(np.float32)
    text /= np.linalg.norm(text, axis=1, keepdims=True)
    pcs = rng.standard_normal((C, T, 1, N, 3)).astype(np.float32)
    targets = rng.integers(0, K, (C, T, 1)).astype(np.int32)
    return model, params, jnp.asarray(text), pcs, np.ones_like(pcs), targets


@pytest.mark.parametrize("method", ["mode", "dota"])
def test_vmapped_equals_sequential(setup, method):
    model, params, text, pcs, rgbs, targets = setup
    dc = (DotaConfig(use_mode_dota=True, mode_M=2, res_learning=True,
                     residual_steps=2)
          if method == "mode" else
          DotaConfig(use_dota=True, use_mode_dota=False))
    cfg = Config(model=ModelConfig(compute_dtype="float32"), dota=dc,
                 cache=CacheConfig(cg_max_iter=5))

    states_v, outs_v = engine.run_streams_vmapped(
        cfg, model, params, text, pcs, rgbs, targets, seed=42)
    # outs_v: (T, C, ...)
    summaries_v = engine.summarize_vmapped(outs_v, T)

    for c in range(C):
        _, outs_c = engine.run_stream_scan(
            cfg, model, params, text, jnp.asarray(pcs[c]),
            jnp.asarray(rgbs[c]), jnp.asarray(targets[c]), seed=42 + c)
        np.testing.assert_allclose(
            np.asarray(outs_v.final_logits[:, c]),
            np.asarray(outs_c.final_logits), rtol=1e-4, atol=1e-4)
        want = engine.summarize(outs_c, T)
        assert summaries_v[c]["acc1"] == pytest.approx(want["acc1"], abs=1e-6)


@pytest.mark.parametrize("method", ["gmm", "adaptive"])
def test_vmapped_equals_sequential_variants(setup, method):
    """Variant estimators under vmap: under a batched carry, lax.cond
    lowers to select and BOTH branches run, so adaptive's check_and_split
    scatter executes every step — it must be an exact identity on
    ineligible states for vmapped streams to reproduce the sequential
    trajectories."""
    model, params, text, pcs, rgbs, targets = setup
    dc = (DotaConfig(use_dota=False, use_mode_dota=False, use_gmm_dota=True,
                     mode_M=2)
          if method == "gmm" else
          DotaConfig(use_dota=False, use_mode_dota=False,
                     use_adaptive_dota=True))
    cfg = Config(model=ModelConfig(compute_dtype="float32"), dota=dc,
                 cache=CacheConfig(cg_max_iter=5))

    states_v, outs_v = engine.run_streams_vmapped(
        cfg, model, params, text, pcs, rgbs, targets, seed=42)
    for c in range(C):
        _, outs_c = engine.run_stream_scan(
            cfg, model, params, text, jnp.asarray(pcs[c]),
            jnp.asarray(rgbs[c]), jnp.asarray(targets[c]), seed=42 + c)
        np.testing.assert_allclose(
            np.asarray(outs_v.final_logits[:, c]),
            np.asarray(outs_c.final_logits), rtol=1e-4, atol=1e-4)


def test_vmapped_adaptive_splits_equal_sequential(setup):
    """Adaptive splits FIRING inside the vmapped scan (60 fits cross the
    50-fit check with a low threshold) must reproduce each stream's
    sequential trajectory and final mode structure exactly — the regime
    the serving layer's vmapped step hits with long-lived clients."""
    from uni_adapter_tpu.adapt import adaptive

    model, params, text, _, _, _ = setup
    dc = DotaConfig(use_dota=False, use_mode_dota=False,
                    use_adaptive_dota=True, sigma=5e-4, noise_std=0.0)
    cfg = Config(model=ModelConfig(compute_dtype="float32"), dota=dc,
                 cache=CacheConfig(cg_max_iter=5))
    steps, streams = 60, 2
    rng = np.random.default_rng(9)
    pcs = rng.standard_normal((streams, steps, 1, N, 3)).astype(np.float32)
    rgbs = np.ones_like(pcs)
    targets = rng.integers(0, K, (streams, steps, 1)).astype(np.int32)

    states_v, outs_v = engine.run_streams_vmapped(
        cfg, model, params, text, pcs, rgbs, targets, seed=7)
    any_split = False
    for c in range(streams):
        state_c, outs_c = engine.run_stream_scan(
            cfg, model, params, text, jnp.asarray(pcs[c]),
            jnp.asarray(rgbs[c]), jnp.asarray(targets[c]), seed=7 + c)
        # tolerance calibration: with sigma 5e-4 the regularised variances
        # sit near the ~1.5e-3 floor, so the Mahalanobis term amplifies
        # vmap-vs-sequential fp32 fusion-order noise ~700× (same analysis
        # as the import-oracle adaptive test); a split-placement divergence
        # would show at ~0.3, two orders above this band
        np.testing.assert_allclose(
            np.asarray(outs_v.final_logits[:, c]),
            np.asarray(outs_c.final_logits), rtol=5e-3, atol=5e-3)
        np.testing.assert_array_equal(
            np.asarray(outs_v.final_logits[:, c]).argmax(-1),
            np.asarray(outs_c.final_logits).argmax(-1))
        ms_v = jax.tree.map(lambda x, c=c: x[c], states_v.method_state)
        np.testing.assert_array_equal(np.asarray(ms_v.mask),
                                      np.asarray(state_c.method_state.mask))
        n_c = np.asarray(adaptive.num_modes_per_class(state_c.method_state))
        any_split = any_split or n_c.sum() > K
    assert any_split, "no stream triggered a split"
