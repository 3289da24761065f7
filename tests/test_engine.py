"""End-to-end engine tests on a tiny Uni3D: the scan path and the host-loop
path must produce identical trajectories, and all three adaptation methods
must run (SURVEY.md §4 layer 4 — the debug-slice smoke test, made exact)."""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from uni_adapter_tpu import engine
from uni_adapter_tpu.config import CacheConfig, Config, DotaConfig, ModelConfig
from uni_adapter_tpu.models.uni3d import Uni3D

K, D, N, T = 5, 32, 64, 6


@pytest.fixture(scope="module")
def setup():
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


def cfg_for(method: str) -> Config:
    if method == "dota":
        dc = DotaConfig(use_dota=True, use_mode_dota=False)
    elif method == "mode":
        dc = DotaConfig(use_dota=False, use_mode_dota=True, mode_M=2,
                        res_learning=True, residual_steps=2)
    elif method == "mode_nores":
        dc = DotaConfig(use_dota=False, use_mode_dota=True, mode_M=2,
                        res_learning=False)
    else:
        dc = DotaConfig(use_dota=False, use_mode_dota=False)
    return Config(model=ModelConfig(compute_dtype="float32"), dota=dc,
                  cache=CacheConfig(shot_capacity=3, cg_max_iter=20))


@pytest.mark.parametrize("method", ["dota", "mode", "mode_nores", "cache"])
def test_methods_run_and_match_scan(setup, method):
    model, params, text, pcs, rgbs, targets = setup
    cfg = cfg_for(method)

    # scan path
    state_f, outs = engine.run_stream_scan(
        cfg, model, params, text, jnp.array(pcs), jnp.array(rgbs),
        jnp.array(targets))
    assert outs.final_logits.shape == (T, 1, K)
    assert np.all(np.isfinite(np.asarray(outs.final_logits)))

    # host-loop path must match the scan trajectory exactly
    res = engine.run_stream(cfg, model, params, text,
                            list(zip(pcs, rgbs, targets)))
    summary = engine.summarize(outs, T)
    assert summary["acc1"] == pytest.approx(res["acc1"], abs=1e-6)
    assert summary["acc3"] == pytest.approx(res["acc3"], abs=1e-6)
    assert 0.0 <= summary["acc1"] <= 100.0


def test_fix_fusion_normalization_plumbs_through_engine(setup):
    """DotaConfig.fix_fusion_normalization reaches the fusion step: the
    corrected convex combination produces a different trajectory than the
    reference's double-normalisation (the default reproduces the bug —
    Uni_Adapter.py:512-513; the formula itself is unit-tested in
    tests/test_adapt.py)."""
    model, params, text, pcs, rgbs, targets = setup
    cfg = cfg_for("mode")
    cfg_fixed = dataclasses.replace(
        cfg, dota=dataclasses.replace(cfg.dota,
                                      fix_fusion_normalization=True))
    _, outs = engine.run_stream_scan(
        cfg, model, params, text, jnp.array(pcs), jnp.array(rgbs),
        jnp.array(targets))
    _, outs_fixed = engine.run_stream_scan(
        cfg_fixed, model, params, text, jnp.array(pcs), jnp.array(rgbs),
        jnp.array(targets))
    assert not np.allclose(np.asarray(outs.final_logits),
                           np.asarray(outs_fixed.final_logits))
    assert np.all(np.isfinite(np.asarray(outs_fixed.final_logits)))


def test_adaptation_state_evolves(setup):
    model, params, text, pcs, rgbs, targets = setup
    cfg = cfg_for("mode")
    state_f, _ = engine.run_stream_scan(
        cfg, model, params, text, jnp.array(pcs), jnp.array(rgbs),
        jnp.array(targets))
    ms = state_f.method_state
    assert int(state_f.step) == T
    # two fits per step (clean + noise-aug) ⇒ counts and t double
    assert float(jnp.sum(ms.class_counts)) == pytest.approx(2 * T, abs=1e-3)
    assert int(ms.t) == 2 * T
    # residuals were optimised (step>0 gate ⇒ T-1 rounds)
    assert not np.allclose(np.asarray(state_f.res_state.residuals), 0.0)


def test_dota_state_counts(setup):
    model, params, text, pcs, rgbs, targets = setup
    cfg = cfg_for("dota")
    state_f, _ = engine.run_stream_scan(
        cfg, model, params, text, jnp.array(pcs), jnp.array(rgbs),
        jnp.array(targets))
    # counts start at 1 and accumulate one unit of soft mass per sample
    assert float(jnp.sum(state_f.method_state.c)) == pytest.approx(K + T,
                                                                   rel=1e-4)


def test_cache_path_rejects_axis_name(setup):
    """The cache's insert-or-merge update has no collective form: a psum
    step fn would silently produce divergent per-device caches.  The
    precondition lives in make_step_fn itself, not only in the psum mesh
    wrapper."""
    model, *_ = setup
    with pytest.raises(ValueError, match="additive"):
        engine.make_step_fn(cfg_for("cache"), model, axis_name="dp")


def test_cache_path_rejects_batch_gt1(setup):
    """B>1 on the cache path would adapt on sample 0 only while scoring all
    B (the reference's protocol is strictly batch-1) — trace-time error."""
    model, params, text, pcs, rgbs, targets = setup
    step = engine.make_step_fn(cfg_for("cache"), model)
    state = engine.init_state(cfg_for("cache"), text, jax.random.PRNGKey(0))
    b2 = (jnp.array(np.concatenate([pcs[0], pcs[1]])),
          jnp.array(np.concatenate([rgbs[0], rgbs[1]])),
          jnp.array(np.concatenate([targets[0], targets[1]])))
    with pytest.raises(ValueError, match="batch_size=1"):
        step(params, text, state, b2)


def test_cache_fills(setup):
    model, params, text, pcs, rgbs, targets = setup
    cfg = cfg_for("cache")
    state_f, _ = engine.run_stream_scan(
        cfg, model, params, text, jnp.array(pcs), jnp.array(rgbs),
        jnp.array(targets))
    assert int(jnp.sum(state_f.method_state.valid)) >= 1


def test_state_is_checkpointable_pytree(setup):
    """Adaptation state must round-trip through flatten/unflatten — the
    checkpoint/resume capability the reference lacks (SURVEY.md §5.4)."""
    model, params, text, pcs, rgbs, targets = setup
    cfg = cfg_for("mode")
    state_f, _ = engine.run_stream_scan(
        cfg, model, params, text, jnp.array(pcs), jnp.array(rgbs),
        jnp.array(targets))
    leaves, treedef = jax.tree.flatten(state_f)
    rebuilt = jax.tree.unflatten(treedef, [np.asarray(l) for l in leaves])
    for a, b in zip(leaves, jax.tree.leaves(rebuilt)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_shared_scan_fn_compiles_once_across_corruptions(setup):
    """One jitted scan_fn reused across 'corruption' streams must hit jit's
    cache (VERDICT r1 weak #3 — the sequential driver recompiled per
    corruption); results must equal per-call jit."""
    model, params, text, pcs, rgbs, targets = setup
    cfg = cfg_for("mode")
    shared = jax.jit(engine.make_scan_fn(cfg, model))
    outs = []
    for seed in (1, 2, 3):   # three streams, same shapes
        _, o = engine.run_stream_scan(cfg, model, params, text,
                                      jnp.asarray(pcs), jnp.asarray(rgbs),
                                      jnp.asarray(targets), seed=seed,
                                      scan_fn=shared)
        outs.append(np.asarray(o.final_logits))
    assert shared._cache_size() == 1
    _, o_ref = engine.run_stream_scan(cfg, model, params, text,
                                      jnp.asarray(pcs), jnp.asarray(rgbs),
                                      jnp.asarray(targets), seed=1)
    np.testing.assert_allclose(outs[0], np.asarray(o_ref.final_logits),
                               rtol=1e-6, atol=1e-6)
