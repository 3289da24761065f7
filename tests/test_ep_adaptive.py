"""Class-sharded (expert-parallel) adaptive-modes DOTA on the 8-CPU mesh.

The adaptive variant is class-row-local THROUGH its splits: the masked
streaming EM normalises responsibilities over modes only, and the
collect-ascending/execute-reversed split scatter never crosses class rows
(adapt/adaptive.py:94-194; reference dota_mixture_adaptive.py:173-260).
predict has no cross-class term in the engine protocol (source_priors is
None), so the only cross-class reduction under EP is the fusion weight's
mean(c) psum.  The split-check cadence rides the replicated fit_calls
scalar — every device takes the split branch on the same step.

This completes the family: all five adaptation methods (MODE-DOTA, plain
DOTA, GMM, adaptive, cache) class-shard under --dist-mode ep.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from uni_adapter_tpu import engine
from uni_adapter_tpu.adapt import adaptive
from uni_adapter_tpu.config import CacheConfig, Config, DotaConfig, ModelConfig
from uni_adapter_tpu.models.uni3d import Uni3D
from uni_adapter_tpu.parallel import ep

D, N, T = 32, 48, 6


@pytest.fixture(scope="module")
def setup():
    assert len(jax.devices()) >= 8, "conftest must provide virtual devices"
    model = Uni3D(trans_dim=48, embed_dim=D, num_group=8, group_size=8,
                  encoder_dim=24, depth=1, num_heads=4, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    pc0 = jnp.array(rng.standard_normal((1, N, 6)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), pc0)
    return model, params, rng


def _text(rng, K):
    text = rng.standard_normal((K, D)).astype(np.float32)
    return text / np.linalg.norm(text, axis=1, keepdims=True)


def _stream(rng, K, B=1, steps=T):
    pcs = rng.standard_normal((steps, B, N, 3)).astype(np.float32)
    return pcs, np.ones_like(pcs), \
        rng.integers(0, K, (steps, B)).astype(np.int32)


def _cfg(**kw):
    dc = DotaConfig(use_dota=False, use_mode_dota=False,
                    use_adaptive_dota=True, **kw)
    return Config(model=ModelConfig(compute_dtype="float32"), dota=dc,
                  cache=CacheConfig())


def _replicated(cfg, model, params, text, pcs, rgbs, targets, seed=42,
                initial_state=None):
    return engine.run_stream_scan(
        cfg, model, params, jnp.asarray(text), jnp.asarray(pcs),
        jnp.asarray(rgbs), jnp.asarray(targets), seed=seed,
        initial_state=initial_state)


def _assert_adaptive_close(got, want, rtol=1e-4, atol=1e-5):
    np.testing.assert_array_equal(np.asarray(got.mask),
                                  np.asarray(want.mask), err_msg="mask")
    for name in ("mu", "var", "pi", "c", "class_counts"):
        np.testing.assert_allclose(np.asarray(getattr(got, name)),
                                   np.asarray(getattr(want, name)),
                                   rtol=rtol, atol=atol, err_msg=name)
    assert int(got.t) == int(want.t)
    assert int(got.fit_calls) == int(want.fit_calls)


@pytest.mark.parametrize("K,B", [(16, 2), (10, 1)])
def test_ep_adaptive_matches_replicated(setup, K, B):
    """Divisible (16) and padded (10 → 16) label spaces: the class-sharded
    adaptive trajectory equals the replicated run (row-local masked EM on
    identical gathered prob_map slices)."""
    model, params, rng = setup
    rng = np.random.default_rng(1)
    text = _text(rng, K)
    pcs, rgbs, targets = _stream(rng, K, B=B)
    cfg = _cfg()

    want_state, want_outs = _replicated(cfg, model, params, text, pcs, rgbs,
                                        targets)
    got_state, summary = ep.run_stream_ep(cfg, model, params, text, pcs,
                                          rgbs, targets,
                                          mesh=ep.make_classes_mesh(8))
    assert summary["padded_classes"] == (16 - K if K == 10 else 0)
    _assert_adaptive_close(got_state.method_state, want_state.method_state)
    want_c = np.asarray(jnp.sum(want_outs.correct, axis=0))
    assert summary["acc1"] == pytest.approx(100.0 * want_c[0] / (T * B))


def test_ep_adaptive_splits_fire_and_match(setup):
    """The split scatter under shard_map: 60 steps at sigma 5e-4 (split
    threshold 5e-3, far below the ~1/D variance fitted components reach on
    unit-norm features — the test_variants recipe) force splits through
    the 50-fit check.  Mode counts must GROW past 1/class, pad rows must
    stay at their init single mode, and the post-split state must equal
    the replicated run's."""
    model, params, rng = setup
    rng = np.random.default_rng(2)
    K = 10  # pads to 16: frozen pad rows cross the split boundary too
    text = _text(rng, K)
    pcs, rgbs, targets = _stream(rng, K, steps=60)
    cfg = _cfg(sigma=5e-4)

    want_state, _ = _replicated(cfg, model, params, text, pcs, rgbs,
                                targets)
    got_state, summary = ep.run_stream_ep(cfg, model, params, text, pcs,
                                          rgbs, targets,
                                          mesh=ep.make_classes_mesh(8))
    n_want = np.asarray(adaptive.num_modes_per_class(want_state.method_state))
    n_got = np.asarray(adaptive.num_modes_per_class(got_state.method_state))
    assert n_want.sum() > K, "recipe failed to fire splits (replicated)"
    np.testing.assert_array_equal(n_got, n_want)
    _assert_adaptive_close(got_state.method_state, want_state.method_state,
                           rtol=1e-3, atol=1e-4)


def test_ep_adaptive_continual_resume(setup):
    """The full-K carry (with its mask/fit_calls bookkeeping) splices back
    and the chained trajectory equals the replicated chain."""
    model, params, rng = setup
    rng = np.random.default_rng(3)
    K = 10
    text = _text(rng, K)
    pcs, rgbs, targets = _stream(rng, K)
    cfg = _cfg()
    half = T // 2

    st1, _ = _replicated(cfg, model, params, text, pcs[:half], rgbs[:half],
                         targets[:half])
    st2, o2 = _replicated(cfg, model, params, text, pcs[half:], rgbs[half:],
                          targets[half:], initial_state=st1)

    mesh = ep.make_classes_mesh(8)
    est1, _ = ep.run_stream_ep(cfg, model, params, text, pcs[:half],
                               rgbs[:half], targets[:half], mesh=mesh)
    est2, s2 = ep.run_stream_ep(cfg, model, params, text, pcs[half:],
                                rgbs[half:], targets[half:], mesh=mesh,
                                initial_state=est1)
    assert int(est2.step) == T
    _assert_adaptive_close(est2.method_state, st2.method_state)
    want_c = np.asarray(jnp.sum(o2.correct, axis=0))
    assert s2["acc1"] == pytest.approx(100.0 * want_c[0] / (T - half))


def test_streams_ep_adaptive_dp_composition(setup):
    """DP × EP for adaptive-modes on a 2-D (data, classes) mesh: per-stream
    trajectories equal engine.run_streams_vmapped's (the masked scatter
    fires under vmap-inside-shard_map on the padded rows too)."""
    from jax.sharding import Mesh

    model, params, rng = setup
    rng = np.random.default_rng(4)
    K, C = 16, 4
    text = _text(rng, K)
    pcs = rng.standard_normal((C, T, 1, N, 3)).astype(np.float32)
    rgbs = np.ones_like(pcs)
    targets = rng.integers(0, K, (C, T, 1)).astype(np.int32)
    cfg = _cfg()

    want_states, want_outs = engine.run_streams_vmapped(
        cfg, model, params, jnp.asarray(text), jnp.asarray(pcs),
        jnp.asarray(rgbs), jnp.asarray(targets), seed=42)
    want = engine.summarize_vmapped(want_outs, T)

    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(2, 4),
                ("data", "classes"))
    states, summary = ep.run_streams_ep(cfg, model, params, text, pcs,
                                        rgbs, targets, mesh=mesh)
    assert summary["acc1_per_stream"] == pytest.approx(
        [w["acc1"] for w in want])
    np.testing.assert_array_equal(np.asarray(states.method_state.mask),
                                  np.asarray(want_states.method_state.mask))
    np.testing.assert_allclose(np.asarray(states.method_state.mu),
                               np.asarray(want_states.method_state.mu),
                               rtol=1e-4, atol=1e-5)
    assert np.asarray(states.method_state.mu).shape[:2] == (C, K)


def test_ep_adaptive_cli(tmp_path):
    """--dist-mode ep with --dota-use-adaptive-dota through the CLI."""
    import uni_adapter_tpu.cli.tta as tta_cli

    root = tmp_path / "data"
    root.mkdir()
    rng = np.random.default_rng(7)
    np.save(root / "data_uniform_5.npy",
            rng.standard_normal((6, 128, 3)).astype(np.float32))
    np.save(root / "label.npy", rng.integers(0, 40, (6,)).astype(np.int64))
    common = ["--device", "cpu", "--corruption", "uniform", "--npoints",
              "64", "--eva-depth", "1", "--pc-feat-dim", "64",
              "--num-group", "16", "--group-size", "8", "--pc-encoder-dim",
              "32", "--eva-heads", "4", "--compute-dtype", "float32",
              "--precomputed-text-features", "large", "--root", str(root),
              "--dota-use-adaptive-dota", "true", "--dota-use-mode-dota",
              "false"]
    base = tta_cli.main(common + ["--output-dir", str(tmp_path / "base")])
    got = tta_cli.main(common + ["--output-dir", str(tmp_path / "ep"),
                                 "--dist-mode", "ep"])
    assert got == base


def test_ep_adaptive_validation():
    from uni_adapter_tpu.config import parse_args

    cfg = parse_args(["--dist-mode", "ep", "--dota-use-adaptive-dota",
                      "true", "--dota-use-mode-dota", "false"])
    assert cfg.run.dist_mode == "ep"
    with pytest.raises(ValueError, match="nothing to split"):
        parse_args(["--dist-mode", "ep", "--dota-use-adaptive-dota",
                    "true", "--dota-use-mode-dota", "false",
                    "--ep-shard-encoder", "true"])


def test_ep_tp_adaptive_composition(setup):
    """EP × TP with adaptive-modes: the class-sharded step composes with a
    Megatron trunk via the encode_fn hook on a 2-D (classes, model) mesh,
    equal to the replicated run."""
    from jax.sharding import Mesh
    from uni_adapter_tpu.parallel.tp import make_tp_encode_fn

    model, params, rng = setup
    rng = np.random.default_rng(8)
    K = 10  # pads to 12 over the 4-device classes axis
    text = _text(rng, K)
    pcs, rgbs, targets = _stream(rng, K)
    cfg = _cfg()

    want_state, want_outs = _replicated(cfg, model, params, text, pcs, rgbs,
                                        targets)
    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(4, 2),
                ("classes", "model"))
    prepare, encode = make_tp_encode_fn(model, mesh, "uni3d", axis="model")
    got_state, summary = ep.run_stream_ep(
        cfg, model, prepare(params), text, pcs, rgbs, targets, mesh=mesh,
        classes_axis="classes", encode_fn=encode)
    assert summary["padded_classes"] == 2
    _assert_adaptive_close(got_state.method_state, want_state.method_state,
                           rtol=2e-4, atol=2e-5)
    want_c = np.asarray(jnp.sum(want_outs.correct, axis=0))
    assert summary["acc1"] == pytest.approx(100.0 * want_c[0] / T)
