"""Class-sharded (expert-parallel) prototype-cache path on the 8-CPU mesh.

Round-3 EP covered MODE-DOTA only; the cache is the OTHER method with
K-proportional cost — at LVIS scale its (K, C, K) probability state is
~160 MB/stream and the prototype-graph refinement builds a (K, K)
adjacency every step (adapt/cache.py docstring; reference semantics
Uni_Adapter.py:78-189).  parallel/ep.py class-shards both.  The
insert-or-merge is owner-masked with single-contributor psums (bitwise
the owner's values), and the refinement's per-row dots equal the
replicated rows — so the EP trajectory matches the replicated run to
float roundoff.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from uni_adapter_tpu import engine
from uni_adapter_tpu.config import CacheConfig, Config, DotaConfig, ModelConfig
from uni_adapter_tpu.models.uni3d import Uni3D
from uni_adapter_tpu.parallel import ep

D, N, T = 32, 48, 8


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


def _stream(rng, K):
    pcs = rng.standard_normal((T, 1, N, 3)).astype(np.float32)
    return pcs, np.ones_like(pcs), rng.integers(0, K, (T, 1)).astype(np.int32)


def _cfg(**cache_kw):
    return Config(model=ModelConfig(compute_dtype="float32"),
                  dota=DotaConfig(use_dota=False, use_mode_dota=False),
                  cache=CacheConfig(shot_capacity=3, threshold=0.3,
                                    lambda_reg=0.11, beta=150.0, **cache_kw))


def _replicated(cfg, model, params, text, pcs, rgbs, targets, seed=42,
                initial_state=None):
    return engine.run_stream_scan(
        cfg, model, params, jnp.asarray(text), jnp.asarray(pcs),
        jnp.asarray(rgbs), jnp.asarray(targets), seed=seed,
        initial_state=initial_state)


def _assert_cache_close(got, want, rtol=1e-5, atol=1e-6):
    np.testing.assert_array_equal(np.asarray(got.valid),
                                  np.asarray(want.valid))
    np.testing.assert_array_equal(np.asarray(got.counts),
                                  np.asarray(want.counts))
    for name in ("feats", "conf", "probs"):
        np.testing.assert_allclose(np.asarray(getattr(got, name)),
                                   np.asarray(getattr(want, name)),
                                   rtol=rtol, atol=atol, err_msg=name)


@pytest.mark.parametrize("K,mode", [(16, "dense"), (10, "dense"),
                                    (16, "prototype"), (10, "prototype")])
def test_ep_cache_matches_replicated(setup, K, mode):
    """Divisible (16) and padded (10 → 16) label spaces, both graph modes:
    the class-sharded cache trajectory equals the replicated run."""
    model, params, rng = setup
    rng = np.random.default_rng(1)
    text = _text(rng, K)
    pcs, rgbs, targets = _stream(rng, K)
    cfg = _cfg(graph_mode=mode)

    want_state, want_outs = _replicated(cfg, model, params, text, pcs, rgbs,
                                        targets)
    got_state, summary = ep.run_stream_ep(cfg, model, params, text, pcs,
                                          rgbs, targets,
                                          mesh=ep.make_classes_mesh(8))
    assert summary["padded_classes"] == (16 - K if K == 10 else 0)
    _assert_cache_close(got_state.method_state, want_state.method_state)
    assert np.asarray(got_state.method_state.probs).shape == (K, 3, K)
    want_c = np.asarray(jnp.sum(want_outs.correct, axis=0))
    assert summary["acc1"] == pytest.approx(100.0 * want_c[0] / T)
    np.testing.assert_allclose(
        np.asarray(got_state.method_state.feats),
        np.asarray(want_state.method_state.feats), rtol=1e-5, atol=1e-6)


def test_ep_cache_old_approximation(setup):
    """use_new_approximation=False (ShapeNet preset): the explicit-solve
    refinement gathers the full system and still matches."""
    model, params, rng = setup
    rng = np.random.default_rng(2)
    K = 16
    text = _text(rng, K)
    pcs, rgbs, targets = _stream(rng, K)
    cfg = _cfg(use_new_approximation=False)

    want_state, want_outs = _replicated(cfg, model, params, text, pcs, rgbs,
                                        targets)
    got_state, summary = ep.run_stream_ep(cfg, model, params, text, pcs,
                                          rgbs, targets,
                                          mesh=ep.make_classes_mesh(8))
    _assert_cache_close(got_state.method_state, want_state.method_state,
                        rtol=1e-4, atol=1e-5)
    want_c = np.asarray(jnp.sum(want_outs.correct, axis=0))
    assert summary["acc1"] == pytest.approx(100.0 * want_c[0] / T)


def test_ep_cache_k_smaller_than_mesh(setup):
    """K=2 over 8 devices: 6 pad-only devices must stay inert (their rows
    never receive a prediction; refinement masks their invalid nodes)."""
    model, params, rng = setup
    rng = np.random.default_rng(3)
    K = 2
    text = _text(rng, K)
    pcs, rgbs, targets = _stream(rng, K)
    cfg = _cfg()

    want_state, want_outs = _replicated(cfg, model, params, text, pcs, rgbs,
                                        targets)
    got_state, summary = ep.run_stream_ep(cfg, model, params, text, pcs,
                                          rgbs, targets,
                                          mesh=ep.make_classes_mesh(8))
    assert summary["padded_classes"] == 6
    _assert_cache_close(got_state.method_state, want_state.method_state)
    want_c = np.asarray(jnp.sum(want_outs.correct, axis=0))
    assert summary["acc1"] == pytest.approx(100.0 * want_c[0] / T)


def test_ep_cache_continual_resume(setup):
    """initial_state resumes the class-sharded cache: the full-K carry's
    probs leaf re-pads its trailing class axis on splice."""
    model, params, rng = setup
    rng = np.random.default_rng(4)
    K = 10  # padded — both axes of probs re-pad
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
    _assert_cache_close(est2.method_state, st2.method_state)
    want_c = np.asarray(jnp.sum(o2.correct, axis=0))
    assert s2["acc1"] == pytest.approx(100.0 * want_c[0] / (T - half))


def test_streams_ep_cache_dp_composition(setup):
    """DP × EP for the cache: stream trajectories equal the vmapped
    replicated runs, class-sharded state with full-K leaves returned."""
    from jax.sharding import Mesh

    model, params, rng = setup
    rng = np.random.default_rng(5)
    K, C = 16, 4
    text = _text(rng, K)
    pcs = rng.standard_normal((C, T, 1, N, 3)).astype(np.float32)
    rgbs = np.ones_like(pcs)
    targets = rng.integers(0, K, (C, T, 1)).astype(np.int32)
    cfg = _cfg()

    _, want_outs = engine.run_streams_vmapped(
        cfg, model, params, jnp.asarray(text), jnp.asarray(pcs),
        jnp.asarray(rgbs), jnp.asarray(targets), seed=42)
    want = engine.summarize_vmapped(want_outs, T)

    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(2, 4),
                ("data", "classes"))
    states, summary = ep.run_streams_ep(cfg, model, params, text, pcs,
                                        rgbs, targets, mesh=mesh)
    assert summary["acc1_per_stream"] == pytest.approx(
        [w["acc1"] for w in want])
    assert np.asarray(states.method_state.feats).shape[:2] == (C, K)
    assert np.asarray(states.method_state.probs).shape == (C, K, 3, K)


def test_ep_cache_cli(tmp_path):
    """--dist-mode ep with the cache method through the evaluation CLI."""
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
              "--dota-use-mode-dota", "false", "--cache-cg-max-iter", "20"]
    base = tta_cli.main(common + ["--output-dir", str(tmp_path / "base")])
    got = tta_cli.main(common + ["--output-dir", str(tmp_path / "ep"),
                                 "--dist-mode", "ep"])
    assert got == base


def test_ep_cache_validation():
    from uni_adapter_tpu.config import parse_args

    # cache + EP now parses (round-3 rejected it)
    cfg = parse_args(["--dist-mode", "ep", "--dota-use-mode-dota", "false"])
    assert cfg.run.dist_mode == "ep"
    # the whole family is EP-legal since round 4 (tests/test_ep_adaptive.py)
    cfg_ad = parse_args(["--dist-mode", "ep", "--dota-use-mode-dota",
                         "false", "--dota-use-adaptive-dota", "true"])
    assert cfg_ad.run.dist_mode == "ep"
    # and encoder sharding has no cache meaning
    with pytest.raises(ValueError, match="nothing to split"):
        parse_args(["--dist-mode", "ep", "--dota-use-mode-dota", "false",
                    "--ep-shard-encoder", "true"])
