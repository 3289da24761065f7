"""Class-sharded (expert-parallel) plain-DOTA path on the 8-CPU mesh.

Plain DOTA's (K, D, D) per-class covariance is the most memory-dominant
class-leading state of the adaptation family (4.8 GB at LVIS K=1156,
D=1024).  parallel/ep.py shards it by class rows; fit and the LDA predict
are row-local, and `update`'s shared precision Λ = inv((1-ε)·Σ̄+ε·I)
psums valid-row Σ sums (reference semantics dota.py:19-88).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from uni_adapter_tpu import engine
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


def _stream(rng, K, B=1):
    pcs = rng.standard_normal((T, B, N, 3)).astype(np.float32)
    return pcs, np.ones_like(pcs), rng.integers(0, K, (T, B)).astype(np.int32)


def _cfg(**kw):
    dc = DotaConfig(use_dota=True, use_mode_dota=False, **kw)
    return Config(model=ModelConfig(compute_dtype="float32"), dota=dc,
                  cache=CacheConfig())


def _replicated(cfg, model, params, text, pcs, rgbs, targets, seed=42,
                initial_state=None):
    return engine.run_stream_scan(
        cfg, model, params, jnp.asarray(text), jnp.asarray(pcs),
        jnp.asarray(rgbs), jnp.asarray(targets), seed=seed,
        initial_state=initial_state)


def _assert_dota_close(got, want, rtol=1e-4, atol=1e-5):
    for name in ("mu", "c", "sigma", "cum_soft_labels"):
        np.testing.assert_allclose(np.asarray(getattr(got, name)),
                                   np.asarray(getattr(want, name)),
                                   rtol=rtol, atol=atol, err_msg=name)
    # lam = inv((1-ε)Σ̄+εI) amplifies the Σ̄ psum's reduction reorder
    # through an ill-conditioned inverse (entries ~5e3 at σ=1e-4 init);
    # compare at the scale of that amplification
    np.testing.assert_allclose(np.asarray(got.lam), np.asarray(want.lam),
                               rtol=2e-3, atol=1.0, err_msg="lam")
    assert int(got.prior_step) == int(want.prior_step)


@pytest.mark.parametrize("K,B", [(16, 2), (10, 1)])
def test_ep_dota_matches_replicated(setup, K, B):
    """Divisible (16) and padded (10 → 16) label spaces: the class-sharded
    DOTA trajectory equals the replicated run (the only cross-class
    reductions — Σ̄ and mean(c) — reorder at float level)."""
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
    _assert_dota_close(got_state.method_state, want_state.method_state)
    assert np.asarray(got_state.method_state.cum_soft_labels).shape == (1, K)
    want_c = np.asarray(jnp.sum(want_outs.correct, axis=0))
    assert summary["acc1"] == pytest.approx(100.0 * want_c[0] / (T * B))


def test_ep_dota_prior_path(setup):
    """The cumulative-soft-label prior (dota.py:73-88 prior blend) under
    class sharding: the replicated cum prior must stay exact."""
    model, params, rng = setup
    rng = np.random.default_rng(2)
    K = 16
    text = _text(rng, K)
    pcs, rgbs, targets = _stream(rng, K)
    cfg = _cfg(prior_pre_steps=4)

    want_state, want_outs = _replicated(cfg, model, params, text, pcs, rgbs,
                                        targets)
    got_state, summary = ep.run_stream_ep(cfg, model, params, text, pcs,
                                          rgbs, targets,
                                          mesh=ep.make_classes_mesh(8))
    _assert_dota_close(got_state.method_state, want_state.method_state)
    want_c = np.asarray(jnp.sum(want_outs.correct, axis=0))
    assert summary["acc1"] == pytest.approx(100.0 * want_c[0] / T)


def test_ep_dota_continual_resume(setup):
    """The full-K carry splices back (cum prior re-pads its trailing class
    axis) and the chained trajectory equals the replicated chain."""
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
    _assert_dota_close(est2.method_state, st2.method_state)
    want_c = np.asarray(jnp.sum(o2.correct, axis=0))
    assert s2["acc1"] == pytest.approx(100.0 * want_c[0] / (T - half))


def test_streams_ep_dota_dp_composition(setup):
    """DP × EP for plain DOTA on a 2-D (data, classes) mesh."""
    from jax.sharding import Mesh

    model, params, rng = setup
    rng = np.random.default_rng(4)
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
    assert np.asarray(states.method_state.sigma).shape[:2] == (C, K)
    assert np.asarray(states.method_state.cum_soft_labels).shape == \
        (C, 1, K)


def test_ep_dota_cli(tmp_path):
    """--dist-mode ep with --dota-use-dota through the evaluation CLI."""
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
              "--dota-use-dota", "true", "--dota-use-mode-dota", "false"]
    base = tta_cli.main(common + ["--output-dir", str(tmp_path / "base")])
    got = tta_cli.main(common + ["--output-dir", str(tmp_path / "ep"),
                                 "--dist-mode", "ep"])
    assert got == base


def test_ep_dota_validation():
    from uni_adapter_tpu.config import parse_args

    cfg = parse_args(["--dist-mode", "ep", "--dota-use-dota", "true",
                      "--dota-use-mode-dota", "false"])
    assert cfg.run.dist_mode == "ep"
    with pytest.raises(ValueError, match="nothing to split"):
        parse_args(["--dist-mode", "ep", "--dota-use-dota", "true",
                    "--dota-use-mode-dota", "false",
                    "--ep-shard-encoder", "true"])
    with pytest.raises(ValueError, match="sharded/psum"):
        parse_args(["--dist-mode", "ep", "--dota-use-mode-dota", "false",
                    "--dota-use-gmm-dota", "true"])