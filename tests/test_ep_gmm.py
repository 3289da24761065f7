"""Class-sharded (expert-parallel) GMM-DOTA path on the 8-CPU mesh.

GMM-DOTA's (K, M, D) mixture state shards by class rows exactly like
MODE-DOTA's (parallel/ep.py _make_gmm_step): the streaming-EM fit
normalises responsibilities over modes only, predict's discriminant is a
class-column block, and only the blended empirical prior's normaliser and
the fusion weight psum valid-row sums (reference semantics
gmm_dota_adaptation_model.py:128-256).

The init is the subtle part: the QR mean-perturbation draw is
(K, D, M)-shaped and the soft-count init is 1/(K·M) — both depend on the
REAL K, so run_stream_ep splices an unpadded init over the real rows and
run_streams_ep redoes the real-K draw inside shard_map
(_init_local_state's GMM branch).  These tests pin both paths to the
replicated engine.
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
    dc = DotaConfig(use_dota=False, use_mode_dota=False, use_gmm_dota=True,
                    mode_M=2, **kw)
    return Config(model=ModelConfig(compute_dtype="float32"), dota=dc,
                  cache=CacheConfig())


def _replicated(cfg, model, params, text, pcs, rgbs, targets, seed=42,
                initial_state=None):
    return engine.run_stream_scan(
        cfg, model, params, jnp.asarray(text), jnp.asarray(pcs),
        jnp.asarray(rgbs), jnp.asarray(targets), seed=seed,
        initial_state=initial_state)


def _assert_gmm_close(got, want, rtol=1e-5, atol=1e-6):
    for name in ("mu", "sigma", "sigma_reg", "pi", "C", "class_counts"):
        np.testing.assert_allclose(np.asarray(getattr(got, name)),
                                   np.asarray(getattr(want, name)),
                                   rtol=rtol, atol=atol, err_msg=name)
    assert int(got.total_samples) == int(want.total_samples)


@pytest.mark.parametrize("K,B", [(16, 2), (10, 1)])
def test_ep_gmm_matches_replicated(setup, K, B):
    """Divisible (16) and padded (10 → 16) label spaces: the class-sharded
    GMM trajectory equals the replicated run (fit is class-row-local on
    identical gathered prob_map slices; the only cross-class reductions —
    the prior normaliser and mean(c) — reorder at float level)."""
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
    _assert_gmm_close(got_state.method_state, want_state.method_state)
    # the QR init splice: real-row means are BITWISE the replicated init's
    # values plus identical updates — sanity-pin the stripped shape
    assert np.asarray(got_state.method_state.mu).shape == (K, 2, D)
    want_c = np.asarray(jnp.sum(want_outs.correct, axis=0))
    assert summary["acc1"] == pytest.approx(100.0 * want_c[0] / (T * B))
    assert summary["acc5"] == pytest.approx(100.0 * want_c[2] / (T * B))


def test_ep_gmm_local_init_matches_full(setup):
    """_init_local_state's GMM branch (the run_streams_ep init) reproduces
    engine.init_state's full-K values on the real rows to ulp roundoff:
    the (K, D, M) QR draw redone inside shard_map and sliced per device,
    C = 1/(K·M) at the REAL K.  A padded-shape or local-shape redraw
    would differ on every row at O(perturbation_scale) — the regression
    this guards.  (Not bitwise: shard_map compiles a different program,
    so XLA contracts base + 0.01·ortho with different fma fusion.)"""
    from jax.sharding import PartitionSpec as P

    rng = np.random.default_rng(2)
    K, n = 10, 8  # pads to 16: the case where a padded draw diverges
    text = _text(rng, K)
    text_pad, k_pad = ep.pad_classes(text, n)
    cfg = _cfg()
    key = jax.random.PRNGKey(5)
    mesh = ep.make_classes_mesh(n)

    def body(text_local):
        st = ep._init_local_state(cfg, text_local, key, k_pad,
                                  axis="classes", num_classes=K)
        return st.method_state

    template = jax.eval_shape(
        lambda: ep._init_local_state(
            cfg, jnp.zeros((k_pad // n, D), jnp.float32), key,
            k_pad).method_state)
    out_specs = jax.tree_util.tree_map(
        lambda l: P("classes") if l.ndim > 0 else P(), template)
    ms = jax.jit(jax.shard_map(body, mesh=mesh, in_specs=P("classes"),
                               out_specs=out_specs, check_vma=False))(
        jnp.asarray(text_pad))

    want = engine.init_state(cfg, jnp.asarray(text), key).method_state
    for name in ("mu", "sigma", "sigma_reg", "pi", "C", "class_counts"):
        np.testing.assert_allclose(
            np.asarray(getattr(ms, name))[:K],
            np.asarray(getattr(want, name)),
            rtol=1e-6, atol=1e-7, err_msg=name)


def test_ep_gmm_continual_resume(setup):
    """The full-K carry splices back and the chained trajectory equals the
    replicated chain (total_samples / class_counts carry through)."""
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
    _assert_gmm_close(est2.method_state, st2.method_state)
    want_c = np.asarray(jnp.sum(o2.correct, axis=0))
    assert s2["acc1"] == pytest.approx(100.0 * want_c[0] / (T - half))


def test_streams_ep_gmm_dp_composition(setup):
    """DP × EP for GMM-DOTA on a 2-D (data, classes) mesh: exercises the
    full-K QR draw INSIDE shard_map (_init_local_state's GMM branch) —
    per-stream trajectories equal engine.run_streams_vmapped's."""
    from jax.sharding import Mesh

    model, params, rng = setup
    rng = np.random.default_rng(4)
    K, C = 10, 4  # padded K: the init branch's hard case
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
    assert summary["n_class_shards"] == 4
    np.testing.assert_allclose(np.asarray(states.method_state.mu),
                               np.asarray(want_states.method_state.mu),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(states.method_state.C),
                               np.asarray(want_states.method_state.C),
                               rtol=1e-5, atol=1e-7)
    assert np.asarray(states.method_state.mu).shape[:2] == (C, K)


def test_ep_gmm_cli(tmp_path):
    """--dist-mode ep with --dota-use-gmm-dota through the evaluation CLI."""
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
              "--dota-use-gmm-dota", "true", "--dota-use-mode-dota",
              "false"]
    base = tta_cli.main(common + ["--output-dir", str(tmp_path / "base")])
    got = tta_cli.main(common + ["--output-dir", str(tmp_path / "ep"),
                                 "--dist-mode", "ep"])
    assert got == base


def test_ep_gmm_validation():
    from uni_adapter_tpu.config import parse_args

    cfg = parse_args(["--dist-mode", "ep", "--dota-use-gmm-dota", "true",
                      "--dota-use-mode-dota", "false"])
    assert cfg.run.dist_mode == "ep"
    with pytest.raises(ValueError, match="nothing to split"):
        parse_args(["--dist-mode", "ep", "--dota-use-gmm-dota", "true",
                    "--dota-use-mode-dota", "false",
                    "--ep-shard-encoder", "true"])
    # the adaptive variant is EP-legal too (tests/test_ep_adaptive.py)
    cfg_ad = parse_args(["--dist-mode", "ep", "--dota-use-mode-dota",
                         "false", "--dota-use-adaptive-dota", "true"])
    assert cfg_ad.run.dist_mode == "ep"


def test_ep_tp_gmm_composition(setup):
    """EP × TP with GMM-DOTA: the class-sharded step composes with a
    Megatron trunk via the encode_fn hook on a 2-D (classes, model) mesh
    (partial-manual shard_map), equal to the replicated run."""
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
    _assert_gmm_close(got_state.method_state, want_state.method_state,
                      rtol=2e-4, atol=2e-5)
    want_c = np.asarray(jnp.sum(want_outs.correct, axis=0))
    assert summary["acc1"] == pytest.approx(100.0 * want_c[0] / T)
