"""Class-sharded (expert-parallel) MODE-DOTA on the virtual 8-CPU mesh.

The EP trajectory must reproduce the single-device replicated run: the EM
update is class-local so the state is BITWISE the replicated state when
residual learning is off (parallel/ep.py module docstring); with the
residual loop on, the only reorder is the gradient reduce_scatter, so the
trajectory matches to tolerance over short streams.
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


def _cfg(res=False, **kw):
    dc = DotaConfig(use_dota=False, use_mode_dota=True, mode_M=2,
                    res_learning=res, residual_steps=2, **kw)
    return Config(model=ModelConfig(compute_dtype="float32"), dota=dc,
                  cache=CacheConfig())


def _replicated(cfg, model, params, text, pcs, rgbs, targets, seed=42):
    state, outs = engine.run_stream_scan(
        cfg, model, params, jnp.asarray(text), jnp.asarray(pcs),
        jnp.asarray(rgbs), jnp.asarray(targets), seed=seed)
    return state, outs


@pytest.mark.parametrize("K", [16, 10])  # divisible and padded (10 → 16)
def test_ep_state_matches_replicated(setup, K):
    model, params, rng = setup
    rng = np.random.default_rng(1)
    text = _text(rng, K)
    pcs, rgbs, targets = _stream(rng, K, B=2)
    cfg = _cfg(res=False)

    want_state, want_outs = _replicated(cfg, model, params, text, pcs, rgbs,
                                        targets)
    mesh = ep.make_classes_mesh(8)
    got_state, summary = ep.run_stream_ep(cfg, model, params, text, pcs,
                                          rgbs, targets, mesh=mesh)
    assert summary["padded_classes"] == (16 - K if K == 10 else 0)

    # class-local EM on identical prob_map slices ⇒ state matches to
    # float roundoff (EP is a different compiled program, so XLA fusion
    # reassociates elementwise chains at the ulp level)
    for name in ("mu", "var", "pi", "c", "class_counts"):
        np.testing.assert_allclose(
            np.asarray(getattr(got_state.method_state, name)),
            np.asarray(getattr(want_state.method_state, name)),
            rtol=1e-5, atol=1e-7, err_msg=name)
    assert int(got_state.method_state.t) == int(want_state.method_state.t)
    assert int(got_state.step) == T

    # emitted logits differ only through the fusion weight's psum reorder
    want_c = np.asarray(jnp.sum(want_outs.correct, axis=0))
    assert summary["acc1"] == pytest.approx(100.0 * want_c[0] / (T * 2))
    assert summary["acc3"] == pytest.approx(100.0 * want_c[1] / (T * 2))


def test_ep_residual_learning_matches_replicated(setup):
    """Trajectory-level: the residual loop's exp(exp(·)) objective amplifies
    ulp-level gradient reorders chaotically on random weights (same effect
    BASELINE.md documents for the Pallas attention kernel), so the stream
    comparison is a sanity envelope; the tight numerical contract is the
    one-step gradient parity test below."""
    model, params, rng = setup
    rng = np.random.default_rng(2)
    K = 12  # pads to 16 over 8 shards: exercises zero-grad pad rows
    text = _text(rng, K)
    pcs, rgbs, targets = _stream(rng, K, B=1)
    cfg = _cfg(res=True)

    want_state, want_outs = _replicated(cfg, model, params, text, pcs, rgbs,
                                        targets)
    got_state, summary = ep.run_stream_ep(cfg, model, params, text, pcs,
                                          rgbs, targets,
                                          mesh=ep.make_classes_mesh(8))

    np.testing.assert_allclose(np.asarray(got_state.res_state.residuals),
                               np.asarray(want_state.res_state.residuals),
                               atol=1e-2)
    np.testing.assert_allclose(np.asarray(got_state.method_state.mu),
                               np.asarray(want_state.method_state.mu),
                               rtol=1e-3, atol=1e-4)
    want_c = np.asarray(jnp.sum(want_outs.correct, axis=0))
    assert summary["acc1"] == pytest.approx(100.0 * want_c[0] / T)


def test_ep_residual_one_step_gradient_parity(setup):
    """One Adam step of optimize_residuals_sharded == optimize_residuals on
    the full state (the per-device likelihood blocks are column slices of
    the replicated matmuls; only the input-VJP's reduce_scatter reorders),
    and pad-class residual rows receive exactly zero update."""
    from jax.sharding import Mesh, PartitionSpec as P
    from uni_adapter_tpu.adapt import mode_dota, residual

    K, M, n = 12, 2, 8
    k_pad = 16
    rng = np.random.default_rng(5)
    text = _text(rng, K)
    st = mode_dota.init(1e-3, 0.05, D, K, jnp.asarray(text.T), num_modes=M)
    st = st._replace(
        mu=st.mu + 0.01 * rng.standard_normal(st.mu.shape).astype(np.float32),
        c=jnp.asarray(rng.uniform(0.5, 2.0, st.c.shape).astype(np.float32)))
    res0 = 0.001 * rng.standard_normal((K, D)).astype(np.float32)
    opt = residual.make_optimizer(1e-3)

    rs = residual.ResidualState(jnp.asarray(res0), opt.init(jnp.asarray(res0)))
    want = np.asarray(residual.optimize_residuals(
        rs, jnp.asarray(text), st, opt, 1e-3, num_steps=1).residuals)

    def pad_k(a, fill=0.0):
        pad = np.full((k_pad - K,) + a.shape[1:], fill, np.float32)
        return np.concatenate([np.asarray(a), pad], axis=0)

    text_p = pad_k(text)
    text_p[K:, 0] = 1.0
    operands = (text_p, pad_k(st.mu), pad_k(st.var, 0.05),
                pad_k(st.pi, 1.0 / M), pad_k(st.c, 1.0 / M),
                pad_k(st.class_counts), pad_k(res0))
    mesh = Mesh(np.asarray(jax.devices()[:n]), ("classes",))

    def body(text_l, mu, var, pi, c, cc, res_l):
        stl = mode_dota.ModeDotaState(mu, var, pi, c, cc,
                                      jnp.zeros((), jnp.int32))
        rsl = residual.ResidualState(res_l, opt.init(res_l))
        return residual.optimize_residuals_sharded(
            rsl, text_l, stl, opt, 1e-3, "classes", K, num_steps=1).residuals

    f = jax.jit(jax.shard_map(body, mesh=mesh,
                              in_specs=(P("classes"),) * 7,
                              out_specs=P("classes"), check_vma=False))
    got = np.asarray(f(*map(jnp.asarray, operands)))
    np.testing.assert_allclose(got[:K], want, atol=1e-5)
    np.testing.assert_array_equal(got[K:], operands[-1][K:])  # pads frozen


def test_ep_pad_rows_stay_frozen(setup):
    model, params, rng = setup
    rng = np.random.default_rng(3)
    K = 10  # K_pad = 16: last device holds 2 pad classes
    text = _text(rng, K)
    pcs, rgbs, targets = _stream(rng, K, B=1)
    cfg = _cfg(res=True)

    mesh = ep.make_classes_mesh(8)
    state, _ = ep.run_stream_ep(cfg, model, params, text, pcs, rgbs,
                                targets, mesh=mesh)
    # returned state is already sliced to K — shapes prove the unpad
    assert np.asarray(state.method_state.mu).shape[0] == K
    assert np.asarray(state.res_state.residuals).shape == (K, D)
    # class_counts for real classes accumulated 2T fits of prob mass ≈ 2T
    assert np.asarray(state.method_state.class_counts).sum() == \
        pytest.approx(2 * T, rel=1e-5)


def test_ep_sharded_encoder_matches_replicated_encoder(setup):
    """shard_encoder=True splits the fused 2B encoder batch over the class
    axis (B=4 → 2B=8 over 8 devices, one sample each) and gathers the
    features — per-sample encoder math is batch-independent, so the run
    matches the replicated-encoder EP run to float roundoff."""
    model, params, rng = setup
    rng = np.random.default_rng(8)
    K = 16
    text = _text(rng, K)
    pcs, rgbs, targets = _stream(rng, K, B=4)
    cfg = _cfg(res=False)
    mesh = ep.make_classes_mesh(8)

    st_a, sum_a = ep.run_stream_ep(cfg, model, params, text, pcs, rgbs,
                                   targets, mesh=mesh)
    st_b, sum_b = ep.run_stream_ep(cfg, model, params, text, pcs, rgbs,
                                   targets, mesh=mesh, shard_encoder=True)
    np.testing.assert_allclose(np.asarray(st_b.method_state.mu),
                               np.asarray(st_a.method_state.mu),
                               rtol=1e-5, atol=1e-7)
    assert sum_b["acc1"] == pytest.approx(sum_a["acc1"])
    assert sum_b["acc5"] == pytest.approx(sum_a["acc5"])

    # indivisible fused batches pad with zero clouds (round-4: the
    # paper's B=1 protocol works on any mesh — 2B=2 pads to 8, each
    # device encodes one row); trajectory still equals the replicated run
    st_c, sum_c = ep.run_stream_ep(cfg, model, params, text, pcs[:, :1],
                                   rgbs[:, :1], targets[:, :1], mesh=mesh)
    st_d, sum_d = ep.run_stream_ep(cfg, model, params, text, pcs[:, :1],
                                   rgbs[:, :1], targets[:, :1], mesh=mesh,
                                   shard_encoder=True)
    np.testing.assert_allclose(np.asarray(st_d.method_state.mu),
                               np.asarray(st_c.method_state.mu),
                               rtol=1e-5, atol=1e-7)
    assert sum_d["acc1"] == pytest.approx(sum_c["acc1"])


def test_ep_continual_resume_matches_replicated(setup):
    """initial_state resumes the class-sharded trajectory: EP over segment 1
    then EP over segment 2 resumed from the returned full-K carry equals
    the replicated engine chained the same way (continual TTA protocol)."""
    model, params, rng = setup
    rng = np.random.default_rng(6)
    K = 10  # padded: the splice must re-freeze the pad rows
    text = _text(rng, K)
    pcs, rgbs, targets = _stream(rng, K, B=1)
    cfg = _cfg(res=False)
    half = T // 2

    st1, o1 = _replicated(cfg, model, params, text, pcs[:half], rgbs[:half],
                          targets[:half])
    st2, o2 = engine.run_stream_scan(
        cfg, model, params, jnp.asarray(text), jnp.asarray(pcs[half:]),
        jnp.asarray(rgbs[half:]), jnp.asarray(targets[half:]),
        initial_state=st1)

    mesh = ep.make_classes_mesh(8)
    est1, s1 = ep.run_stream_ep(cfg, model, params, text, pcs[:half],
                                rgbs[:half], targets[:half], mesh=mesh)
    est2, s2 = ep.run_stream_ep(cfg, model, params, text, pcs[half:],
                                rgbs[half:], targets[half:], mesh=mesh,
                                initial_state=est1)

    assert int(est2.step) == T  # the carry chained through both segments
    np.testing.assert_allclose(np.asarray(est2.method_state.mu),
                               np.asarray(st2.method_state.mu),
                               rtol=1e-5, atol=1e-7)
    want_c = np.asarray(jnp.sum(o2.correct, axis=0))
    assert s2["acc1"] == pytest.approx(100.0 * want_c[0] / (T - half))


def test_streams_ep_dp_composition(setup):
    """DP × EP on a 2-D (data, classes) mesh: stream trajectories equal
    engine.run_streams_vmapped's (same per-stream seeds), class-sharded.
    The realistic LVIS deployment of the corruption sweep."""
    from jax.sharding import Mesh

    model, params, rng = setup
    rng = np.random.default_rng(4)
    K, C = 16, 4
    text = _text(rng, K)
    pcs = rng.standard_normal((C, T, 1, N, 3)).astype(np.float32)
    rgbs = np.ones_like(pcs)
    targets = rng.integers(0, K, (C, T, 1)).astype(np.int32)
    cfg = _cfg(res=False)

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
    assert summary["n_class_shards"] == 4
    # stacked full-K states: leading C, class leaves unpadded
    assert np.asarray(states.method_state.mu).shape[:2] == (C, K)
    assert np.asarray(states.step).shape == (C,)


def test_streams_ep_shard_encoder(setup):
    """run_streams_ep forwards the encoder-sharding lever (advisor round-3):
    DP × EP with B=2 (2B=4 over the 4-device class axis, one sample each)
    matches the replicated-encoder DP × EP run to float roundoff."""
    from jax.sharding import Mesh

    model, params, rng = setup
    rng = np.random.default_rng(11)
    K, C, B = 16, 4, 2
    text = _text(rng, K)
    pcs = rng.standard_normal((C, T, B, N, 3)).astype(np.float32)
    rgbs = np.ones_like(pcs)
    targets = rng.integers(0, K, (C, T, B)).astype(np.int32)
    cfg = _cfg(res=False)
    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(2, 4),
                ("data", "classes"))

    st_a, sum_a = ep.run_streams_ep(cfg, model, params, text, pcs, rgbs,
                                    targets, mesh=mesh)
    st_b, sum_b = ep.run_streams_ep(cfg, model, params, text, pcs, rgbs,
                                    targets, mesh=mesh, shard_encoder=True)
    np.testing.assert_allclose(np.asarray(st_b.method_state.mu),
                               np.asarray(st_a.method_state.mu),
                               rtol=1e-5, atol=1e-7)
    assert sum_b["acc1_per_stream"] == pytest.approx(
        sum_a["acc1_per_stream"])


def test_ep_tp_trunk_composition(setup):
    """EP × TP on a 2-D (classes, model) mesh (the ep.py composition
    claim, now a test): the class-sharded MODE-DOTA step runs with a
    Megatron-sharded trunk injected via the encode_fn hook — shard_map is
    manual over classes, the model axis stays automatic and GSPMD inserts
    the trunk's all-reduces inside the step.  The trajectory equals the
    fully replicated run."""
    from jax.sharding import Mesh
    from uni_adapter_tpu.parallel.tp import make_tp_encode_fn

    model, params, rng = setup
    rng = np.random.default_rng(13)
    K = 16
    text = _text(rng, K)
    pcs, rgbs, targets = _stream(rng, K, B=2)
    cfg = _cfg(res=False)

    want_state, want_outs = _replicated(cfg, model, params, text, pcs, rgbs,
                                        targets)

    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(4, 2),
                ("classes", "model"))
    prepare, encode = make_tp_encode_fn(model, mesh, "uni3d", axis="model")
    got_state, summary = ep.run_stream_ep(
        cfg, model, prepare(params), text, pcs, rgbs, targets, mesh=mesh,
        classes_axis="classes", encode_fn=encode)
    assert summary["n_class_shards"] == 4
    for name in ("mu", "var", "pi", "c", "class_counts"):
        np.testing.assert_allclose(
            np.asarray(getattr(got_state.method_state, name)),
            np.asarray(getattr(want_state.method_state, name)),
            rtol=2e-4, atol=2e-5, err_msg=name)
    want_c = np.asarray(jnp.sum(want_outs.correct, axis=0))
    assert summary["acc1"] == pytest.approx(100.0 * want_c[0] / (T * 2))


def test_ep_tp_cache_composition(setup):
    """EP × TP with the CACHE method: the round-4 cache step composes with
    the Megatron trunk the same way."""
    from jax.sharding import Mesh
    from uni_adapter_tpu.config import CacheConfig, Config, ModelConfig
    from uni_adapter_tpu.parallel.tp import make_tp_encode_fn

    model, params, rng = setup
    rng = np.random.default_rng(14)
    K = 10  # pads to 12 over the 4-device classes axis
    text = _text(rng, K)
    pcs, rgbs, targets = _stream(rng, K, B=1)
    cfg = Config(model=ModelConfig(compute_dtype="float32"),
                 dota=DotaConfig(use_dota=False, use_mode_dota=False),
                 cache=CacheConfig(shot_capacity=3, threshold=0.3,
                                   lambda_reg=0.11, beta=150.0))

    want_state, want_outs = _replicated(cfg, model, params, text, pcs, rgbs,
                                        targets)
    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(4, 2),
                ("classes", "model"))
    prepare, encode = make_tp_encode_fn(model, mesh, "uni3d", axis="model")
    got_state, summary = ep.run_stream_ep(
        cfg, model, prepare(params), text, pcs, rgbs, targets, mesh=mesh,
        classes_axis="classes", encode_fn=encode)
    assert summary["padded_classes"] == 2
    np.testing.assert_array_equal(
        np.asarray(got_state.method_state.valid),
        np.asarray(want_state.method_state.valid))
    np.testing.assert_allclose(
        np.asarray(got_state.method_state.feats),
        np.asarray(want_state.method_state.feats), rtol=2e-4, atol=2e-5)
    want_c = np.asarray(jnp.sum(want_outs.correct, axis=0))
    assert summary["acc1"] == pytest.approx(100.0 * want_c[0] / T)


def test_ep_residual_unroll_matches_loop(setup):
    """--dota-residual-unroll is honoured under EP (advisor round-3): the
    unrolled sharded residual loop is the same math as the fori_loop body,
    so short trajectories match to tolerance (fusion order may differ)."""
    model, params, rng = setup
    rng = np.random.default_rng(12)
    K = 16
    text = _text(rng, K)
    pcs, rgbs, targets = _stream(rng, K, B=1)
    mesh = ep.make_classes_mesh(8)

    st_loop, _ = ep.run_stream_ep(_cfg(res=True), model, params, text, pcs,
                                  rgbs, targets, mesh=mesh)
    st_flat, _ = ep.run_stream_ep(_cfg(res=True, residual_unroll=True),
                                  model, params, text, pcs, rgbs, targets,
                                  mesh=mesh)
    np.testing.assert_allclose(np.asarray(st_flat.res_state.residuals),
                               np.asarray(st_loop.res_state.residuals),
                               atol=5e-3)
    np.testing.assert_allclose(np.asarray(st_flat.method_state.mu),
                               np.asarray(st_loop.method_state.mu),
                               rtol=1e-4, atol=1e-5)


def test_ep_cli(tmp_path):
    """--dist-mode ep through the evaluation CLI: K=40 modelnet classes
    shard 5-per-device over the virtual 8-device mesh; accuracies match
    the replicated run (res learning off keeps the comparison out of the
    chaotic-amplification regime — see the trajectory test above)."""
    import json
    import uni_adapter_tpu.cli.tta as tta_cli

    root = tmp_path / "data"
    root.mkdir()
    rng = np.random.default_rng(7)
    np.save(root / "data_uniform_5.npy",
            rng.standard_normal((8, 128, 3)).astype(np.float32))
    np.save(root / "label.npy", rng.integers(0, 40, (8,)).astype(np.int64))
    common = ["--device", "cpu", "--corruption", "uniform", "--npoints",
              "64", "--eva-depth", "1", "--pc-feat-dim", "64",
              "--num-group", "16", "--group-size", "8", "--pc-encoder-dim",
              "32", "--eva-heads", "4", "--compute-dtype", "float32",
              "--precomputed-text-features", "large", "--root", str(root),
              "--dota-res-learning", "false"]
    base = tta_cli.main(common + ["--output-dir", str(tmp_path / "base")])
    got = tta_cli.main(common + ["--output-dir", str(tmp_path / "ep"),
                                 "--dist-mode", "ep"])
    assert got == base
    out_dirs = list((tmp_path / "ep").iterdir())
    assert any((d / "results.json").exists() for d in out_dirs)

    # res learning on: completes end-to-end through the CLI
    res = tta_cli.main(common[:-2] + ["--output-dir", str(tmp_path / "ep2"),
                                      "--dist-mode", "ep"])
    assert set(res) == {"uniform"}


def test_ep_cli_validation():
    from uni_adapter_tpu.config import parse_args

    # the whole family is EP-legal since round 4 (incl. adaptive)
    cfg_ad = parse_args(["--dist-mode", "ep", "--dota-use-mode-dota",
                         "false", "--dota-use-adaptive-dota", "true"])
    assert cfg_ad.run.dist_mode == "ep"
    # --vmap-corruptions composes with ep since round 4 (the CLI routes
    # to run_streams_ep's shard_map(vmap(scan)) — see test below)
    cfg_v = parse_args(["--dist-mode", "ep", "--vmap-corruptions", "true"])
    assert cfg_v.run.vmap_corruptions and cfg_v.run.dist_mode == "ep"
    # inert-flag combination rejected (advisor round-3): the encoder-sharding
    # lever only exists inside the EP step
    with pytest.raises(ValueError, match="ep-shard-encoder"):
        parse_args(["--ep-shard-encoder", "true"])
    with pytest.raises(ValueError, match="ep-shard-encoder"):
        parse_args(["--dist-mode", "sharded", "--ep-shard-encoder", "true"])


def test_ep_k_smaller_than_mesh(setup):
    """K=2 over 8 devices: 6 devices hold ONLY frozen pad classes (1 class
    each), M=1 modes — the degenerate corner must still match the
    replicated run (zero prob columns keep pad fits inert; garbage pad
    likelihood columns are sliced before every reduction)."""
    model, params, rng = setup
    rng = np.random.default_rng(9)
    K = 2
    text = _text(rng, K)
    pcs, rgbs, targets = _stream(rng, K, B=1)
    dc = DotaConfig(use_dota=False, use_mode_dota=True, mode_M=1,
                    res_learning=True, residual_steps=1)
    cfg = Config(model=ModelConfig(compute_dtype="float32"), dota=dc,
                 cache=CacheConfig())

    want_state, want_outs = _replicated(cfg, model, params, text, pcs, rgbs,
                                        targets)
    got_state, summary = ep.run_stream_ep(cfg, model, params, text, pcs,
                                          rgbs, targets,
                                          mesh=ep.make_classes_mesh(8))
    assert summary["padded_classes"] == 6
    np.testing.assert_allclose(np.asarray(got_state.method_state.mu),
                               np.asarray(want_state.method_state.mu),
                               rtol=1e-3, atol=1e-5)
    assert np.isfinite(np.asarray(got_state.res_state.residuals)).all()
    want_c = np.asarray(jnp.sum(want_outs.correct, axis=0))
    assert summary["acc1"] == pytest.approx(100.0 * want_c[0] / T)


def test_ep_every_method_shardable(setup):
    """Round-4 completion: the ENTIRE adaptation family class-shards —
    make_ep_step_fn builds a step for all five method configs (MODE-DOTA,
    plain DOTA, GMM, adaptive, cache); only the MODE-DOTA-specific
    encoder-sharding lever rejects elsewhere."""
    model, params, rng = setup
    flag_sets = [
        dict(use_dota=False, use_mode_dota=True),
        dict(use_dota=True, use_mode_dota=False),
        dict(use_dota=False, use_mode_dota=False, use_gmm_dota=True),
        dict(use_dota=False, use_mode_dota=False, use_adaptive_dota=True),
        dict(use_dota=False, use_mode_dota=False),   # cache path
    ]
    for flags in flag_sets:
        cfg = Config(model=ModelConfig(compute_dtype="float32"),
                     dota=DotaConfig(**flags), cache=CacheConfig())
        assert callable(ep.make_ep_step_fn(cfg, model, "classes", 8, 8))
    with pytest.raises(ValueError, match="nothing to split"):
        ep.make_ep_step_fn(
            Config(model=ModelConfig(compute_dtype="float32"),
                   dota=DotaConfig(use_dota=False, use_mode_dota=False,
                                   use_adaptive_dota=True),
                   cache=CacheConfig()),
            model, "classes", 8, 8, shard_encoder=True)


def test_ep_vmapped_sweep_cli(tmp_path):
    """--vmap-corruptions --dist-mode ep: the full-sweep DP × EP route
    (streams vmapped on a data axis of 1, class state sharded over all 8
    devices via run_streams_ep) — per-corruption accuracies equal the
    replicated vmapped sweep."""
    import uni_adapter_tpu.cli.tta as tta_cli
    from uni_adapter_tpu.config import CORRUPTIONS

    root = tmp_path / "data"
    root.mkdir()
    rng = np.random.default_rng(7)
    for corr in CORRUPTIONS:
        np.save(root / f"data_{corr}_5.npy",
                rng.standard_normal((4, 128, 3)).astype(np.float32))
    np.save(root / "label.npy", rng.integers(0, 40, (4,)).astype(np.int64))
    common = ["--device", "cpu", "--corruption", "all", "--npoints",
              "64", "--eva-depth", "1", "--pc-feat-dim", "64",
              "--num-group", "16", "--group-size", "8", "--pc-encoder-dim",
              "32", "--eva-heads", "4", "--compute-dtype", "float32",
              "--precomputed-text-features", "large", "--root", str(root),
              "--dota-res-learning", "false", "--vmap-corruptions", "true"]
    base = tta_cli.main(common + ["--output-dir", str(tmp_path / "base")])
    got = tta_cli.main(common + ["--output-dir", str(tmp_path / "ep"),
                                 "--dist-mode", "ep"])
    assert set(got) == set(CORRUPTIONS)
    assert got == base


def test_state_leaf_classification_spec():
    """ADVICE r4: the class-shard/replicate classification of EVERY leaf
    of each method's EngineState is pinned explicitly, and the matching is
    exact path segments — a lookalike field name ('lam_inv', 'prng') must
    NOT silently classify as replicated."""
    text = jnp.asarray(np.eye(4, 8, dtype=np.float32))
    specs = {
        "mode": (DotaConfig(use_mode_dota=True, mode_M=2, res_learning=True,
                            residual_steps=2),
                 {".method_state.mu": True, ".method_state.var": True,
                  ".method_state.pi": True, ".method_state.c": True,
                  ".method_state.class_counts": True,
                  ".method_state.t": False,
                  ".res_state.residuals": True,
                  ".res_state.opt_state[0].count": False,
                  ".res_state.opt_state[0].mu": True,
                  ".res_state.opt_state[0].nu": True,
                  ".step": False, ".rng": False}),
        "cache": (DotaConfig(use_mode_dota=False),
                  {".method_state.feats": True, ".method_state.conf": True,
                   ".method_state.probs": True, ".method_state.counts": True,
                   ".method_state.valid": True,
                   ".step": False, ".rng": False}),
        "dota": (DotaConfig(use_dota=True, use_mode_dota=False,
                            res_learning=False),
                 {".method_state.mu": True, ".method_state.c": True,
                  ".method_state.sigma": True,
                  ".method_state.lam": False,
                  ".method_state.cum_soft_labels": False,
                  ".method_state.prior_step": False,
                  ".step": False, ".rng": False}),
        "gmm": (DotaConfig(use_gmm_dota=True, use_mode_dota=False,
                           res_learning=False),
                {".method_state.mu": True, ".method_state.sigma": True,
                 ".method_state.sigma_reg": True, ".method_state.pi": True,
                 ".method_state.C": True,
                 ".method_state.class_counts": True,
                 ".method_state.total_samples": False,
                 ".step": False, ".rng": False}),
        "adaptive": (DotaConfig(use_adaptive_dota=True, use_mode_dota=False,
                                res_learning=False),
                     {".method_state.mu": True, ".method_state.var": True,
                      ".method_state.pi": True, ".method_state.c": True,
                      ".method_state.mask": True,
                      ".method_state.class_counts": True,
                      ".method_state.t": False,
                      ".method_state.fit_calls": False,
                      ".step": False, ".rng": False}),
    }
    for name, (dc, want) in specs.items():
        cfg = Config(model=ModelConfig(compute_dtype="float32"), dota=dc,
                     cache=CacheConfig())
        st = engine.init_state(cfg, text, jax.random.PRNGKey(0))
        flat = jax.tree_util.tree_flatten_with_path(st)[0]
        got = {jax.tree_util.keystr(p): ep._is_class_leaf(p, leaf)
               for p, leaf in flat}
        assert got == want, (name, got)

    # exact-segment semantics: containment lookalikes do not match
    GA = jax.tree_util.GetAttrKey
    assert ep._is_replicated_path((GA("method_state"), GA("lam")))
    assert not ep._is_replicated_path((GA("method_state"), GA("lam_inv")))
    assert not ep._is_replicated_path((GA("prng"),))
    assert ep._is_replicated_path((GA("rng"),))
