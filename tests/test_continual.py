"""Continual TTA (--continual): one adaptation trajectory through the whole
corruption sequence, instead of the reference's per-corruption reset
(state init inside test_zeroshot_3d_core, Uni_Adapter.py:323-361).

The defining contract: chaining stream B from stream A's final carry is
EXACTLY the single concatenated stream A+B — the carry (mixture state,
residual Adam moments, PRNG key, step counter) is the whole trajectory.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import uni_adapter_tpu.cli.tta as tta_cli
from uni_adapter_tpu import engine
from uni_adapter_tpu.config import Config, DotaConfig, ModelConfig, parse_args
from uni_adapter_tpu.models.uni3d import Uni3D

K, D, N, B = 5, 32, 64, 1


@pytest.fixture(scope="module")
def setup():
    model = Uni3D(trans_dim=48, embed_dim=D, num_group=8, group_size=8,
                  encoder_dim=24, depth=2, num_heads=4, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    pc0 = jnp.asarray(rng.standard_normal((B, N, 6)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), pc0)
    text = rng.standard_normal((K, D)).astype(np.float32)
    text /= np.linalg.norm(text, axis=1, keepdims=True)
    cfg = Config(model=ModelConfig(compute_dtype="float32"),
                 dota=DotaConfig(use_mode_dota=True, mode_M=2,
                                 res_learning=True, residual_steps=2))
    return cfg, model, params, jnp.asarray(text), rng


def _stream(rng, T):
    pcs = rng.standard_normal((T, B, N, 3)).astype(np.float32)
    return (jnp.asarray(pcs), jnp.ones_like(jnp.asarray(pcs)),
            jnp.asarray(rng.integers(0, K, (T, B)).astype(np.int32)))


def test_chained_scan_equals_concatenated_stream(setup):
    cfg, model, params, text, rng = setup
    a = _stream(rng, 4)
    b = _stream(rng, 3)
    joint = tuple(jnp.concatenate([x, y]) for x, y in zip(a, b))

    scan_fn = jax.jit(engine.make_scan_fn(cfg, model))
    want_state, want_outs = engine.run_stream_scan(
        cfg, model, params, text, *joint, seed=7, scan_fn=scan_fn)

    state_a, outs_a = engine.run_stream_scan(
        cfg, model, params, text, *a, seed=7, scan_fn=scan_fn)
    state_b, outs_b = engine.run_stream_scan(
        cfg, model, params, text, *b, seed=7, scan_fn=scan_fn,
        initial_state=state_a)

    assert int(state_b.step) == int(want_state.step) == 7
    for got, want in zip(jax.tree.leaves((state_b, outs_a, outs_b)),
                         jax.tree.leaves(
                             (want_state,
                              jax.tree.map(lambda x: x[:4], want_outs),
                              jax.tree.map(lambda x: x[4:], want_outs)))):
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_host_iterator_chaining_equals_concatenated(setup):
    """Host-iterator path: A then B-from-A's-carry == A+B in one run,
    bitwise (the same jitted step function drives both)."""
    cfg, model, params, text, rng = setup
    a = _stream(rng, 3)
    b = _stream(rng, 2)
    step_fn = jax.jit(engine.make_step_fn(cfg, model))
    as_batches = lambda s: [(s[0][t], s[1][t], s[2][t])
                            for t in range(s[0].shape[0])]

    want = engine.run_stream(cfg, model, params, text,
                             as_batches(a) + as_batches(b), seed=3,
                             step_fn=step_fn)
    res_a = engine.run_stream(cfg, model, params, text, as_batches(a),
                              seed=3, step_fn=step_fn)
    res_b = engine.run_stream(cfg, model, params, text, as_batches(b),
                              seed=3, step_fn=step_fn,
                              initial_state=res_a["state"])

    assert int(res_b["state"].step) == int(want["state"].step) == 5
    for got, wnt in zip(jax.tree.leaves(res_b["state"]),
                        jax.tree.leaves(want["state"])):
        np.testing.assert_array_equal(np.asarray(got), np.asarray(wnt))
    # the joint run's counters cover A+B; the chained runs' split 3/2
    joint = (np.asarray([want["acc1"], want["acc3"], want["acc5"]])
             / 100.0 * 5 * B)
    split = (np.asarray([res_a["acc1"], res_a["acc3"], res_a["acc5"]])
             / 100.0 * 3 * B
             + np.asarray([res_b["acc1"], res_b["acc3"], res_b["acc5"]])
             / 100.0 * 2 * B)
    np.testing.assert_allclose(split, joint, atol=1e-9)


def test_continual_cli_matches_engine_chain(setup, tmp_path):
    """--continual through main() reports the same per-corruption accuracies
    as the manual engine-level chain."""
    cfg, model, params, text, _ = setup
    rng = np.random.default_rng(1)
    root = tmp_path / "data"
    root.mkdir()
    T = 6
    streams = {}
    for corr in ("uniform", "gaussian"):
        data = rng.standard_normal((T, 128, 3)).astype(np.float32)
        np.save(root / f"data_{corr}_5.npy", data)
        streams[corr] = data
    labels = rng.integers(0, 40, (T,)).astype(np.int64)
    np.save(root / "label.npy", labels)

    argv = ["--device", "cpu", "--root", str(root), "--corruption", "all",
            "--npoints", "128", "--eva-depth", "2", "--pc-feat-dim", "64",
            "--num-group", "16", "--group-size", "8",
            "--pc-encoder-dim", "32", "--eva-heads", "4",
            "--compute-dtype", "float32",
            "--precomputed-text-features", "large",
            "--output-dir", str(tmp_path / "out")]
    # restrict the sweep to the two corruptions we wrote
    import uni_adapter_tpu.cli.tta as mod
    orig = mod.CORRUPTIONS
    mod.CORRUPTIONS = ("uniform", "gaussian")
    try:
        reset_res = tta_cli.main(argv)
        cont_res = tta_cli.main(argv + ["--continual", "true"])
    finally:
        mod.CORRUPTIONS = orig

    # first corruption sees a fresh state either way; afterwards the carried
    # trajectory is a different (valid) run — recompute it with the engine
    assert cont_res["uniform"] == reset_res["uniform"]

    ecfg = parse_args(argv)
    emodel, eparams = tta_cli.build_model(ecfg)
    etext = tta_cli.get_text_anchors_with_fallback(ecfg)
    scan_fn = jax.jit(engine.make_scan_fn(ecfg, emodel))
    state = None
    for corr in ("uniform", "gaussian"):
        ds = dataclasses.replace(
            ecfg, data=dataclasses.replace(ecfg.data, corruption=corr))
        from uni_adapter_tpu.data.datasets import load_tta_dataset
        pcs, rgbs, tgts = load_tta_dataset(ds).as_arrays(
            1, npoints=128, seed=ecfg.run.seed)
        state, outs = engine.run_stream_scan(
            ecfg, emodel, eparams, etext, jnp.asarray(pcs),
            jnp.asarray(rgbs), jnp.asarray(tgts), seed=ecfg.run.seed,
            scan_fn=scan_fn, initial_state=state)
        want = engine.summarize(outs, T)["acc1"]
        assert cont_res[corr] == pytest.approx(want)


def test_continual_flag_validation():
    with pytest.raises(ValueError, match="mutually exclusive"):
        parse_args(["--continual", "true", "--vmap-corruptions", "true"])
    with pytest.raises(ValueError, match="replicated"):
        parse_args(["--continual", "true", "--dist-mode", "psum"])
