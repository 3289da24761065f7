"""Parity against the reference's OWN code, imported from /root/reference.

Unlike test_reference_oracle.py (whose torch oracle re-transcribes the
reference equations — a transcription can encode the same misreading on
both sides), these tests drive the ACTUAL reference implementation:

  * `DOTA_mix.fit/predict`            (/root/reference/dota_mixture.py:162-267)
  * `DOTA.fit/update/predict`         (/root/reference/dota.py:19-88)
  * `conjugate_gradient` and
    `online_value_refinement_new/_old` (/root/reference/utils/math_utils.py:21-110)
  * `compute_text_alignment_loss`     (/root/reference/Uni_Adapter.py:191-270)
  * the full `test_zeroshot_3d_core`
    loop                              (/root/reference/Uni_Adapter.py:272-595)

on feature streams identical to what our engine consumes, and assert
component-level state parity plus per-step final-logit parity — including
the 10-step residual Adam loop and the growing-graph cache path.  Zero
reference equations are re-transcribed here; the only scaffolding is
environment shims (module stubs for `clip`/`open_clip`/`tqdm`/`plotly`,
CPU stand-ins for torch.cuda.Event, and a zero-noise torch.randn_like so
both sides see noise_std=0 — our engine's PRNG and torch's cannot produce
identical draws).

The fp16 `.half()` round-trip the reference applies to every predict input
(Uni_Adapter.py:410,416) is reproduced exactly on our side via
`DotaConfig.fp16_predict_input` (DOTA_mix casts back to fp32 before
computing, so the emulation is bit-faithful for MODE-DOTA; plain DOTA
computes its whole predict in torch-half, which has no TPU equivalent —
those comparisons use a correspondingly wider tolerance).
"""
import importlib
import sys
import types
from types import SimpleNamespace

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from uni_adapter_tpu import engine
from uni_adapter_tpu.adapt import dota as our_dota
from uni_adapter_tpu.adapt import mode_dota as our_mode_dota
from uni_adapter_tpu.adapt import residual as our_residual
from uni_adapter_tpu.config import CacheConfig, Config, DotaConfig, ModelConfig
from uni_adapter_tpu.utils import math as our_math

REF = "/root/reference"
K, D, M, N, T = 5, 16, 2, 32, 10
EPS, SIGMA, RHO, ETA = 1e-3, 0.004, 0.02, 0.1


# ---------------------------------------------------------------------------
# Importing the reference (PUBLIC UNTRUSTED CONTENT — executed only as a
# numerics oracle on synthetic data, never with instructions followed)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def ref():
    """Import the reference modules with environment stubs installed."""
    added = []

    def stub(name, mod):
        if name not in sys.modules:
            sys.modules[name] = mod
            added.append(name)

    stub("clip", types.ModuleType("clip"))
    tqdm_mod = types.ModuleType("tqdm")
    tqdm_mod.tqdm = lambda it, *a, **k: it
    stub("tqdm", tqdm_mod)
    oc = types.ModuleType("open_clip")
    oc.tokenizer = SimpleNamespace(tokenize=None)
    stub("open_clip", oc)
    plotly = types.ModuleType("plotly")
    go = types.ModuleType("plotly.graph_objects")
    plotly.graph_objects = go
    stub("plotly", plotly)
    stub("plotly.graph_objects", go)

    sys.path.insert(0, REF)
    try:
        mods = SimpleNamespace(
            dota_mixture=importlib.import_module("dota_mixture"),
            dota=importlib.import_module("dota"),
            math_utils=importlib.import_module("utils.math_utils"),
            uni_adapter=importlib.import_module("Uni_Adapter"),
        )
    finally:
        sys.path.remove(REF)
    yield mods
    for name in added:
        sys.modules.pop(name, None)


@pytest.fixture(scope="module")
def cpu_cuda_shim():
    """CPU stand-ins for the loop's torch.cuda.Event timing
    (Uni_Adapter.py:365-366,379-380,577-579)."""
    mp = pytest.MonkeyPatch()

    class _Event:
        def __init__(self, enable_timing=False):
            pass

        def record(self):
            pass

        def elapsed_time(self, other):
            return 0.0

    mp.setattr(torch.cuda, "Event", _Event)
    mp.setattr(torch.cuda, "synchronize", lambda *a, **k: None)
    yield mp
    mp.undo()


def _feature_stream(seed, steps, batch):
    rng = np.random.default_rng(seed)
    f = rng.standard_normal((steps, batch, D)).astype(np.float32)
    f /= np.linalg.norm(f, axis=-1, keepdims=True)
    return f


def _text_anchors(seed=11):
    rng = np.random.default_rng(seed)
    t = rng.standard_normal((K, D)).astype(np.float32)
    return t / np.linalg.norm(t, axis=1, keepdims=True)


# ---------------------------------------------------------------------------
# Component level: state + predict parity, step by step
# ---------------------------------------------------------------------------

def test_mode_dota_state_and_predict_parity(ref):
    """Our mode_dota vs the reference's DOTA_mix on an identical stream:
    per-step predict outputs and the full EM state (mu/var/pi/c) match."""
    text = _text_anchors()
    feats = _feature_stream(21, T, 2)
    probs = np.asarray(jax.nn.softmax(
        100.0 * jnp.asarray(feats) @ jnp.asarray(text).T, axis=-1))

    cfg = {"epsilon": EPS, "sigma": SIGMA}
    theirs = ref.dota_mixture.DOTA_mix(
        cfg, D, K, torch.tensor(text).T, num_modes=M)
    ours = our_mode_dota.init(EPS, SIGMA, D, K, jnp.asarray(text).T,
                              num_modes=M)

    for t in range(T):
        x_t, g_t = torch.tensor(feats[t]), torch.tensor(probs[t])
        pred_theirs = theirs.predict(x_t).numpy()
        pred_ours = np.asarray(our_mode_dota.predict(
            ours, jnp.asarray(feats[t]), EPS))
        np.testing.assert_allclose(pred_ours, pred_theirs,
                                   rtol=1e-4, atol=1e-4)
        theirs.fit(x_t, g_t)
        ours = our_mode_dota.fit(ours, jnp.asarray(feats[t]),
                                 jnp.asarray(probs[t]), EPS)

    for name, our_arr in [("mu", ours.mu), ("var", ours.var),
                          ("pi", ours.pi), ("c", ours.c)]:
        np.testing.assert_allclose(
            np.asarray(our_arr), getattr(theirs, name).numpy(),
            rtol=1e-4, atol=1e-5, err_msg=name)


def test_dota_state_parity(ref):
    """Our dota vs the reference's DOTA: fp32 fit state (mu/c/Sigma) must
    match tightly; predict runs in torch-half on the reference side
    (dota.py:31,69,76), so scores compare at fp16 tolerance."""
    feats = _feature_stream(22, T, 2)
    probs = np.asarray(jax.nn.softmax(
        10.0 * jnp.asarray(feats) @ jnp.asarray(_text_anchors()).T, axis=-1))

    const = torch.full((D, K), 0.001)
    theirs = ref.dota.DOTA({"epsilon": EPS, "sigma": SIGMA}, D, K, const)
    ours = our_dota.init(EPS, SIGMA, D, K, jnp.full((D, K), 0.001))

    for t in range(T):
        theirs.fit(torch.tensor(feats[t]), torch.tensor(probs[t]))
        theirs.update()
        ours = our_dota.fit(ours, jnp.asarray(feats[t]), jnp.asarray(probs[t]))
        ours = our_dota.update(ours, EPS)

    np.testing.assert_allclose(np.asarray(ours.mu), theirs.mu.numpy(),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ours.c), theirs.c.numpy(),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ours.sigma), theirs.Sigma.numpy(),
                               rtol=1e-4, atol=1e-6)

    q = _feature_stream(23, 1, 3)[0]
    score_theirs = theirs.predict(torch.tensor(q).half()).float().numpy()
    score_ours = np.asarray(our_dota.predict(
        ours, jnp.asarray(q).astype(jnp.float16).astype(jnp.float32)))
    np.testing.assert_allclose(score_ours, score_theirs, rtol=2e-2, atol=2e-2)


def test_refinement_parity(ref):
    """Our masked fixed-capacity graph refinement vs the reference's
    growing-graph online_value_refinement_new (CG) and _old (inverse)."""
    rng = np.random.default_rng(5)
    n = 12
    keys = rng.standard_normal((n, D)).astype(np.float32)
    probs = np.asarray(jax.nn.softmax(
        jnp.asarray(rng.standard_normal((n, K)).astype(np.float32)) * 3.0,
        axis=-1))

    out_ref, _ = ref.math_utils.online_value_refinement_new(
        torch.tensor(keys), torch.tensor(probs), True, 0, 0, 0,
        threshold=0.3, lambda_reg=0.11)
    out_ours = np.asarray(our_math.online_value_refinement_new(
        jnp.asarray(keys), jnp.asarray(probs), jnp.ones((n,), bool),
        threshold=0.3, lambda_reg=0.11))
    np.testing.assert_allclose(out_ours, out_ref.numpy(), rtol=1e-4, atol=1e-5)

    out_ref_old = ref.math_utils.online_value_refinement_old(
        torch.tensor(keys), torch.tensor(probs),
        threshold=0.3, lambda_reg=0.11)
    out_ours_old = np.asarray(our_math.online_value_refinement_old(
        jnp.asarray(keys), jnp.asarray(probs), jnp.ones((n,), bool),
        threshold=0.3, lambda_reg=0.11))
    np.testing.assert_allclose(out_ours_old, out_ref_old.numpy(),
                               rtol=1e-4, atol=1e-5)

    # masked layout: embed the same graph in a larger fixed-capacity array —
    # the valid block must be unchanged
    pad = 6
    keys_p = np.concatenate([keys, rng.standard_normal((pad, D))
                             .astype(np.float32)])
    probs_p = np.concatenate([probs, np.full((pad, K), 0.2, np.float32)])
    valid = np.concatenate([np.ones(n, bool), np.zeros(pad, bool)])
    out_masked = np.asarray(our_math.online_value_refinement_new(
        jnp.asarray(keys_p), jnp.asarray(probs_p), jnp.asarray(valid),
        threshold=0.3, lambda_reg=0.11))
    np.testing.assert_allclose(out_masked[:n], out_ref.numpy(),
                               rtol=1e-4, atol=1e-5)


def test_alignment_loss_parity(ref):
    """Our residual.alignment_loss vs the reference's
    compute_text_alignment_loss, evaluated at an identical (fitted) mixture
    state and identical class embeddings."""
    text = _text_anchors()
    feats = _feature_stream(31, 4, 2)
    probs = np.asarray(jax.nn.softmax(
        100.0 * jnp.asarray(feats) @ jnp.asarray(text).T, axis=-1))

    theirs = ref.dota_mixture.DOTA_mix(
        {"epsilon": EPS, "sigma": SIGMA}, D, K, torch.tensor(text).T,
        num_modes=M)
    ours = our_mode_dota.init(EPS, SIGMA, D, K, jnp.asarray(text).T,
                              num_modes=M)
    for t in range(4):
        theirs.fit(torch.tensor(feats[t]), torch.tensor(probs[t]))
        ours = our_mode_dota.fit(ours, jnp.asarray(feats[t]),
                                 jnp.asarray(probs[t]), EPS)

    emb = torch.tensor(text) + 0.01
    emb = emb / emb.norm(dim=1, keepdim=True)
    emb.requires_grad_(True)
    loss_ref, _ = ref.uni_adapter.compute_text_alignment_loss(emb, theirs)
    loss_ours = our_residual.alignment_loss(
        jnp.asarray(emb.detach().numpy()), ours, EPS)
    np.testing.assert_allclose(float(loss_ours), float(loss_ref),
                               rtol=1e-5, atol=1e-6)


# ---------------------------------------------------------------------------
# Loop level: the reference's ACTUAL test_zeroshot_3d_core vs our engine
# ---------------------------------------------------------------------------

def _make_projection():
    rng = np.random.default_rng(7)
    return rng.standard_normal((3, D)).astype(np.float32)


class _TorchToyEncoder(torch.nn.Module):
    """Torch twin of the jax ToyEncoder below — test_zeroshot_3d_core calls
    model.eval() and encode_pc(feature) (Uni_Adapter.py:279,406)."""

    def __init__(self, W):
        super().__init__()
        self.W = torch.tensor(W)

    def encode_pc(self, feature):
        return torch.sin(feature[:, :, :3]).mean(1) @ self.W


class _JaxToyEncoder:
    def __init__(self, W):
        self.W = jnp.asarray(W)

    def apply(self, params, pc):
        return (jnp.mean(jnp.sin(pc[:, :, :3]), axis=1) @ self.W
                ).astype(jnp.float32)


def _ref_args(tmp_path, text, **overrides):
    """The argparse surface test_zeroshot_3d_core reads
    (utils/params.py:4-118)."""
    feat_path = str(tmp_path / "text.pt")
    torch.save(torch.tensor(text), feat_path)
    base = dict(
        vlm3d="uni3d", device="cpu", use_dota=False, use_mode_dota=False,
        use_gmm_dota=False, res_learning=False, mode_M=M,
        dota_epsilon=EPS, dota_sigma=SIGMA, dota_eta=ETA, dota_rho=RHO,
        precomputed_text_features=feat_path, templates_path="",
        labels_path="", template_key="", output_dir=None, print_freq=1000,
        use_new_approximation=True,
    )
    base.update(overrides)
    return SimpleNamespace(**base)


def _stream_batches(seed, steps):
    rng = np.random.default_rng(seed)
    pcs = rng.standard_normal((steps, 1, N, 3)).astype(np.float32)
    targets = rng.integers(0, K, (steps, 1)).astype(np.int64)
    return pcs, targets


def _run_reference_loop(ref, cpu_cuda_shim, args, hp, pcs, targets, W):
    """Drive the reference's own loop, recording per-step final logits by
    wrapping the accuracy() call at Uni_Adapter.py:581."""
    loader = [
        (torch.tensor(pcs[i]), torch.tensor(targets[i]),
         [f"class_{int(targets[i, 0])}"], torch.ones_like(torch.tensor(pcs[i])))
        for i in range(pcs.shape[0])
    ]
    model = _TorchToyEncoder(W)

    recorded = []
    orig_accuracy = ref.uni_adapter.accuracy

    def recording_accuracy(output, target, topk=(1,)):
        recorded.append(output.detach().clone().float())
        return orig_accuracy(output, target, topk)

    mp = pytest.MonkeyPatch()
    try:
        mp.setattr(ref.uni_adapter, "accuracy", recording_accuracy)
        # noise_std alignment: torch's and JAX's PRNGs cannot produce the
        # same draws, so both sides run the double fit with zero noise
        # (the reference hardcodes noise_std=0.05 at Uni_Adapter.py:420)
        mp.setattr(torch, "randn_like",
                   lambda t, **k: torch.zeros_like(t))
        result = ref.uni_adapter.test_zeroshot_3d_core(
            loader, "toy", model, None, None, args, hp)
    finally:
        mp.undo()
    return torch.stack(recorded).numpy(), result


def _run_our_engine(method, text, pcs, targets, W):
    dc = {
        "mode": DotaConfig(use_mode_dota=True, mode_M=M, res_learning=True,
                           epsilon=EPS, sigma=SIGMA, rho=RHO, eta=ETA,
                           noise_std=0.0, fp16_predict_input=True),
        "cache": DotaConfig(use_dota=False, use_mode_dota=False),
    }[method]
    cfg = Config(model=ModelConfig(compute_dtype="float32"), dota=dc,
                 cache=CacheConfig(shot_capacity=3, threshold=0.3,
                                   lambda_reg=0.11, beta=150.0))
    model = _JaxToyEncoder(W)
    rgbs = np.ones_like(pcs)
    _, outs = engine.run_stream_scan(
        cfg, model, {}, jnp.asarray(text), jnp.asarray(pcs),
        jnp.asarray(rgbs), jnp.asarray(targets.astype(np.int32)))
    return np.asarray(outs.final_logits), engine.summarize(outs, pcs.shape[0])


def test_full_loop_mode_dota_parity(ref, cpu_cuda_shim, tmp_path):
    """End-to-end: the reference's test_zeroshot_3d_core (MODE-DOTA with
    10-step residual learning) vs our engine scan — per-step final logits,
    predictions, and the returned accuracy dict."""
    text = _text_anchors()
    W = _make_projection()
    pcs, targets = _stream_batches(41, T)
    args = _ref_args(tmp_path, text, use_mode_dota=True, res_learning=True)
    hp = {"shot_capacity": 3, "threshold": 0.3, "lambda_reg": 0.11,
          "beta": 150.0}

    theirs, their_result = _run_reference_loop(
        ref, cpu_cuda_shim, args, hp, pcs, targets, W)
    ours, our_result = _run_our_engine("mode", text, pcs, targets, W)

    np.testing.assert_allclose(ours[:, 0], theirs[:, 0], rtol=2e-3, atol=2e-3)
    np.testing.assert_array_equal(ours[:, 0].argmax(-1),
                                  theirs[:, 0].argmax(-1))
    assert our_result["acc1"] == pytest.approx(their_result["acc1"])


def test_full_loop_cache_parity(ref, cpu_cuda_shim, tmp_path):
    """End-to-end cache path: growing dict-of-lists + growing-graph CG in
    the reference vs our fixed-capacity masked arrays."""
    text = _text_anchors()
    W = _make_projection()
    pcs, targets = _stream_batches(43, T)
    args = _ref_args(tmp_path, text)          # neither dota flag → cache
    hp = {"shot_capacity": 3, "threshold": 0.3, "lambda_reg": 0.11,
          "beta": 150.0}

    theirs, their_result = _run_reference_loop(
        ref, cpu_cuda_shim, args, hp, pcs, targets, W)
    ours, our_result = _run_our_engine("cache", text, pcs, targets, W)

    np.testing.assert_allclose(ours[:, 0], theirs[:, 0], rtol=2e-3, atol=2e-3)
    np.testing.assert_array_equal(ours[:, 0].argmax(-1),
                                  theirs[:, 0].argmax(-1))
    assert our_result["acc1"] == pytest.approx(their_result["acc1"])


def test_full_loop_pure_dota_reference_bug(ref, cpu_cuda_shim, tmp_path):
    """The reference's pure-DOTA branch never assigns final_logits
    (Uni_Adapter.py:409-412) and crashes at :581 — the bug our engine
    resolves per the reference's own fusion comment (dota_mixture.py:289-292).
    Drive the actual loop to prove the bug is real, not a misreading."""
    text = _text_anchors()
    W = _make_projection()
    pcs, targets = _stream_batches(44, 2)
    args = _ref_args(tmp_path, text, use_dota=True)
    hp = {"shot_capacity": 3, "threshold": 0.3, "lambda_reg": 0.11,
          "beta": 150.0}
    with pytest.raises(NameError):
        _run_reference_loop(ref, cpu_cuda_shim, args, hp, pcs, targets, W)


def test_dota_prior_path_parity(ref):
    """DOTA with prior_pre_steps (update_prior branch, dota.py:32-38,44-46,
    81-85): cumulative-soft-label prior added to the predict scores.

    B=1 streams (the benchmark protocol): at B>1 the reference's
    `cum_soft_labels + y` broadcasts (1,K)+(B,K) into PER-ROW partial sums
    — a shape quirk our summed-over-batch accumulation deliberately
    resolves; the two coincide exactly at batch 1."""
    feats = _feature_stream(51, 6, 1)
    probs = np.asarray(jax.nn.softmax(
        10.0 * jnp.asarray(feats) @ jnp.asarray(_text_anchors()).T, axis=-1))

    const = torch.full((D, K), 0.001)
    theirs = ref.dota.DOTA({"epsilon": EPS, "sigma": SIGMA}, D, K, const,
                           prior_pre_steps=100)
    ours = our_dota.init(EPS, SIGMA, D, K, jnp.full((D, K), 0.001),
                         prior_pre_steps=100)
    for t in range(6):
        theirs.fit(torch.tensor(feats[t]), torch.tensor(probs[t]))
        theirs.update()
        ours = our_dota.fit(ours, jnp.asarray(feats[t]), jnp.asarray(probs[t]))
        ours = our_dota.update(ours, EPS)

    q = _feature_stream(52, 1, 1)[0]
    s_theirs = theirs.predict(torch.tensor(q).half()).float().numpy()
    s_ours = np.asarray(our_dota.predict(
        ours, jnp.asarray(q).astype(jnp.float16).astype(jnp.float32),
        prior_pre_steps=100))
    np.testing.assert_allclose(s_ours, s_theirs, rtol=2e-2, atol=2e-2)


def test_mode_dota_source_priors_parity(ref):
    """DOTA_mix.predict with source_priors (alpha-blended empirical prior,
    dota_mixture.py:260-265)."""
    text = _text_anchors()
    feats = _feature_stream(53, 6, 2)
    probs = np.asarray(jax.nn.softmax(
        100.0 * jnp.asarray(feats) @ jnp.asarray(text).T, axis=-1))

    theirs = ref.dota_mixture.DOTA_mix(
        {"epsilon": EPS, "sigma": SIGMA, "alpha_max": 0.5}, D, K,
        torch.tensor(text).T, num_modes=M)
    ours = our_mode_dota.init(EPS, SIGMA, D, K, jnp.asarray(text).T,
                              num_modes=M)
    for t in range(6):
        theirs.fit(torch.tensor(feats[t]), torch.tensor(probs[t]))
        ours = our_mode_dota.fit(ours, jnp.asarray(feats[t]),
                                 jnp.asarray(probs[t]), EPS)

    uniform = np.full((K,), 1.0 / K, np.float32)
    q = _feature_stream(54, 1, 2)[0]
    s_theirs = theirs.predict(torch.tensor(q),
                              source_priors=torch.tensor(uniform)).numpy()
    s_ours = np.asarray(our_mode_dota.predict(
        ours, jnp.asarray(q), EPS, source_priors=jnp.asarray(uniform),
        alpha_max=0.5))
    np.testing.assert_allclose(s_ours, s_theirs, rtol=1e-4, atol=1e-4)


def test_full_loop_cache_old_approximation_parity(ref, cpu_cuda_shim,
                                                  tmp_path):
    """Cache path with use_new_approximation=False — the reference's
    compute_cache_logits_old / explicit-inverse refinement
    (Uni_Adapter.py:159-189, math_utils.py:95-110; the ShapeNet
    hyperparameter row disables the CG approximation)."""
    text = _text_anchors()
    W = _make_projection()
    pcs, targets = _stream_batches(47, T)
    args = _ref_args(tmp_path, text, use_new_approximation=False)
    hp = {"shot_capacity": 3, "threshold": 0.3, "lambda_reg": 0.11,
          "beta": 150.0}

    theirs, their_result = _run_reference_loop(
        ref, cpu_cuda_shim, args, hp, pcs, targets, W)

    cfg = Config(model=ModelConfig(compute_dtype="float32"),
                 dota=DotaConfig(use_dota=False, use_mode_dota=False),
                 cache=CacheConfig(shot_capacity=3, threshold=0.3,
                                   lambda_reg=0.11, beta=150.0,
                                   use_new_approximation=False))
    model = _JaxToyEncoder(W)
    rgbs = np.ones_like(pcs)
    _, outs = engine.run_stream_scan(
        cfg, model, {}, jnp.asarray(text), jnp.asarray(pcs),
        jnp.asarray(rgbs), jnp.asarray(targets.astype(np.int32)))
    ours = np.asarray(outs.final_logits)

    np.testing.assert_allclose(ours[:, 0], theirs[:, 0], rtol=2e-3, atol=2e-3)
    np.testing.assert_array_equal(ours[:, 0].argmax(-1),
                                  theirs[:, 0].argmax(-1))
    assert engine.summarize(outs, pcs.shape[0])["acc1"] == pytest.approx(
        their_result["acc1"])
