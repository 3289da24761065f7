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
  * `DOTA_mix_adaptive.fit/predict` incl. component splits
                                      (/root/reference/dota_mixture_adaptive.py:7-438)
  * `GMMDOTA.fit/update/predict`      (/root/reference/gmm_dota_adaptation_model.py:6-256)
  * `AttentionExtractor` hook-based map recomputation
                                      (/root/reference/extract_attention.py:34-318)
  * `CrossClassAttentionAnalyzer` centroid/distance/confusion math
                                      (/root/reference/cross_class_attention_analysis.py:175-314)
  * the ULIP Point-BERT encoder, end to end on raw clouds
                                      (/root/reference/models/ulip/ulip_model.py:7-19 + pointbert/*)
  * the OpenShape PPTA encoder, end to end on raw clouds, rel-PE on
                                      (/root/reference/models/openshape/ppta.py:10-155 + pointnet_util.py)
  * the Uni3D PointcloudEncoder: Group/mini-PointNet/plumbing around a
    fused-EVA twin trunk            (/root/reference/models/point_encoder.py:93-223)
  * the corrupted-dataset classes incl. label-shape quirks
                                      (/root/reference/data/tta_datasets.py:102-271)
  * `SimpleTokenizer` CLIP BPE        (/root/reference/utils/tokenizer.py:64-151)
  * `accuracy`/`AverageMeter` and the dataset dispatch
                                      (/root/reference/utils/utils.py:103-167, data/data_utils.py:5-26)
  * the CLI driver `main()` corruption loop + summary
                                      (/root/reference/main_test-time.py:25-104)

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

Together with the converter-layout twins (tests/test_converter_layouts.py)
this covers every reference module executable in this environment; what
remains un-drivable needs the real timm/open_clip towers or published
checkpoints (scripts/validate_real_weights.sh is the playbook for that).
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
from uni_adapter_tpu.adapt import adaptive as our_adaptive
from uni_adapter_tpu.adapt import dota as our_dota
from uni_adapter_tpu.adapt import gmm as our_gmm
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
    # cross_class_attention_analysis → utils.load_models → models/* import
    # timm and the CUDA pointnet2_ops at module level (used only inside
    # functions/forwards this test never calls)
    timm = types.ModuleType("timm")
    timm_models = types.ModuleType("timm.models")
    timm_layers = types.ModuleType("timm.models.layers")
    timm_layers.DropPath = type("DropPath", (torch.nn.Identity,), {})
    timm.models = timm_models
    timm_models.layers = timm_layers
    stub("timm", timm)
    stub("timm.models", timm_models)
    stub("timm.models.layers", timm_layers)
    p2 = types.ModuleType("pointnet2_ops")
    p2.pointnet2_utils = types.ModuleType("pointnet2_ops.pointnet2_utils")
    stub("pointnet2_ops", p2)
    stub("pointnet2_ops.pointnet2_utils", p2.pointnet2_utils)
    stub("torch_redstone", types.ModuleType("torch_redstone"))
    # ftfy is not installed; fix_text is identity on the ASCII class names
    # and prompt templates the tokenizer parity test feeds both sides
    ftfy = types.ModuleType("ftfy")
    ftfy.fix_text = lambda s: s
    stub("ftfy", ftfy)

    sys.path.insert(0, REF)
    try:
        mods = SimpleNamespace(
            dota_mixture=importlib.import_module("dota_mixture"),
            dota=importlib.import_module("dota"),
            math_utils=importlib.import_module("utils.math_utils"),
            uni_adapter=importlib.import_module("Uni_Adapter"),
            adaptive=importlib.import_module("dota_mixture_adaptive"),
            gmm=importlib.import_module("gmm_dota_adaptation_model"),
            extract_attention=importlib.import_module("extract_attention"),
            cross_class=importlib.import_module(
                "cross_class_attention_analysis"),
            tta_datasets=importlib.import_module("data.tta_datasets"),
            tokenizer=importlib.import_module("utils.tokenizer"),
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
    ours = our_dota.init(EPS, SIGMA, D, K, jnp.full((D, K), 0.001))
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


# ---------------------------------------------------------------------------
# Variant adaptation models: the reference's ACTUAL DOTA_mix_adaptive and
# GMMDOTA (previously covered only by transcribed oracles in
# tests/test_variants.py — these close that last transcription gap)
# ---------------------------------------------------------------------------

def test_gmm_state_and_predict_parity(ref):
    """Our gmm vs the reference's ACTUAL GMMDOTA
    (gmm_dota_adaptation_model.py:6-256), anchored on the reference's own
    float64 trajectory.

    GMMDOTA's fitted variances shrink to ~5e-4, so the Mahalanobis term
    amplifies fp32 rounding by ~1/σ ≈ 2000×: the reference's OWN fp32 run
    deviates from its float64 run (same init, same inputs) by up to ~8e-3
    on predict scores, while ours stays within ~6e-4.  A fixed tight
    tolerance would therefore test the noise, not the semantics, so the
    float64 reference trajectory (the `.float()` casts at :138,:225
    neutralised, torch default dtype float64) is the anchor and the
    assertion is a self-calibrating envelope: our fp32 deviation from the
    anchor must not exceed twice the reference's own fp32 deviation.

    The QR-orthonormal mean init draws torch randomness JAX cannot
    reproduce bit-for-bit, so the reference's fp32-initialised mu is
    injected into all three runs; everything downstream — the old-mu
    covariance fit, the shrinkage update, the uniform/empirical
    blended-prior predict — runs each implementation's own code."""
    text = _text_anchors(31)
    feats = _feature_stream(32, T, 2)
    probs = np.asarray(jax.nn.softmax(
        100.0 * jnp.asarray(feats) @ jnp.asarray(text).T, axis=-1))

    torch.manual_seed(7)
    ref32 = ref.gmm.GMMDOTA({"epsilon": EPS, "sigma": SIGMA},
                            D, K, torch.tensor(text).T, M=M)
    mu0 = ref32.mu.numpy().copy()

    # float64 anchor: same fp32 init, internal .float() casts neutralised
    orig_float = torch.Tensor.float
    orig_dtype = torch.get_default_dtype()
    try:
        torch.Tensor.float = lambda self: self
        torch.set_default_dtype(torch.float64)
        ref64 = ref.gmm.GMMDOTA(
            {"epsilon": EPS, "sigma": SIGMA}, D, K,
            torch.tensor(text, dtype=torch.float64).T, M=M)
        ref64.mu = torch.tensor(mu0, dtype=torch.float64)
        preds64 = []
        for t in range(T):
            xt = torch.tensor(feats[t], dtype=torch.float64)
            ref64.fit(xt, torch.tensor(probs[t], dtype=torch.float64))
            ref64.update()
            preds64.append(ref64.predict(xt).numpy())
    finally:
        torch.Tensor.float = orig_float
        torch.set_default_dtype(orig_dtype)

    ours = our_gmm.init(EPS, SIGMA, D, K, jnp.asarray(text).T, num_modes=M)
    ours = ours._replace(mu=jnp.asarray(mu0))
    worst_ref = worst_ours = 0.0
    for t in range(T):
        xt = torch.tensor(feats[t])
        ref32.fit(xt, torch.tensor(probs[t]))
        ref32.update()
        ours = our_gmm.fit(ours, jnp.asarray(feats[t]), jnp.asarray(probs[t]))
        ours = our_gmm.update(ours, EPS)
        p32 = ref32.predict(xt).numpy()
        po = np.asarray(our_gmm.predict(ours, jnp.asarray(feats[t]),
                                        alpha_max=ref32.alpha_max))
        worst_ref = max(worst_ref, np.abs(p32 - preds64[t]).max())
        worst_ours = max(worst_ours, np.abs(po - preds64[t]).max())
        # decision-level agreement with the fp64 anchor at every step
        np.testing.assert_array_equal(po.argmax(-1), preds64[t].argmax(-1))
    assert worst_ours <= 2.0 * worst_ref + 1e-3, (worst_ours, worst_ref)

    # state parity against the fp64 anchor, same envelope discipline
    for name, our_arr in [("mu", ours.mu), ("Sigma", ours.sigma),
                          ("Sigma_reg", ours.sigma_reg), ("pi", ours.pi),
                          ("C", ours.C)]:
        anchor = getattr(ref64, name).numpy()
        d_ref = np.abs(getattr(ref32, name).numpy() - anchor).max()
        d_ours = np.abs(np.asarray(our_arr) - anchor).max()
        assert d_ours <= 2.0 * d_ref + 1e-5, (name, d_ours, d_ref)
    np.testing.assert_allclose(np.asarray(ours.class_counts),
                               ref64.class_counts.numpy(),
                               rtol=1e-5, atol=1e-5)
    assert int(ours.total_samples) == int(ref64.total_samples)


def _adaptive_stream(text, steps, batch, seed=33):
    """Per-class bimodal stream: two clusters offset ±0.45 along dim 0 so
    the fitted dim-0 variance exceeds the split threshold with a wide
    margin (no fp32 eligibility edge cases), while repeatedly producing
    checks where MULTIPLE components of a class are simultaneously
    eligible — exercising the reference's collect-ascending /
    execute-reversed split protocol and its capacity cap."""
    rng = np.random.default_rng(seed)
    K_, D_ = text.shape
    feats = np.empty((steps, batch, D_), np.float32)
    gammas = np.empty((steps, batch, K_), np.float32)
    visit = 0
    for t in range(steps):
        for b in range(batch):
            k = visit % K_
            sign = 1.0 if (visit // K_) % 2 == 0 else -1.0
            f = text[k] + 0.04 * rng.standard_normal(D_).astype(np.float32)
            f[0] += 0.45 * sign
            f /= np.linalg.norm(f)
            feats[t, b] = f
            g = np.full((K_,), 0.1 / K_, np.float32)
            g[k] += 0.9
            gammas[t, b] = g
            visit += 1
    return feats, gammas


def test_adaptive_state_and_predict_parity(ref):
    """Our adaptive vs the reference's ACTUAL DOTA_mix_adaptive
    (dota_mixture_adaptive.py:7-438), component splits included.

    Our check_and_split reproduces the reference's split protocol
    slot-exactly (collect eligible ascending up to capacity, execute in
    reverse index order, −offset children appended at the ragged-list
    end), so padded state is compared PER SLOT, not just up to mode
    permutation.  The stream triggers checks where several components of
    one class are eligible at once — including one where capacity allows
    only a single split, which the reference resolves by index order, not
    worst-variance — so the protocol itself is what's being verified.
    The test asserts splits actually happened (it would silently weaken to
    masked-EM-only parity otherwise) and that mode counts, masks, and
    per-slot mu/var/pi/c all match the reference's padded tensors.
    Per-step predict tolerance is 5e-3: the regularised variances sit at
    ~1e-3, so the Mahalanobis term amplifies fp32 rounding ~1000×
    (measured trajectory noise ≤ ~1e-3 on this stream; a split-placement
    mismatch shows up at ~0.3, two orders of magnitude above it)."""
    text = _text_anchors(34)
    steps = 40
    feats, gammas = _adaptive_stream(text, steps, 2)
    sigma_init, threshold, min_count, interval, max_modes = \
        0.01, 0.08, 2.0, 5, 4

    theirs = ref.adaptive.DOTA_mix_adaptive(
        {"epsilon": EPS, "sigma": sigma_init}, D, K,
        torch.tensor(text).T, max_modes=max_modes,
        split_threshold=threshold, min_count_to_split=min_count,
        split_check_interval=interval)
    ours = our_adaptive.init(EPS, sigma_init, D, K, jnp.asarray(text).T,
                             max_modes=max_modes)

    for t in range(steps):
        x_t, g_t = torch.tensor(feats[t]), torch.tensor(gammas[t])
        pred_theirs = theirs.predict(x_t).numpy()
        pred_ours = np.asarray(our_adaptive.predict(
            ours, jnp.asarray(feats[t]), EPS))
        np.testing.assert_allclose(pred_ours, pred_theirs,
                                   rtol=5e-3, atol=5e-3, err_msg=f"step {t}")
        theirs.fit(x_t, g_t)
        ours = our_adaptive.fit(
            ours, jnp.asarray(feats[t]), jnp.asarray(gammas[t]), EPS,
            split_threshold=threshold, min_count_to_split=min_count,
            split_check_interval=interval)

    # splits must actually have happened, or this test proves less than
    # it claims
    their_stats = theirs.get_mode_stats()
    our_stats = our_adaptive.get_mode_stats(ours)
    assert their_stats["total"] > K, "stream never triggered a split"
    assert our_stats["per_class"] == their_stats["per_class"]

    # slot-level padded-state parity over the reference's padded width
    mask_ref = theirs.mask.numpy()                      # (K, M_ref)
    m_ref = mask_ref.shape[1]
    mask_ours = np.asarray(ours.mask)
    np.testing.assert_array_equal(mask_ours[:, :m_ref], mask_ref)
    assert not mask_ours[:, m_ref:].any()

    for name, our_arr, their_arr in [
            ("mu", ours.mu, theirs.mu_pad), ("var", ours.var, theirs.var_pad),
            ("pi", ours.pi, theirs.pi_pad), ("c", ours.c, theirs.c_pad)]:
        o = np.asarray(our_arr)[:, :m_ref]
        r = their_arr.numpy()
        sel = mask_ref if o.ndim == 2 else np.broadcast_to(
            mask_ref[..., None], o.shape)
        np.testing.assert_allclose(o[sel], r[sel], rtol=1e-4, atol=1e-5,
                                   err_msg=name)

    np.testing.assert_allclose(np.asarray(ours.class_counts),
                               theirs.class_counts.numpy(),
                               rtol=1e-5, atol=1e-6)
    assert int(ours.t) == int(theirs.t)
    assert int(ours.fit_calls) == int(theirs.fit_calls)


# ---------------------------------------------------------------------------
# Analysis surface: the reference's ACTUAL hook-based AttentionExtractor
# (extract_attention.py:34-318) vs our functional return_attn path
# ---------------------------------------------------------------------------

ADIM, AHEADS, AHID, ADEPTH, ATOK = 32, 4, 24, 2, 9


class _EvaSeparateTwin(torch.nn.Module):
    """Torch twin of an EVA02 trunk in timm's SEPARATE q/k/v naming — the
    layout the reference hook's EVA branch introspects
    (extract_attention.py:128-160: q_proj/k_proj, head-level q_norm/k_norm,
    module `scale`), shaped `visual.blocks.*` so AttentionExtractor wires
    itself exactly as it does onto Uni3D."""

    def __init__(self):
        super().__init__()
        tnn = torch.nn
        hd = ADIM // AHEADS

        class A(tnn.Module):
            def __init__(self):
                super().__init__()
                self.num_heads = AHEADS
                self.scale = hd ** -0.5
                self.q_proj = tnn.Linear(ADIM, ADIM, bias=True)
                self.k_proj = tnn.Linear(ADIM, ADIM, bias=False)
                self.v_proj = tnn.Linear(ADIM, ADIM, bias=True)
                self.q_norm = tnn.LayerNorm(hd)
                self.k_norm = tnn.LayerNorm(hd)
                self.proj = tnn.Linear(ADIM, ADIM)

            def forward(self, x):
                B, N, C = x.shape
                sh = (B, N, AHEADS, hd)
                q = self.q_norm(self.q_proj(x).reshape(sh).permute(0, 2, 1, 3))
                k = self.k_norm(self.k_proj(x).reshape(sh).permute(0, 2, 1, 3))
                v = self.v_proj(x).reshape(sh).permute(0, 2, 1, 3)
                attn = torch.softmax(q @ k.transpose(-2, -1) * self.scale, -1)
                return self.proj(
                    (attn @ v).permute(0, 2, 1, 3).reshape(B, N, C))

        class M(tnn.Module):
            def __init__(self):
                super().__init__()
                self.w1 = tnn.Linear(ADIM, AHID)     # gate
                self.w2 = tnn.Linear(ADIM, AHID)     # value
                self.ffn_ln = tnn.LayerNorm(AHID)
                self.w3 = tnn.Linear(AHID, ADIM)

            def forward(self, x):
                return self.w3(self.ffn_ln(
                    torch.nn.functional.silu(self.w1(x)) * self.w2(x)))

        class Block(tnn.Module):
            def __init__(self):
                super().__init__()
                self.norm1 = tnn.LayerNorm(ADIM)
                self.norm2 = tnn.LayerNorm(ADIM)
                self.attn = A()
                self.mlp = M()

            def forward(self, x):
                x = x + self.attn(self.norm1(x))
                return x + self.mlp(self.norm2(x))

        visual = tnn.Module()
        visual.blocks = tnn.ModuleList([Block() for _ in range(ADEPTH)])
        self.visual = visual

    def forward(self, x):
        for blk in self.visual.blocks:
            x = blk(x)
        return x


def test_attention_maps_match_reference_hook_extractor(ref):
    """Per-layer (B, H, N, N) attention maps from the reference's ACTUAL
    `AttentionExtractor._attention_hook_with_save` (extract_attention.py:
    118-177 — the EVA branch that recomputes q/k from the module's own
    projections, applies q_norm/k_norm, scales and softmaxes) vs our
    `return_attn` functional extraction (models/common.py EvaAttention),
    on identical weights (converted by models/loader) and identical token
    inputs.  This closes the last transcription gap on the analysis
    surface: analysis/attention.py was previously verified only against
    our own blocks."""
    import flax.linen as fnn

    from uni_adapter_tpu.models.common import EvaBlock
    from uni_adapter_tpu.models.loader import (convert_state_dict,
                                               overlay_params)

    torch.manual_seed(3)
    twin = _EvaSeparateTwin().eval()
    x = np.random.default_rng(5).standard_normal(
        (2, ATOK, ADIM)).astype(np.float32)

    extractor = ref.extract_attention.AttentionExtractor(twin, device="cpu")
    assert extractor.num_layers == ADEPTH
    assert extractor.num_heads == AHEADS
    extractor.register_hooks()
    try:
        with torch.no_grad():
            twin(torch.tensor(x))
        # copy before remove_hooks(): it resets attention_maps (:192-197)
        their_maps = dict(extractor.attention_maps)
    finally:
        extractor.remove_hooks()
    assert set(their_maps) == {f"layer_{i}" for i in range(ADEPTH)}

    class _EvaTrunk(fnn.Module):
        @fnn.compact
        def __call__(self, t, return_attn=False):
            attns = []
            for i in range(ADEPTH):
                t = EvaBlock(ADIM, AHEADS, mlp_ratio=AHID / ADIM,
                             dtype=jnp.float32, name=f"blocks_{i}")(
                    t, return_attn=return_attn)
                if return_attn:
                    t, a = t
                    attns.append(a)
            return (t, attns) if return_attn else t

    model = _EvaTrunk()
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    sd = {k: v.numpy() for k, v in twin.state_dict().items()}
    params = overlay_params(params, convert_state_dict(sd), strict=True)

    out, our_attns = model.apply(params, jnp.asarray(x), return_attn=True)
    with torch.no_grad():
        their_out = twin(torch.tensor(x)).numpy()
    np.testing.assert_allclose(np.asarray(out), their_out,
                               rtol=2e-4, atol=2e-4)
    for i in range(ADEPTH):
        theirs = their_maps[f"layer_{i}"].numpy()
        ours = np.asarray(our_attns[i])
        assert theirs.shape == ours.shape == (2, AHEADS, ATOK, ATOK)
        np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=2e-5,
                                   err_msg=f"layer {i}")


def test_cross_class_analysis_math_matches_reference(ref):
    """Our cross-class analysis math vs the reference's ACTUAL
    CrossClassAttentionAnalyzer methods (cross_class_attention_analysis.py:
    175-314) on identical centroid sets: cosine distance matrices,
    nearest-neighbour structure and flip sets, top-confused-pair ranking,
    and the summary statistics.  The reference's math methods never touch
    self.model, so the instance is created without its __init__ (which
    wants a loaded torch model)."""
    from uni_adapter_tpu.analysis import cross_class as our_cc

    rng = np.random.default_rng(17)
    Kc, G = 9, 33
    clean = rng.standard_normal((Kc, G))
    corr = clean + 0.3 * rng.standard_normal((Kc, G))
    names = [f"class_{i}" for i in range(Kc)]

    RefCls = ref.cross_class.CrossClassAttentionAnalyzer
    ran = RefCls.__new__(RefCls)
    d_clean_ref = ran.compute_distance_matrix(clean, "cosine")
    d_corr_ref = ran.compute_distance_matrix(corr, "cosine")
    conf_ref = ran.analyze_confusion(d_clean_ref, d_corr_ref, names,
                                     top_k=5)

    # distance matrices (ours is the vectorised form of the ref loop)
    np.testing.assert_allclose(our_cc._cosine_distance_matrix(clean),
                               d_clean_ref, rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(our_cc._cosine_distance_matrix(corr),
                               d_corr_ref, rtol=1e-9, atol=1e-9)

    # centroid math: ref's dict-of-lists mean == plain per-class mean
    vecs = {k: [rng.standard_normal(G) for _ in range(k % 3 + 1)]
            for k in range(Kc)}
    cent_ref = ran.compute_class_centroids(vecs)
    cent_np = np.stack([np.array(vecs[k]).mean(0) for k in range(Kc)])
    np.testing.assert_allclose(cent_ref, cent_np, rtol=1e-12, atol=1e-12)

    # nearest-neighbour structure + flips
    ours_an = our_cc.CrossClassAttentionAnalyzer.__new__(
        our_cc.CrossClassAttentionAnalyzer)
    ours_an.class_names = names
    conf_ours = ours_an.confusion_analysis(clean, corr)
    ref_nn_clean = [m["clean_nearest_idx"] for m in
                    conf_ref["class_movement"]]
    ref_nn_corr = [m["corrupted_nearest_idx"] for m in
                   conf_ref["class_movement"]]
    assert conf_ours["nn_clean"] == ref_nn_clean
    assert conf_ours["nn_corrupted"] == ref_nn_corr
    assert conf_ours["n_flips"] == conf_ref["neighbor_change_count"]
    assert ({f["class"] for f in conf_ours["flips"]}
            == {m["class"] for m in conf_ref["class_movement"]
                if m["neighbor_changed"]})

    # top-confused-pair ranking + summary stats
    mats = ours_an.distance_matrices(clean, corr)
    top_ours = our_cc.top_confused_pairs(mats, names, top_k=5)
    for po, pr in zip(top_ours["top_confused_pairs"],
                      conf_ref["top_confused_pairs"]):
        assert (po["class_i_idx"], po["class_j_idx"]) \
            == (pr["class_i_idx"], pr["class_j_idx"])
        np.testing.assert_allclose(po["distance_change"],
                                   pr["distance_change"], rtol=1e-9)
    np.testing.assert_allclose(top_ours["mean_distance_change"],
                               conf_ref["mean_distance_change"], rtol=1e-9)
    np.testing.assert_allclose(
        top_ours["neighbor_change_ratio"],
        conf_ref["neighbor_change_ratio"], rtol=1e-12)


def test_ulip_encoder_activations_match_reference_model(ref):
    """Our ULIP Point-BERT vs the reference's ACTUAL model code
    (models/ulip/ulip_model.py:7-19 + pointbert/point_encoder.py:11-193 +
    dvae.py Group/Encoder) as the activation oracle: the reference model is
    instantiated with random weights, its state_dict converted by
    models/loader (strict overlay — every leaf claimed), and both forwards
    run on the same cloud.  This is deeper than the converter-twin tests
    (which compare against OUR re-implementations of the published
    layouts): here the reference's own Group/FPS/kNN, mini-PointNet,
    pos-re-added-every-block transformer, and projection produce the
    expected embedding.

    Environment shim: the reference's pure-torch FPS seeds its first
    centroid with torch.randint (misc.py:52); our FPS starts at index 0
    (the pointnet2_ops CUDA convention, ops/geometry.py:21-22).  randint
    is patched to 0 so both sides share a start convention — SURVEY §7
    hard-part 1: accuracy parity tolerates either convention, bitwise
    trajectory comparison needs one of them."""
    ulip_model = importlib.import_module("models.ulip.ulip_model")

    args = SimpleNamespace(pc_feat_dim=64, pc_depth=2, drop_path_rate=0.0,
                           num_head=4, group_size=8, num_group=4,
                           encoder_dim=16)
    torch.manual_seed(11)
    theirs = ulip_model.ULIP(args).eval()
    # randn-init the projection (reference leaves torch.empty uninitialised
    # — load-time only; garbage values would poison the comparison)
    with torch.no_grad():
        theirs.pc_projection.normal_(0.0, 0.02)

    pts = np.random.default_rng(13).standard_normal(
        (2, 64, 3)).astype(np.float32)

    mp = pytest.MonkeyPatch()
    mp.setattr(torch, "randint",
               lambda low, high, size, **kw: torch.zeros(
                   size, dtype=kw.get("dtype", torch.int64)))
    try:
        with torch.no_grad():
            want = theirs(torch.tensor(pts)).numpy()
    finally:
        mp.undo()

    from uni_adapter_tpu.models.loader import (convert_state_dict,
                                               overlay_params)
    from uni_adapter_tpu.models.pointbert import ULIP as OurULIP

    model = OurULIP(trans_dim=32, depth=2, num_heads=4, num_group=4,
                    group_size=8, encoder_dim=16, embed_dim=512,
                    dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(pts))
    sd = {k: v.numpy() for k, v in theirs.state_dict().items()}
    params = overlay_params(params, convert_state_dict(sd), strict=True)
    ours = np.asarray(model.apply(params, jnp.asarray(pts)))

    assert ours.shape == want.shape == (2, 512)
    np.testing.assert_allclose(ours, want, rtol=2e-4, atol=2e-4)


def test_openshape_encoder_activations_match_reference_model(ref):
    """Our OpenShape PPTA vs the reference's ACTUAL model code
    (models/openshape/ppta.py:10-155 + pointnet_util.py set abstraction)
    as the activation oracle, rel-PE path on.  Unlike the converter-twin
    test (which feeds PRE-GROUPED tensors to our re-implementation of the
    layout), this drives the reference's own FPS → ball-query →
    sample_and_group → SA convs → lift → CLS/zero-centroid prepend →
    rel-PE transformer → projection end to end on a raw cloud.

    Environment shims: torch.randint → 0 aligns the FPS start convention
    (pointnet_util.py:77 vs our CUDA-convention index 0); the
    torch_redstone stub gains the TWO pieces ppta uses — `Lambda` (a
    module wrapping a function) and `supercat` (broadcast-then-concat;
    at both call sites, ppta.py:119-120, the shapes admit exactly one
    reading: prepend the CLS token / a zero centroid column)."""
    rst = sys.modules["torch_redstone"]

    class _Lambda(torch.nn.Module):
        def __init__(self, fn):
            super().__init__()
            self.fn = fn

        def forward(self, x):
            return self.fn(x)

    def _supercat(tensors, dim=-1):
        nd = max(t.dim() for t in tensors)
        ts = [t.reshape((1,) * (nd - t.dim()) + tuple(t.shape))
              for t in tensors]
        d = dim % nd
        tgt = [max(t.shape[ax] for t in ts) for ax in range(nd)]
        ts = [t.expand(*[t.shape[ax] if ax == d else tgt[ax]
                         for ax in range(nd)]) for t in ts]
        return torch.cat(ts, dim=d)

    rst.Lambda, rst.supercat = _Lambda, _supercat
    ppta_mod = importlib.import_module("models.openshape.ppta")

    dim, depth, heads, mlp_dim, sa_dim = 32, 2, 4, 48, 24
    patches, prad, nsamp, out = 8, 0.35, 16, 40
    torch.manual_seed(5)
    ppat = ppta_mod.PointPatchTransformer(
        "global", None, dim, depth, heads, mlp_dim, sa_dim, patches, prad,
        nsamp, in_dim=6, dim_head=64, rel_pe=True)
    theirs = ppta_mod.Projected("global", ppat,
                                torch.nn.Linear(dim, out)).eval()

    rng = np.random.default_rng(23)
    xyz = rng.standard_normal((2, 64, 3)).astype(np.float32)
    feats = np.concatenate(
        [xyz, rng.standard_normal((2, 64, 3)).astype(np.float32)], axis=-1)

    mp = pytest.MonkeyPatch()
    mp.setattr(torch, "randint",
               lambda low, high, size, **kw: torch.zeros(
                   size, dtype=kw.get("dtype", torch.int64)))
    try:
        with torch.no_grad():
            want = theirs(torch.tensor(xyz), torch.tensor(feats)).numpy()
    finally:
        mp.undo()

    from uni_adapter_tpu.models import ppta as our_ppta
    from uni_adapter_tpu.models.loader import (convert_state_dict,
                                               overlay_params)

    preset = our_ppta.PPTAPreset(dim=dim, depth=depth, heads=heads,
                                 mlp_dim=mlp_dim, sa_dim=sa_dim,
                                 patches=patches, prad=prad, nsamp=nsamp)
    model = our_ppta.Projected(preset, out_channel=out, in_dim=6,
                               rel_pe=True, dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(xyz),
                        jnp.asarray(feats))
    sd = {k: v.numpy() for k, v in theirs.state_dict().items()}
    params = overlay_params(params, convert_state_dict(sd), strict=True)
    ours = np.asarray(model.apply(params, jnp.asarray(xyz),
                                  jnp.asarray(feats)))

    assert ours.shape == want.shape == (2, out)
    np.testing.assert_allclose(ours, want, rtol=2e-4, atol=2e-4)


def test_datasets_match_reference(ref, tmp_path):
    """Our dataset loaders vs the reference's ACTUAL Dataset classes
    (data/tta_datasets.py:102-271) on synthetic corruption files, item by
    item — including the ScanObjectNN (1, T) label-shape workaround
    (:154-166), the 'clean' → data_original.npy special case (:20-24),
    the debug 5-sample slice, and the rgb=ones convention."""
    from uni_adapter_tpu.data import datasets as our_ds

    rng = np.random.default_rng(41)

    def write(root, n, label_shape, corruption="uniform"):
        root.mkdir()
        data = rng.standard_normal((n, 32, 3)).astype(np.float32)
        labels = rng.integers(0, 15, (n,)).astype(np.int64)
        fname = ("data_original.npy" if corruption == "clean"
                 else f"{corruption}.npy" if "mixed_corruptions" in corruption
                 else f"data_{corruption}_5.npy")
        lname = ("mixed_corruptions_labels.npy"
                 if "mixed_corruptions" in corruption else "label.npy")
        np.save(root / fname, data)
        np.save(root / lname, labels.reshape(label_shape))
        return data, labels

    cases = [
        # (ref class, ours fn, label storage shape, corruption, debug)
        (ref.tta_datasets.ModelNet40C, our_ds.modelnet40_c,
         (-1,), "uniform", False),
        (ref.tta_datasets.ScanObjectNN_C, our_ds.scanobjectnn_c,
         (1, -1), "uniform", False),          # the (1, T) quirk
        (ref.tta_datasets.ShapeNetC2, our_ds.shapenetcore_c,
         (-1, 1), "uniform", False),          # the (T, 1) variant
        (ref.tta_datasets.ModelNet40C, our_ds.modelnet40_c,
         (-1,), "clean", False),              # data_original.npy path
        (ref.tta_datasets.ModelNet40C, our_ds.modelnet40_c,
         (-1,), "uniform", True),             # debug 5-sample slice
        (ref.tta_datasets.ModelNet40C, our_ds.modelnet40_c,
         (-1,), "mixed_corruptions_test", False),  # {corr}.npy +
        # mixed_corruptions_labels.npy special case (tta_datasets.py:23-26)
    ]
    for i, (ref_cls, our_fn, lshape, corruption, debug) in enumerate(cases):
        root = tmp_path / f"case{i}"
        write(root, 8, lshape, corruption)
        args = SimpleNamespace(corruption=corruption, severity=5,
                               debug=debug)
        theirs = ref_cls(args, str(root))
        ours = our_fn(str(root), corruption, severity=5, debug=debug)
        assert len(ours) == len(theirs)
        for j in range(len(theirs)):
            pc_t, lab_t, name_t, rgb_t = theirs[j]
            pc_o, lab_o, name_o, rgb_o = ours[j]
            np.testing.assert_array_equal(pc_o, np.asarray(pc_t))
            assert int(lab_o) == int(lab_t)
            assert name_o == name_t
            np.testing.assert_array_equal(rgb_o, rgb_t.numpy())


def test_tokenizer_matches_reference(ref):
    """Our functional BPE tokenizer vs the reference's ACTUAL
    SimpleTokenizer (utils/tokenizer.py:64-151, the CLIP BPE with the
    in-repo vocab): identical 77-context token ids for every class name of
    all three benchmarks formatted into prompt templates, plus edge cases
    (multi-word names, punctuation, over-length truncation)."""
    import json

    from uni_adapter_tpu.utils.tokenizer import tokenize as our_tokenize

    assets = "/root/repo/uni_adapter_tpu/assets"
    with open(f"{assets}/labels.json") as f:
        labels = json.load(f)
    with open(f"{assets}/templates.json") as f:
        templates = json.load(f)
    tkey = next(iter(templates))
    texts = []
    for key in ("modelnet40_openshape", "scanobjnn_openshape",
                "shapenet_openshape"):
        for name in labels[key]:
            for tpl in templates[tkey][:3]:
                texts.append(tpl.format(name))
    texts += [
        "a point cloud depicting a flower_pot, with commas, and CAPS.",
        "word " * 120,                       # truncation past 77 tokens
        "night_stand vs tv_stand!!",
    ]

    theirs = ref.tokenizer.SimpleTokenizer()(texts).numpy()
    ours = np.asarray(our_tokenize(texts))
    assert ours.shape == theirs.shape == (len(texts), 77)
    np.testing.assert_array_equal(ours, theirs)


def test_metrics_and_dispatch_match_reference(ref, tmp_path):
    """Our topk metrics and dataset dispatch vs the reference's ACTUAL
    `accuracy` (utils/utils.py:154-167) and `load_tta_dataset`
    (data/data_utils.py:5-26): per-k accuracies on random logits, the
    AverageMeter running-average protocol, and the name-substring dispatch
    choosing identical dataset contents."""
    utils_mod = importlib.import_module("utils.utils")
    data_utils = importlib.import_module("data.data_utils")

    from uni_adapter_tpu.data import datasets as our_ds
    from uni_adapter_tpu.utils import metrics as our_metrics

    rng = np.random.default_rng(29)
    logits = rng.standard_normal((32, 15)).astype(np.float32)
    target = rng.integers(0, 15, (32,)).astype(np.int64)
    (acc_ref, _) = utils_mod.accuracy(torch.tensor(logits),
                                      torch.tensor(target), topk=(1, 3, 5))
    counts = np.asarray(our_metrics.topk_correct(
        jnp.asarray(logits), jnp.asarray(target), (1, 3, 5)))
    acc_ours = counts * 100.0 / 32
    np.testing.assert_allclose(acc_ours,
                               [float(a) for a in acc_ref], rtol=1e-6)

    m_ref = utils_mod.AverageMeter("acc", ":6.2f")
    m_ours = our_metrics.AverageMeter("acc", ":6.2f")
    for v, n in [(3.0, 2), (7.5, 1), (0.25, 4)]:
        m_ref.update(v, n)
        m_ours.update(v, n)
    assert m_ours.avg == pytest.approx(m_ref.avg)
    assert m_ours.count == m_ref.count and m_ours.sum == m_ref.sum

    root = tmp_path / "dispatch"
    root.mkdir()
    data = rng.standard_normal((4, 16, 3)).astype(np.float32)
    np.save(root / "data_uniform_5.npy", data)
    np.save(root / "label.npy", rng.integers(0, 15, (4,)).astype(np.int64))
    args = SimpleNamespace(myroot=str(root), dataset_name="scanobject_c",
                           corruption="uniform", severity=5, debug=False)
    theirs = data_utils.load_tta_dataset(args)
    cfg = SimpleNamespace(data=SimpleNamespace(
        dataset_name="scanobject_c", root=str(root), corruption="uniform",
        severity=5, debug=False))
    ours = our_ds.load_tta_dataset(cfg)
    assert type(theirs).__name__ == "ScanObjectNN_C"
    assert ours.class_names[theirs[0][1]] == theirs[0][2]
    for j in range(len(theirs)):
        np.testing.assert_array_equal(ours[j][0], np.asarray(theirs[j][0]))
        assert ours[j][1] == int(theirs[j][1])
        assert ours[j][2] == theirs[j][2]


def test_uni3d_pointcloud_encoder_matches_reference(ref):
    """The reference's ACTUAL Uni3D PointcloudEncoder
    (models/point_encoder.py:161-223) — its Group with the xyz‖color
    6-channel features (:93-127), mini-PointNet Encoder, encoder2trans /
    CLS+pos / trans2embed plumbing — vs our flax PointcloudEncoder on
    loader-converted weights.

    The timm trunk is a stand-in in timm's FUSED EVA02 naming (the
    converter twin's TimmFusedEvaBlock — the trunk itself is already
    pinned by that twin and by the hook-extractor map parity; what this
    test uniquely anchors is everything AROUND the trunk, which was
    previously transcription-verified only).  pointnet2_ops is shimmed
    with the reference's OWN pure-torch FPS fallback
    (pointnet_util.farthest_point_sample, start aligned to index 0 — the
    CUDA kernel's convention our ops/geometry.py mirrors) and a plain
    torch.gather for gather_operation's (B, C, N) x (B, S) contract."""
    from test_converter_layouts import DIM, HEADS, HID, TimmFusedEvaBlock

    pointnet_util = importlib.import_module("models.openshape.pointnet_util")
    p2u = sys.modules["pointnet2_ops"].pointnet2_utils
    p2u.furthest_point_sample = (
        lambda xyz, n: pointnet_util.farthest_point_sample(xyz, n).int())
    p2u.gather_operation = (
        lambda feat, idx: torch.gather(
            feat, 2, idx.long().unsqueeze(1).expand(-1, feat.shape[1], -1)))
    ref_pe = importlib.import_module("models.point_encoder")

    depth = 2
    torch.manual_seed(21)
    visual = torch.nn.Module()
    visual.pos_drop = torch.nn.Identity()
    visual.blocks = torch.nn.ModuleList(
        [TimmFusedEvaBlock() for _ in range(depth)])
    visual.norm = torch.nn.LayerNorm(DIM)
    visual.fc_norm = torch.nn.LayerNorm(DIM)
    args = SimpleNamespace(pc_feat_dim=DIM, embed_dim=24, group_size=8,
                           num_group=4, pc_encoder_dim=16, patch_dropout=0.0)
    theirs = ref_pe.PointcloudEncoder(visual, args).eval()

    rng = np.random.default_rng(37)
    xyz = rng.standard_normal((2, 64, 3)).astype(np.float32)
    color = rng.random((2, 64, 3)).astype(np.float32)

    mp = pytest.MonkeyPatch()
    mp.setattr(torch, "randint",
               lambda low, high, size, **kw: torch.zeros(
                   size, dtype=kw.get("dtype", torch.int64)))
    try:
        with torch.no_grad():
            want = theirs(torch.tensor(xyz), torch.tensor(color)).numpy()
    finally:
        mp.undo()

    from uni_adapter_tpu.models.loader import (convert_state_dict,
                                               overlay_params)
    from uni_adapter_tpu.models.uni3d import PointcloudEncoder

    model = PointcloudEncoder(trans_dim=DIM, embed_dim=24, num_group=4,
                              group_size=8, encoder_dim=16, depth=depth,
                              num_heads=HEADS, mlp_ratio=HID / DIM,
                              dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(xyz),
                        jnp.asarray(color))
    sd = {k: v.numpy() for k, v in theirs.state_dict().items()}
    params = overlay_params(params, convert_state_dict(sd), strict=True)
    ours = np.asarray(model.apply(params, jnp.asarray(xyz),
                                  jnp.asarray(color)))

    assert ours.shape == want.shape == (2, 24)
    np.testing.assert_allclose(ours, want, rtol=2e-4, atol=2e-4)


def test_driver_loop_matches_reference_main(ref, tmp_path):
    """The reference's ACTUAL CLI driver `main()` (main_test-time.py:25-104)
    vs our main.py, with the per-corruption core stubbed to IDENTICAL fake
    accuracies on both sides: the corruption visit order, the per-corruption
    summary dict, and the logged 'Average Top-1' line must agree — this
    locks the 15-name corruption list, the dict keying, and the mean
    computation against the reference's own driver code rather than a
    transcription of it."""
    import ast
    import importlib.util
    import logging as _logging

    # the repo-root `main` is a re-export shim; patch the implementation
    # module (main.main resolves globals there, not in the shim)
    import uni_adapter_tpu.cli.tta as our_main
    from uni_adapter_tpu import engine as our_engine
    from uni_adapter_tpu.config import CORRUPTIONS
    from uni_adapter_tpu.data import datasets as our_ds_mod

    acc = {c: float((i * 7) % 23) + 0.25 for i, c in enumerate(CORRUPTIONS)}

    class _Capture(_logging.Handler):
        def __init__(self):
            super().__init__(level=_logging.INFO)
            self.lines = []

        def emit(self, record):
            self.lines.append(record.getMessage())

    def summary_from(lines):
        summ = mean = None
        for ln in lines:
            if ln.startswith("Summary of Results: "):
                summ = ast.literal_eval(ln[len("Summary of Results: "):])
            if ln.startswith("Average Top-1: "):
                mean = ln[len("Average Top-1: "):].strip()
        return summ, mean

    # --- the reference's own driver --------------------------------------
    sys.path.insert(0, REF)
    try:
        spec = importlib.util.spec_from_file_location(
            "ref_main_test_time", f"{REF}/main_test-time.py")
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
    finally:
        sys.path.remove(REF)

    ref_order = []

    class _TinyDS(torch.utils.data.Dataset):
        def __len__(self):
            return 1

        def __getitem__(self, i):
            return (np.zeros((16, 3), np.float32), 0, "airplane",
                    np.ones((16, 3), np.float32))

    def fake_core(test_loader, validate_dataset_name, model, clip_model,
                  tokenizer, args, hp):
        ref_order.append(args.corruption)
        a = acc[args.corruption]
        return {"acc1": a, "acc3": a + 1.0, "acc5": a + 2.0}

    mp = pytest.MonkeyPatch()
    out_ref = tmp_path / "refout"
    mp.setattr(mod, "parse_args", lambda: SimpleNamespace(
        name=None, output_dir=str(out_ref), seed=42,
        dataset_name="modelnet", corruption="all", batch_size=1, workers=0,
        validate_dataset_name="modelnet40"))
    mp.setattr(mod, "setup_logging", lambda *a, **k: None)
    mp.setattr(mod, "init_distributed_device",
               lambda args: setattr(args, "rank", 0))
    mp.setattr(mod, "load_vlm_model", lambda args: (None, None))
    mp.setattr(mod, "SimpleTokenizer", lambda: None)
    mp.setattr(mod, "load_tta_dataset", lambda args: _TinyDS())
    mp.setattr(mod, "test_zeroshot_3d_core", fake_core)
    cap_ref = _Capture()
    _logging.getLogger().addHandler(cap_ref)
    _logging.getLogger().setLevel(_logging.INFO)
    try:
        mod.main()
    finally:
        _logging.getLogger().removeHandler(cap_ref)
        mp.undo()
    ref_summary, ref_mean = summary_from(cap_ref.lines)

    # --- our driver on the same fake per-corruption accuracies -----------
    our_order = []

    class _FakeOurDS:
        class_names = ["airplane"]

        def as_arrays(self, batch_size, npoints=1024, seed=0):
            return (np.zeros((1, batch_size, npoints, 3), np.float32),
                    np.ones((1, batch_size, npoints, 3), np.float32),
                    np.zeros((1, batch_size), np.int32))

    def fake_load(cfg):
        return _FakeOurDS()

    def fake_run_stream_scan(cfg, model, params, text, pcs, rgbs, tgts,
                             seed=0, scan_fn=None, initial_state=None):
        our_order.append(cfg.data.corruption)
        return None, cfg.data.corruption

    def fake_summarize(outs, n):
        a = acc[outs]
        return {"acc1": a, "acc3": a + 1.0, "acc5": a + 2.0}

    mp2 = pytest.MonkeyPatch()
    mp2.setattr(our_main, "setup_logging", lambda *a, **k: None)
    mp2.setattr(our_main, "build_model", lambda cfg: (None, None))
    mp2.setattr(our_main, "get_text_anchors_with_fallback", lambda cfg: None)
    mp2.setattr(our_ds_mod, "load_tta_dataset", fake_load)
    mp2.setattr(our_engine, "make_scan_fn",
                lambda cfg, model, **kw: (lambda *a, **k: (None, None)))
    mp2.setattr(our_engine, "run_stream_scan", fake_run_stream_scan)
    mp2.setattr(our_engine, "summarize", fake_summarize)
    cap_ours = _Capture()
    _logging.getLogger().addHandler(cap_ours)
    out_ours = tmp_path / "ourout"
    try:
        results = our_main.main(["--device", "cpu", "--root", str(tmp_path),
                                 "--corruption", "all",
                                 "--output-dir", str(out_ours)])
    finally:
        _logging.getLogger().removeHandler(cap_ours)
        mp2.undo()
    our_summary, our_mean = summary_from(cap_ours.lines)

    # identical visit order, per-corruption dict, and formatted mean
    assert ref_order == list(CORRUPTIONS)
    assert our_order == ref_order
    assert our_summary == ref_summary == {c: acc[c] for c in CORRUPTIONS}
    assert results == ref_summary
    assert our_mean == ref_mean
