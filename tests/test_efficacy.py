"""Efficacy north star: test-time adaptation actually IMPROVES accuracy.

Every other accuracy-bearing test in this repo is parity-on-random-weights
(acc ~ chance on both sides).  This file tests the claim the reference
exists for (Uni_Adapter.py:581-595, main_test-time.py:98-101): adapting
online on a corrupted stream beats frozen zero-shot classification — and
that OUR engine reproduces the reference's own gain on the same stream.

The structured stream
---------------------
K classes sit on a ring of angular separation ~DELTA around a base axis in
the encoder's 3-D input space; a deterministic toy encoder (sin → linear
lift → L2-norm, the same twin pair the full-loop parity tests use) maps
them to D-dim features.  Text anchors are the encoder's image of the CLEAN
class means, so clean zero-shot is ~perfect.  The corruption is a coherent
tangential drift: every cluster rotates toward its neighbour by ROT × the
class spacing — the anchors become systematically misplaced while
zero-shot soft labels stay right on average (the recoverable-shift regime
test-time adaptation is designed for).  Per-sample jitter adds decision
noise.  Tight clusters + soft zero-shot probabilities (small DELTA keeps
cosine gaps ~0.02 at the reference's hardcoded 100× logit scale,
Uni_Adapter.py:57) are what let streaming density estimation relocate the
decision boundaries that the frozen anchors miss.

Calibration (CPU, 4 seeds, T=480): pure zero-shot 75-80 %, MODE-DOTA
+4.5 to +12.1 points, cache +7.7 to +12.5 points — the committed
assertions keep ~2 points of slack under the weakest seed measured.

Hyperparameters are the reference's own defaults (utils/params.py:103-111:
epsilon/sigma 1e-4, eta 0.1, rho 0.02, M=4; utils/hyperparams.py:9-16:
shot_capacity 30, beta 150, threshold 0.5, lambda_reg 0.11).

Residual learning runs OFF here: at this toy's D=32/K=8 the reference lr
1e-3 measurably destroys the anchors (64.4/61.3 vs zero-shot 78.1/80.0 on
seeds 17/5 — BELOW the frozen baseline).  Round 5 settled the question at
REALISTIC dims too (K=40, D=512-1024, the sphere-drift stream): the
reference protocol hurts there as well, the reference's own loop agrees,
and an lr sweep found no robust positive regime — see
tests/test_efficacy_residual_realistic.py for the committed result.  Its
CORRECTNESS is pinned elsewhere (the res-on full-loop parity tests in
test_reference_import_oracle.py).
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

REF = "/root/reference"

from uni_adapter_tpu.data.synthetic_stream import (  # noqa: E402
    D,
    K,
    N,
    T,
    ToyEncoder as _JaxToyEncoder,
    make_problem,
    method_config as _config,
    run_adapter,
    zero_shot_acc,
)


class _TorchToyEncoder(torch.nn.Module):
    """Twin for the reference loop (it calls model.eval() / encode_pc)."""

    def __init__(self, W):
        super().__init__()
        self.W = torch.tensor(W)

    def encode_pc(self, feature):
        return torch.sin(feature[:, :, :3]).mean(1) @ self.W


# ---------------------------------------------------------------------------
# Drivers
# ---------------------------------------------------------------------------

run_ours = run_adapter


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


def run_reference(ref, tmp_path, method, text, pcs, targets, W):
    """Drive the reference's own test_zeroshot_3d_core on the stream."""
    feat_path = str(tmp_path / "text.pt")
    torch.save(torch.tensor(text), feat_path)
    args = SimpleNamespace(
        vlm3d="uni3d", device="cpu", use_gmm_dota=False,
        use_dota=False, use_mode_dota=(method == "mode"),
        res_learning=False, mode_M=4,
        dota_epsilon=1e-4, dota_sigma=1e-4, dota_eta=0.1, dota_rho=0.02,
        precomputed_text_features=feat_path, templates_path="",
        labels_path="", template_key="", output_dir=None, print_freq=10000,
        use_new_approximation=True,
    )
    hp = {"shot_capacity": 30, "beta": 150, "threshold": 0.5,
          "lambda_reg": 0.11}
    loader = [
        (torch.tensor(pcs[i]), torch.tensor(targets[i]),
         [f"class_{int(targets[i, 0])}"],
         torch.ones_like(torch.tensor(pcs[i])))
        for i in range(pcs.shape[0])
    ]
    model = _TorchToyEncoder(W)
    mp = pytest.MonkeyPatch()
    try:
        # PRNG alignment: both sides run the noise-augmented double fit
        # with zero noise (torch and JAX draws can't match)
        mp.setattr(torch, "randn_like", lambda t, **k: torch.zeros_like(t))
        result = ref.test_zeroshot_3d_core(loader, "toy", model, None, None,
                                           args, hp)
    finally:
        mp.undo()
    return result


# ---------------------------------------------------------------------------
# Efficacy: our engine
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("seed", [17, 5])
def test_mode_dota_beats_zero_shot(seed):
    """Streaming EM relocates the decision boundaries the drifted anchors
    miss: MODE-DOTA final accuracy clears zero-shot by ≥3 points
    (measured +6.0/+12.1 on these seeds; weakest of 4 calibration seeds
    was +4.5)."""
    pcs, targets, text, W = make_problem(seed)
    zs = zero_shot_acc(pcs, targets, text, W)
    tta, _ = run_ours("mode", text, pcs, targets, W)
    assert 60.0 < zs < 90.0, f"stream mis-calibrated: zs={zs}"
    assert tta >= zs + 3.0, f"MODE-DOTA {tta:.1f} vs zero-shot {zs:.1f}"


@pytest.mark.parametrize("seed", [17, 5])
def test_cache_beats_zero_shot(seed):
    """The prototype cache + graph refinement pools the corrupted clusters
    into prototypes whose affinity readout beats the drifted anchors by
    ≥5 points (measured +7.7/+12.5 on these seeds)."""
    pcs, targets, text, W = make_problem(seed)
    zs = zero_shot_acc(pcs, targets, text, W)
    tta, _ = run_ours("cache", text, pcs, targets, W)
    assert 60.0 < zs < 90.0, f"stream mis-calibrated: zs={zs}"
    assert tta >= zs + 5.0, f"cache {tta:.1f} vs zero-shot {zs:.1f}"


@pytest.mark.parametrize("seed", [17, 5])
def test_gmm_dota_beats_zero_shot(seed):
    """The GMM-DOTA variant (imported nowhere in the reference —
    gmm_dota_adaptation_model.py is dead code there; wired into this
    engine) shows the LARGEST gain of the family on this stream:
    +10.7/+10.2 measured.  Its text-feature μ-init + shrinkage update
    adapt faster than MODE-DOTA's EM here.  Variant survey on the same
    seeds for the record: plain DOTA is ~neutral (+0.2/+0.6 — its μ
    inits from the reference's constant-0.001 matrix, Uni_Adapter.py:
    329-330, so it spends the stream re-learning directions from
    scratch), adaptive-modes slightly degrades (−5.0/−1.2 — M=1 start +
    variance-triggered splits mis-fire on isotropic clusters)."""
    pcs, targets, text, W = make_problem(seed)
    zs = zero_shot_acc(pcs, targets, text, W)
    tta, _ = run_ours("gmm", text, pcs, targets, W)
    assert tta >= zs + 5.0, f"GMM-DOTA {tta:.1f} vs zero-shot {zs:.1f}"


@pytest.mark.parametrize("seed", [17, 5])
def test_continual_beats_fresh_init(seed):
    """The --continual protocol's VALUE (not just its mechanics, which
    tests/test_continual.py covers): carrying the adaptation state from a
    first same-drift segment into the second beats re-initialising — the
    warm mixture skips the cold-start period (measured +3.3/+8.8 on these
    seeds, +1.2 on the weakest calibration seed).  The reference always
    resets per corruption (Uni_Adapter.py:323-361); this is the committed
    evidence that the beyond-reference carry is worth having."""
    pcs, targets, text, W = make_problem(seed)
    half = T // 2
    cfg = _config("mode")
    model = _JaxToyEncoder(W)
    rgbs = np.ones_like(pcs)

    def run(p, r, t, init=None):
        return engine.run_stream_scan(
            cfg, model, {}, jnp.asarray(text), jnp.asarray(p),
            jnp.asarray(r), jnp.asarray(t.astype(np.int32)),
            initial_state=init)

    def acc(outs, t):
        final = np.asarray(outs.final_logits)[:, 0]
        return 100.0 * np.mean(final.argmax(-1) == t[:, 0])

    _, fresh = run(pcs[half:], rgbs[half:], targets[half:])
    warm_state, _ = run(pcs[:half], rgbs[:half], targets[:half])
    _, cont = run(pcs[half:], rgbs[half:], targets[half:], init=warm_state)
    assert acc(cont, targets[half:]) >= acc(fresh, targets[half:]) + 2.0


# ---------------------------------------------------------------------------
# Efficacy parity: the reference's own loop shows the SAME gain
# ---------------------------------------------------------------------------

def test_mode_dota_gain_matches_reference(ref, cpu_cuda_shim, tmp_path):
    """The reference's own test_zeroshot_3d_core (Uni_Adapter.py:272-595)
    on the same stream: (a) its TTA beats zero-shot too — the efficacy is
    the METHOD's, not an artifact of our rebuild; (b) our accuracy equals
    the reference's to within trajectory roundoff."""
    pcs, targets, text, W = make_problem(17)
    zs = zero_shot_acc(pcs, targets, text, W)
    ours, _ = run_ours("mode", text, pcs, targets, W)
    theirs = run_reference(ref, tmp_path, "mode", text, pcs, targets, W)
    assert theirs["acc1"] >= zs + 3.0, \
        f"reference gain vanished: {theirs['acc1']:.1f} vs zs {zs:.1f}"
    assert abs(ours - theirs["acc1"]) <= 1.5, \
        f"gain mismatch: ours {ours:.1f} vs reference {theirs['acc1']:.1f}"


def test_cache_gain_matches_reference(ref, cpu_cuda_shim, tmp_path):
    pcs, targets, text, W = make_problem(17)
    zs = zero_shot_acc(pcs, targets, text, W)
    ours, _ = run_ours("cache", text, pcs, targets, W)
    theirs = run_reference(ref, tmp_path, "cache", text, pcs, targets, W)
    assert theirs["acc1"] >= zs + 5.0, \
        f"reference gain vanished: {theirs['acc1']:.1f} vs zs {zs:.1f}"
    assert abs(ours - theirs["acc1"]) <= 1.5, \
        f"gain mismatch: ours {ours:.1f} vs reference {theirs['acc1']:.1f}"
