"""--trunk-parallel on the evaluation CLI (cli/tta.py): the encoder trunk
shards over the virtual 8-device mesh (tensor / pipeline / sequence
parallelism) while the adaptation loop stays replicated.

No reference analogue — the reference is single-GPU (SURVEY.md §2.4); this
wires the beyond-reference parallelism portfolio into the product's front
door.  PP is float-identical to the plain forward (same ops, same order),
so its per-corruption accuracies must EQUAL the replicated run's; TP/SP
reorder reductions (GSPMD all-reduces, ring online-softmax fold), so they
assert a completed, sane run.
"""
import json
import os

import numpy as np
import pytest

import uni_adapter_tpu.cli.tta as tta_cli
from uni_adapter_tpu.config import parse_args

N, B, SAMPLES = 64, 1, 8

_COMMON = [
    "--device", "cpu", "--corruption", "uniform", "--npoints", str(N),
    "--eva-depth", "2", "--pc-feat-dim", "64", "--num-group", "16",
    "--group-size", "8", "--pc-encoder-dim", "32", "--eva-heads", "4",
    "--compute-dtype", "float32", "--precomputed-text-features", "large",
]


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("tp_cli_data")
    rng = np.random.default_rng(0)
    np.save(root / "data_uniform_5.npy",
            rng.standard_normal((SAMPLES, 128, 3)).astype(np.float32))
    np.save(root / "label.npy",
            rng.integers(0, 40, (SAMPLES,)).astype(np.int64))
    return root


def _run(data_root, out, extra):
    return tta_cli.main(_COMMON + ["--root", str(data_root),
                                   "--output-dir", str(out)] + extra)


def test_pp_trunk_matches_replicated_run(data_root, tmp_path):
    """Pipeline-parallel trunk through the CLI == the replicated run,
    accuracy-for-accuracy (PP applies identical floats in identical
    order), and results.json lands."""
    base = _run(data_root, tmp_path / "base", [])
    got = _run(data_root, tmp_path / "pp",
               ["--trunk-parallel", "pp", "--trunk-stages", "2"])
    assert got == base
    runs = os.listdir(tmp_path / "pp")
    with open(tmp_path / "pp" / runs[0] / "results.json") as f:
        assert json.load(f) == {k: float(v) for k, v in got.items()}


def test_pp_interleave_trunk_matches_replicated_run(data_root, tmp_path):
    """interleave=2 picks the 1F1B interleaved executor (pp_interleave.py)
    — depth 4 divides stages(2) x chunks(2), and the schedule applies the
    same floats in the same order, so accuracies must still be EQUAL."""
    depth = ["--eva-depth", "4"]
    base = _run(data_root, tmp_path / "base2", depth)
    got = _run(data_root, tmp_path / "ppi",
               depth + ["--trunk-parallel", "pp", "--trunk-stages", "2",
                        "--pp-interleave", "2"])
    assert got == base


def test_pp_trunk_stages_zero_is_rejected(data_root, tmp_path):
    """--trunk-stages 0 must hit the range guard, not silently fall back
    to an all-device pipeline (falsy-zero)."""
    with pytest.raises(ValueError, match="--trunk-stages 0 must be in"):
        _run(data_root, tmp_path / "pp0",
             ["--trunk-parallel", "pp", "--trunk-stages", "0"])


@pytest.mark.parametrize("mode,extra", [
    # tp: SwiGLU hidden = dim*8/3 must divide by the 8-device model axis
    # (96 -> 256); the default 64 -> 170 triggers the divisibility error
    # asserted below
    ("tp", ["--pc-feat-dim", "96"]),
    ("sp", []),
])
def test_tp_sp_trunk_runs_sane(data_root, tmp_path, mode, extra):
    """TP/SP reorder float reductions, so equality is not contractual on a
    chaotic TTA trajectory with random weights — the contract is a
    completed sharded run with in-range accuracies."""
    got = _run(data_root, tmp_path / mode,
               ["--trunk-parallel", mode] + extra)
    assert set(got) == {"uniform"}
    assert 0.0 <= got["uniform"] <= 100.0


def test_tp_indivisible_dims_get_a_clear_error(data_root, tmp_path):
    """A model whose MLP hidden doesn't divide over the mesh must fail
    with the CLI's actionable message, not a raw device_put error."""
    with pytest.raises(ValueError, match="don't divide over the 8-device"):
        _run(data_root, tmp_path / "tp_bad", ["--trunk-parallel", "tp"])


def test_trunk_parallel_flag_validation():
    with pytest.raises(ValueError, match="expected none, tp, pp, or sp"):
        parse_args(["--trunk-parallel", "zz"])
    with pytest.raises(ValueError, match="cannot compose"):
        parse_args(["--trunk-parallel", "pp", "--dist-mode", "psum"])
    with pytest.raises(ValueError, match="vmap-corruptions"):
        parse_args(["--trunk-parallel", "tp", "--vmap-corruptions", "true"])


def test_pp_trunk_host_iterator_matches(data_root, tmp_path):
    """--scan false (host-iterator path, one jitted step per batch) with a
    pipelined trunk == the replicated host-iterator run."""
    base = _run(data_root, tmp_path / "base3", ["--use-scan", "false"])
    got = _run(data_root, tmp_path / "pph",
               ["--use-scan", "false", "--trunk-parallel", "pp",
                "--trunk-stages", "2"])
    assert got == base
