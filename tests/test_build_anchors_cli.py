"""uni-adapter-build-anchors: regenerate a precomputed text bank.

The reference's bank path loads shipped .pt tensors and its LVIS bank is
a stripped blob (Uni_Adapter.py:295-316, .MISSING_LARGE_BLOBS:1); the CLI
turns labels.json + templates.json + a text tower into the (K, D) .npy
layout anchors.load_precomputed reads.
"""
import json

import numpy as np

from uni_adapter_tpu.cli import build_anchors


def _write_assets(tmp_path):
    labels = tmp_path / "labels.json"
    templates = tmp_path / "templates.json"
    labels.write_text(json.dumps({"tiny": ["chair", "table", "night_stand"]}))
    templates.write_text(json.dumps(
        {"t2": ["a photo of a {}.", "a point cloud of a {}."]}))
    return str(labels), str(templates)


def test_build_anchors_layout_and_compare(tmp_path, capsys):
    labels, templates = _write_assets(tmp_path)
    out = str(tmp_path / "bank.npy")
    args = ["--text-preset", "ulip", "--labels-key", "tiny",
            "--template-key", "t2", "--labels-path", labels,
            "--templates-path", templates, "--out", out]
    bank = np.asarray(build_anchors.main(args))
    assert bank.shape == (3, 512) and bank.dtype == np.float32
    # rows normalised — the layout the engine's logit path expects
    np.testing.assert_allclose(np.linalg.norm(bank, axis=1), 1.0, atol=1e-5)
    on_disk = np.load(out)
    np.testing.assert_array_equal(on_disk, bank)

    # same seed → identical bank; --compare-to reports exactness as JSON
    build_anchors.main(args + ["--compare-to", out,
                               "--out", str(tmp_path / "bank2.npy")])
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["K"] == 3 and summary["D"] == 512
    assert summary["max_abs_diff"] == 0.0

    # underscores in class names become spaces (reference clip_classifier,
    # Uni_Adapter.py:35): 'night_stand' must tokenize as two words — i.e.
    # differ from the bank built with the raw underscore name
    labels2 = tmp_path / "labels_underscore.json"
    labels2.write_text(json.dumps({"tiny": ["chair", "table", "night stand"]}))
    bank3 = np.asarray(build_anchors.main(
        ["--text-preset", "ulip", "--labels-key", "tiny",
         "--template-key", "t2", "--labels-path", str(labels2),
         "--templates-path", templates,
         "--out", str(tmp_path / "bank3.npy")]))
    np.testing.assert_array_equal(bank3, bank)
