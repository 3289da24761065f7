"""Packaging: the wheel ships the whole framework.

The reference is a research checkout (no setup.py/pyproject —
`/root/reference` top level has only scripts and model dirs); a framework
a reference user can *switch to* must install: `pip install .` carries the
package, the data assets (labels/templates/BPE vocab/text banks — the
benchmark's identity), the C++ data-plane source (compiled on first use,
numpy fallback), and the CLI surface as console scripts.
"""
import subprocess
import sys
import zipfile
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent


def test_root_shims_reexport_cli_modules():
    """`python main.py` / `import main` keep working after the move into
    uni_adapter_tpu.cli (tests + scripts use the root modules)."""
    import cross_class_analysis_cli
    import extract_attention_cli
    import main
    import pretrain

    from uni_adapter_tpu.cli import cross_class, extract_attention, tta
    from uni_adapter_tpu.cli import pretrain as cli_pretrain

    assert main.main is tta.main
    assert main.build_model is tta.build_model
    assert main.get_text_anchors_with_fallback is \
        tta.get_text_anchors_with_fallback
    assert pretrain.main is cli_pretrain.main
    assert pretrain._synthetic_corpus is cli_pretrain._synthetic_corpus
    assert extract_attention_cli.main is extract_attention.main
    assert cross_class_analysis_cli.main is cross_class.main
    # console-script entries return an int exit code (main()'s return
    # value is in-process API — results dict / train state)
    for mod in (tta, cli_pretrain, extract_attention, cross_class):
        assert callable(mod.cli)


def test_console_entry_points_resolve():
    """Every [project.scripts] target imports and is callable."""
    import tomllib

    with open(REPO / "pyproject.toml", "rb") as f:
        scripts = tomllib.load(f)["project"]["scripts"]
    assert len(scripts) == 7
    import importlib

    for name, target in scripts.items():
        mod_name, func_name = target.split(":")
        func = getattr(importlib.import_module(mod_name), func_name)
        assert callable(func), (name, target)


@pytest.mark.slow
def test_wheel_contains_framework(tmp_path):
    """Build the wheel (no network, no build isolation) and check it
    carries sources + assets + native cpp + entry points, and does NOT
    ship a machine-built .so."""
    out = tmp_path / "wheels"
    subprocess.run(
        [sys.executable, "-m", "pip", "wheel", "--no-deps",
         "--no-build-isolation", "--no-index", "-w", str(out), str(REPO)],
        check=True, capture_output=True, timeout=600)
    wheels = list(out.glob("uni_adapter_tpu-*.whl"))
    assert len(wheels) == 1, list(out.iterdir())
    z = zipfile.ZipFile(wheels[0])
    names = set(z.namelist())
    for required in [
            "uni_adapter_tpu/engine.py",
            "uni_adapter_tpu/cli/tta.py",
            "uni_adapter_tpu/cli/pretrain.py",
            "uni_adapter_tpu/assets/labels.json",
            "uni_adapter_tpu/assets/templates.json",
            "uni_adapter_tpu/assets/bpe_simple_vocab_16e6.txt.gz",
            "uni_adapter_tpu/assets/text_features/text_features_large.npy",
            "uni_adapter_tpu/native/npy_loader.cpp",
            "uni_adapter_tpu/ops/fps_pallas.py",
            "uni_adapter_tpu/parallel/pp_interleave.py",
    ]:
        assert required in names, required
    assert not any(n.endswith(".so") for n in names), \
        "machine-built artifacts must not ship in the wheel"
    ep = next(n for n in names if n.endswith("entry_points.txt"))
    text = z.read(ep).decode()
    for script in ["uni-adapter-tta", "uni-adapter-pretrain",
                   "uni-adapter-extract-attention", "uni-adapter-cross-class",
                   "uni-adapter-convert-report", "uni-adapter-build-anchors",
                   "uni-adapter-serve"]:
        assert script in text, script
