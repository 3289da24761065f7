"""Repo-root shim for in-tree use (`python cross_class_analysis_cli.py ...`).

The implementation lives in `uni_adapter_tpu.cli.cross_class` (console
script `uni-adapter-cross-class`, pyproject.toml).
"""
from uni_adapter_tpu.cli.cross_class import *  # noqa: F401,F403
from uni_adapter_tpu.cli.cross_class import cli, main  # noqa: F401

if __name__ == "__main__":
    raise SystemExit(cli())
