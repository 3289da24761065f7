"""Repo-root shim for in-tree use (`python extract_attention_cli.py ...`).

The implementation lives in `uni_adapter_tpu.cli.extract_attention`
(console script `uni-adapter-extract-attention`, pyproject.toml).
"""
from uni_adapter_tpu.cli.extract_attention import *  # noqa: F401,F403
from uni_adapter_tpu.cli.extract_attention import cli, main  # noqa: F401

if __name__ == "__main__":
    raise SystemExit(cli())
