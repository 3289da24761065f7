"""Repo-root shim for in-tree use (`python pretrain.py ...`).

The implementation lives in `uni_adapter_tpu.cli.pretrain` (console
script `uni-adapter-pretrain`, pyproject.toml).  Re-exports the module's
public surface plus the synthetic-corpus helper used by tests.
"""
from uni_adapter_tpu.cli.pretrain import *  # noqa: F401,F403
from uni_adapter_tpu.cli.pretrain import (  # noqa: F401
    _synthetic_corpus, cli, main)

if __name__ == "__main__":
    raise SystemExit(cli())
