"""Repo-root shim for in-tree use (`python main.py ...`).

The implementation lives in `uni_adapter_tpu.cli.tta` so an installed
wheel ships the driver too (console script `uni-adapter-tta`,
pyproject.toml).  Re-exports the module's public surface for callers
that `import main`.
"""
from uni_adapter_tpu.cli.tta import *  # noqa: F401,F403
from uni_adapter_tpu.cli.tta import cli, main  # noqa: F401

if __name__ == "__main__":
    raise SystemExit(cli())
