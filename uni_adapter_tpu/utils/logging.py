"""Logging setup (reference: utils/logger.py:4-26).

Root-logger stream + file handlers with the reference's
`%(asctime)s | %(levelname)s | %(message)s` format; rank-gated so only the
primary process logs under multi-host runs (the TPU rebuild of the
reference's rank-0 print patching, utils/utils.py:14-23).
"""
from __future__ import annotations

import logging
import sys
from typing import Optional


def setup_logging(log_file: Optional[str] = None,
                  level: int = logging.INFO,
                  include_host: bool = False) -> None:
    import jax

    logger = logging.getLogger()
    logger.setLevel(level)
    fmt = "%(asctime)s | %(levelname)s | %(message)s"
    if include_host:
        fmt = f"%(asctime)s | host{jax.process_index()} | %(levelname)s | %(message)s"
    formatter = logging.Formatter(fmt, datefmt="%Y-%m-%d,%H:%M:%S")

    # replace stale handlers on repeated setup (per-corruption runs);
    # close them too or every setup leaks an open log-file descriptor
    for h in list(logger.handlers):
        logger.removeHandler(h)
        h.close()

    if jax.process_index() == 0:
        sh = logging.StreamHandler(sys.stdout)
        sh.setFormatter(formatter)
        logger.addHandler(sh)
        if log_file:
            fh = logging.FileHandler(log_file)
            fh.setFormatter(formatter)
            logger.addHandler(fh)
    else:
        logger.addHandler(logging.NullHandler())
