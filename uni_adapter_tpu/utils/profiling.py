"""Profiling / tracing utilities.

Rebuild of SURVEY.md §5.1: the reference measures per-batch wall time with
paired cuda events (Uni_Adapter.py:365-380,577-579) and has no real
profiler.  TPU equivalents:

  * `fetch_synced_time` — wall-clock around a function with a device→host
    fetch of a small output as the synchronisation point.  On tunneled
    devices `block_until_ready` can acknowledge dispatch before execution
    finishes; only a fetch is a true barrier (measured on the v5e tunnel:
    block_until_ready reported 0.42 ms for a forward whose FLOPs alone
    exceed the chip's peak for that budget).
  * `trace` — context manager around jax.profiler for real XLA traces.
"""
from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax
import numpy as np


def fetch_sync(out, sync_leaf=None) -> None:
    """Device→host fetch of a small output leaf — the only true execution
    barrier on tunneled devices (see module docstring).  The single home of
    the barrier idiom, shared with utils.metrics.DeviceTimer.

    Args:
      sync_leaf: callable mapping the output pytree to a SMALL array to
        fetch (default: its first leaf).
    """
    leaf = sync_leaf(out) if sync_leaf else jax.tree.leaves(out)[0]
    np.asarray(jax.device_get(leaf))


def fetch_synced_time(fn: Callable, *args, sync_leaf=None, repeats: int = 1,
                      **kwargs):
    """Run fn and time it with a fetch-based sync.

    Args:
      sync_leaf: callable mapping fn's output to a SMALL array to fetch as
        the barrier (default: first leaf of the output pytree).
    Returns:
      (last_output, seconds_per_call)
    """
    out = fn(*args, **kwargs)           # warm (compile) — not timed
    fetch_sync(out, sync_leaf)

    t0 = time.perf_counter()
    for _ in range(repeats):
        out = fn(*args, **kwargs)
    fetch_sync(out, sync_leaf)
    return out, (time.perf_counter() - t0) / repeats


@contextlib.contextmanager
def trace(log_dir: str):
    """XLA profiler trace context (view with tensorboard / xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def enable_compile_cache(root_dir: str | None = None) -> None:
    """Persistent XLA compile cache under <root_dir>/.jax_cache (default:
    the repo root for an in-tree checkout, else ~/.cache/uni_adapter_tpu
    for an installed wheel): the first run of a config pays the ~25 s trunk
    compile once; every later process reuses it.  Shared by the CLIs and
    bench.py."""
    import os

    root = root_dir
    if root is None:
        # package parent == repo root only for an in-tree checkout; an
        # installed package must not write into site-packages
        pkg_parent = os.path.dirname(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))))
        if (os.path.isdir(os.path.join(pkg_parent, ".git"))
                or os.path.isfile(os.path.join(pkg_parent, "pyproject.toml"))):
            root = pkg_parent
        else:
            root = os.path.join(os.path.expanduser("~"), ".cache",
                                "uni_adapter_tpu")
    cache_dir = os.path.join(root, ".jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
