"""Metrics: top-k accuracy, streaming meters, throughput timing.

Rebuild of the reference's utils/utils.py:103-167 (AverageMeter,
ProgressMeter, accuracy) with a jit-friendly top-k correctness kernel; the
distributed synchronisation that `scaled_all_reduce` provided
(utils/utils.py:71-84) is a `psum` inside the jitted programs of
parallel/mesh.py (summary counters) and the adapt modules'
`fit(axis_name=...)`.
"""
from __future__ import annotations

import logging
import time
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np


def topk_correct(logits: jax.Array, target: jax.Array,
                 topk: Sequence[int] = (1, 3, 5)) -> jax.Array:
    """Per-k correct counts for one batch.

    Args:
      logits: (B, K); target: (B,) int.
    Returns:
      (len(topk),) float32 — number of samples whose target is within the
      top-k predictions (reference: utils/utils.py:154-167).
    """
    maxk = min(max(topk), logits.shape[-1])             # clamp to K classes
    _, pred = jax.lax.top_k(logits, maxk)               # (B, maxk)
    correct = pred == target[:, None]
    return jnp.stack([correct[:, :min(k, maxk)].any(axis=1).sum()
                      .astype(jnp.float32) for k in topk])


class AverageMeter:
    """Host-side running average (reference utils/utils.py:103-121)."""

    def __init__(self, name: str, fmt: str = ":f"):
        self.name, self.fmt = name, fmt
        self.reset()

    def reset(self):
        self.val = self.sum = self.count = 0.0
        self.avg = 0.0

    def update(self, val: float, n: int = 1):
        self.val = float(val)
        self.sum += float(val) * n
        self.count += n
        self.avg = self.sum / max(self.count, 1)

    def __str__(self):
        return ("{name} {val" + self.fmt + "} ({avg" + self.fmt + "})").format(
            name=self.name, val=self.val, avg=self.avg)


class ProgressMeter:
    """Periodic progress logging (reference utils/utils.py:134-152)."""

    def __init__(self, num_batches: int, meters: list, prefix: str = ""):
        fmt = "{:" + str(len(str(num_batches))) + "d}"
        self.batch_fmtstr = "[" + fmt + "/" + fmt.format(num_batches) + "]"
        self.meters = meters
        self.prefix = prefix

    def display(self, batch: int):
        entries = [self.prefix + self.batch_fmtstr.format(batch)]
        entries += [str(m) for m in self.meters]
        logging.info("\t".join(entries))


class DeviceTimer:
    """Wall-clock timing — the TPU analogue of the reference's paired cuda
    events (Uni_Adapter.py:365-380,577-579).

    Synchronises via a device→host fetch of a small output leaf: on tunneled
    devices `block_until_ready` can acknowledge dispatch before execution
    finishes (see utils/profiling.py), so a fetch is the only true barrier.
    """

    def __init__(self, sync_leaf=None):
        self.times_ms: list[float] = []
        self._sync_leaf = sync_leaf

    def timed(self, fn, *args, **kwargs):
        from uni_adapter_tpu.utils.profiling import fetch_sync

        t0 = time.perf_counter()
        out = fn(*args, **kwargs)
        fetch_sync(out, self._sync_leaf)
        self.times_ms.append((time.perf_counter() - t0) * 1e3)
        return out

    @property
    def total_ms(self) -> float:
        return float(np.sum(self.times_ms))
