"""Multi-host process bootstrap.

Rebuild of the reference's distributed initialisation
(utils/distributed.py:5-107 `init_distributed_device` /
`world_info_from_env`): rank/world discovery from the launcher environment
and process-group setup.  On TPU the jax runtime does the heavy lifting —
`jax.distributed.initialize()` auto-discovers TPU pod topology; for CPU/GPU
fleets the same env conventions the reference reads (RANK / WORLD_SIZE /
MASTER_ADDR, SLURM_PROCID/NTASKS, OMPI_COMM_WORLD_*) are honoured.

The DeepSpeed ZeRO config generator that shares the reference file
(utils/distributed.py:109-256) is dead code at TTA (SURVEY.md §2.3) and is
intentionally not reproduced — inference has no optimizer state to shard.
"""
from __future__ import annotations

import logging
import os
from typing import Optional, Tuple

import jax


def world_info_from_env() -> Tuple[int, int, int]:
    """(local_rank, global_rank, world_size) from launcher env vars
    (reference utils/distributed.py:45-62 conventions)."""
    for lr, r, w in (
        ("LOCAL_RANK", "RANK", "WORLD_SIZE"),
        ("SLURM_LOCALID", "SLURM_PROCID", "SLURM_NTASKS"),
        ("OMPI_COMM_WORLD_LOCAL_RANK", "OMPI_COMM_WORLD_RANK",
         "OMPI_COMM_WORLD_SIZE"),
    ):
        if r in os.environ and w in os.environ:
            return (int(os.environ.get(lr, 0)), int(os.environ[r]),
                    int(os.environ[w]))
    return 0, 0, 1


def init_distributed_device(coordinator_address: Optional[str] = None) -> dict:
    """Initialise the jax distributed runtime when launched multi-process.

    Single-process runs are a no-op (the reference likewise skips
    init_process_group when WORLD_SIZE ≤ 1, utils/distributed.py:65-107).
    Returns a dict with rank/world metadata.
    """
    local_rank, rank, world = world_info_from_env()
    # IMPORTANT: do not touch the backend (jax.process_count/jax.devices)
    # before initialize() — backend init makes initialize() illegal.
    if world > 1 and not jax.distributed.is_initialized():
        addr = coordinator_address or os.environ.get(
            "MASTER_ADDR", "127.0.0.1")
        port = os.environ.get("MASTER_PORT", "1234")
        jax.distributed.initialize(
            coordinator_address=f"{addr}:{port}",
            num_processes=world, process_id=rank)
        logging.info("jax.distributed initialised: process %d/%d", rank, world)
    return {
        "local_rank": local_rank,
        "rank": jax.process_index(),
        "world_size": jax.process_count(),
        "distributed": jax.process_count() > 1,
        "device_count": jax.device_count(),
    }
