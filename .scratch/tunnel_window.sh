#!/bin/bash
# Pending hardware agenda for the next healthy tunnel window (written
# 2026-08-18 during a full-session outage).  Run items SERIALLY — one TPU
# process at a time, each under timeout (memory: axon-tpu-timing).
set -x
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo

# 0. health check — a fetch-synced matmul; hang == still down, stop here
timeout 120 python -c "
import jax, jax.numpy as jnp, numpy as np
x = jnp.ones((1024,1024), jnp.bfloat16)
print('tunnel OK', float(np.asarray(x@x).sum()))" || exit 1

# 1. device-state anchor (cross-round comparability): ULIP + Uni3D splits
#    should land near 556 / 106 pc/s (BASELINE.md round-3)
BENCH_MULTI=0 BENCH_BACKBONE=ulip timeout 1800 python bench.py
BENCH_MULTI=0 timeout 1800 python bench.py

# 2. the full multi-metric record (what the driver snapshots at round end)
timeout 3600 python bench.py

# 3. opt-in LVIS suite (K=1156 tiers — confirm the round-3 M-split numbers)
BENCH_MULTI=0 BENCH_LVIS=1 timeout 3600 python bench.py

# 4. on-TPU hardware test suite (committed artifact)
UNI_ADAPTER_TPU_TESTS=1 timeout 1800 python -m pytest tests/test_tpu_hardware.py -q

# 5. record everything in BASELINE.md (date + numbers + tunnel state note)
echo "remember: append results to BASELINE.md round-3 section"
