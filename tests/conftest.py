"""Test configuration: run every test on a virtual 8-device CPU mesh.

The TPU-world analogue of a fake backend (SURVEY.md §4): sharding and
collective paths are exercised on host CPU devices so the suite runs
anywhere; the driver separately dry-run-compiles the multi-chip path.

The axon sitecustomize registers the TPU backend at interpreter start and
pins JAX_PLATFORMS=axon, so the env var alone is not enough — the jax
config must be updated after import, before any backend use.
"""
import os

# UNI_ADAPTER_TPU_TESTS=1 leaves the real backend registered so
# tests/test_tpu_hardware.py can validate the Pallas kernels on actual TPU
# lowering (run that file alone on the TPU host:
#   UNI_ADAPTER_TPU_TESTS=1 PYTHONPATH=/root/repo:/root/.axon_site \
#     python -m pytest tests/test_tpu_hardware.py -q
# ); everything else expects the virtual CPU mesh.
_TPU_MODE = os.environ.get("UNI_ADAPTER_TPU_TESTS") == "1"

if not _TPU_MODE:
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

if not _TPU_MODE:
    jax.config.update("jax_platforms", "cpu")
    assert len(jax.devices()) >= 8, jax.devices()
