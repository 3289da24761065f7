"""Test configuration: run every test on a virtual 8-device CPU mesh.

The TPU-world analogue of a fake backend (SURVEY.md §4): sharding and
collective paths are exercised on host CPU devices so the suite runs
anywhere; the driver separately dry-run-compiles the multi-chip path.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
).strip()
