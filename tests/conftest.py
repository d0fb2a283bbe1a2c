"""Test harness config: run on a virtual 8-device CPU platform so sharding
paths are exercised without TPU hardware (the driver separately dry-runs the
multi-chip path; see __graft_entry__.py). Must set env before jax imports.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
