"""Test harness config: run on a virtual 8-device CPU platform so sharding
paths are exercised without TPU hardware (the driver separately dry-runs the
multi-chip path; see __graft_entry__.py).

NOTE: this environment preloads jax at interpreter startup (sitecustomize)
with the 'axon' TPU-tunnel platform, so env vars alone are too late —
jax.config.update must run before the first backend-initializing op.
"""

import os

os.environ.setdefault("JAX_ENABLE_X64", "0")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
