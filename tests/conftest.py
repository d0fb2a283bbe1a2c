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

# Persistent compilation cache: repeat test runs skip XLA recompiles (the
# suite is compile-bound on CPU — ref CI splits its jobs for the same
# reason, /root/reference/.github/workflows/ci.yml:99-133).
_cache_dir = os.environ.get(
    "BEVY_TPU_TEST_CACHE",
    os.path.join(os.path.dirname(__file__), "..", ".jax_test_cache"))
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_cache_dir))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)


# ---- tiering: `pytest -m smoke` is the bounded-time tier ----
# Everything is smoke unless its file appears here (heavy XLA compiles).
_FULL_TIER_FILES = {
    "test_meshlet_lod.py",       # >9 min of compile on CPU
    "test_sharded_cubes.py",     # 8-device mesh at scale
    "test_sharded_hlo.py",       # benchmark-scale SPMD compile
    "test_multihost.py",         # 2× jax.distributed subprocesses (~90s)
    "test_sharded_shade.py",
    "test_sharded_raster.py",
    "test_solari.py",            # ReSTIR DI+GI compiles
    "test_pathtracer.py",
    "test_occlusion.py",         # two-phase hi-z
    "test_visbuf.py",
    "test_splat.py",
    "test_examples_smoke.py",    # builds every example app
    "test_bevymark.py",
    "test_combinations.py",
    "test_oit.py",
    "test_ssr.py",
    "test_atmosphere.py",
    "test_volume_transmission.py",
    "test_transmission.py",
}


def pytest_collection_modifyitems(config, items):
    import pytest
    for item in items:
        fname = os.path.basename(str(item.fspath))
        if fname in _FULL_TIER_FILES:
            item.add_marker(pytest.mark.full)
        else:
            item.add_marker(pytest.mark.smoke)
