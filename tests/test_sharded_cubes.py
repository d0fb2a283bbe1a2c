"""Multi-chip many_cubes end-to-end (ref position: the GPU-driven
preprocessing of bevy_render/src/batching/gpu_preprocessing.rs scaled
past one device): the FULL frame — orbit camera, transform propagation,
instance cull, window-splat raster, flat resolve — runs with the mesh
pass sharded over an 8-device mesh (Mesh3dPlugin(shards=8) →
parallel/raster.py sharded_instance_raster), and the image must be
IDENTICAL to the single-device render."""

import sys
from pathlib import Path

import numpy as np
import jax

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "examples"))


def _render(shards, frames=2):
    from many_cubes import build_app

    # backend pinned on BOTH sides: sharding lives in the pallas path,
    # and "auto" resolves the unsharded build to the xla reference
    # rasterizer on CPU — comparing across rasterizers is not identity
    app = build_app(n_cubes=512, width=256, height=128, capacity=1024,
                    window_budget=8192, cull_budget=None, shards=shards,
                    backend="pallas_interpret")
    app.world.set_resource_field("frame_input", "dt", 1 / 60.0)
    step = jax.jit(app.frame_fn())
    st = app.world.state
    for _ in range(frames):
        st = step(st)
    return np.asarray(jax.device_get(st["res"]["render_target"]["color"]))


def test_sharded_many_cubes_image_identity():
    single = _render(None)
    sharded = _render(8)
    assert single.shape == sharded.shape
    assert np.array_equal(single, sharded), (
        f"max diff {np.abs(single - sharded).max()}")


def test_sharded_path_actually_engages(monkeypatch):
    """Guard against vacuity: the shard_map raster must actually trace
    when shards=N (round 2 found the identity test silently comparing
    the xla fallback to itself when `auto` resolved away from pallas)."""
    import bevy_tpu.parallel.raster as pr
    called = {"n": 0}
    orig = pr.sharded_instance_raster

    def spy(*a, **k):
        called["n"] += 1
        return orig(*a, **k)

    monkeypatch.setattr(pr, "sharded_instance_raster", spy)
    _render(8, frames=1)
    assert called["n"] >= 1
