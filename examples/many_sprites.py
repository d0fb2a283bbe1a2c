"""many_sprites stress test (reference twin:
examples/stress_tests/many_sprites.rs — ~100k sprites in a grid, camera
panning at 1000 u/s; the 2D batching/culling perf workload of BASELINE.md).
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax.numpy as jnp

from bevy_tpu import App, Query, Res, Update, With
from bevy_tpu.ecs.system import system
from bevy_tpu.render import (
    AtlasBuilder, Camera2d, RenderPlugin, Sprite, SpritePlugin, TextureAtlas,
)
from bevy_tpu.render.texture import checkerboard
from bevy_tpu.time import Time, TimePlugin
from bevy_tpu.transform import (
    GlobalTransform, Transform, TransformPlugin, transform_bundle,
)

CAMERA_SPEED = 1000.0  # ref: many_sprites.rs camera move speed


@system
def move_camera(q=Query(Transform, With(Camera2d)), time=Res(Time)):
    """ref: many_sprites.rs move_camera — pan (and slow orbit) the view."""
    t = q.transform.translation
    q.transform.translation = t.at[:, 0].add(CAMERA_SPEED * time.delta)


def build_app(n_sprites=100_000, width=1280, height=720, capacity=None,
              camera_scale=8.0, tile_h=32, tile_w=128, pairs_per_sprite=2,
              max_per_tile=256, max_visible=32768, mode="tile",
              sample_dtype="bf16") -> App:
    cap = capacity or 1
    while cap < n_sprites + 8:
        cap *= 2
    app = App(capacity=cap)
    app.add_plugins(
        TimePlugin(), TransformPlugin(),
        RenderPlugin(width=width, height=height),
        SpritePlugin(tile_h=tile_h, tile_w=tile_w,
                     pairs_per_sprite=pairs_per_sprite,
                     max_per_tile=max_per_tile, max_visible=max_visible,
                     # tile raster wins at this low-overlap profile
                     # (measured r3: tile 14.3 ms vs splat 17.6 at 100k);
                     # bf16 sampling is the GPU-texture-filter precision
                     # class (6px sprites)
                     mode=mode, sample_dtype=sample_dtype))
    app.add_systems(Update, move_camera)

    atlas = AtlasBuilder(64, 64)
    handle = atlas.add(checkerboard(64, 8), "tile", srgb=False)
    app.insert_resource(TextureAtlas.RESOURCE, {"data": atlas.build()})

    app.world.spawn(Camera2d(scale=camera_scale), *transform_bundle())

    # grid (ref: many_sprites.rs — spacing, half offset to center)
    side = int(np.ceil(np.sqrt(n_sprites)))
    spacing = 64.0
    idx = np.arange(n_sprites)
    gx = (idx % side - side / 2) * spacing
    gy = (idx // side - side / 2) * spacing
    xyz = np.stack([gx, gy, (idx % 97).astype(np.float32)], axis=1).astype(np.float32)
    u0, v0 = handle["uv_min"]
    u1, v1 = handle["uv_max"]
    tint = np.stack([
        0.5 + 0.5 * np.sin(idx * 0.01),
        0.5 + 0.5 * np.sin(idx * 0.013 + 2.0),
        0.5 + 0.5 * np.sin(idx * 0.017 + 4.0),
        np.ones(n_sprites),
    ], axis=1).astype(np.float32)
    app.world.spawn_batch([
        Sprite(color=tint, size=(48.0, 48.0), uv_min=(u0, v0), uv_max=(u1, v1),
               tex=handle["tex"]),
        Transform(translation=xyz),
        GlobalTransform(translation=xyz),
    ], n_sprites)
    return app


def main():
    import time as pytime
    import jax

    app = build_app()
    step = jax.jit(app.frame_fn(), donate_argnums=0)
    state = app.world.state
    for _ in range(3):
        state = step(state)
    jax.device_get(state["frame"])  # real sync (see bench.py)
    t0 = pytime.perf_counter()
    n = 30
    for _ in range(n):
        state = step(state)
    jax.device_get(state["frame"])
    ms = (pytime.perf_counter() - t0) / n * 1000.0
    print(f"many_sprites 100k: {ms:.3f} ms/frame")


if __name__ == "__main__":
    main()
