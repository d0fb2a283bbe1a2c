"""Top-down follow camera (reference twin:
examples/camera/2d_top_down_camera.rs — the camera eases toward the
player with exponential smoothing)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax.numpy as jnp

from bevy_tpu import App, Query, Res, Update, With, Without
from bevy_tpu.ecs.component import component
from bevy_tpu.ecs.system import system
from bevy_tpu.render import (
    AtlasBuilder, Camera2d, RenderPlugin, SpritePlugin, TextureAtlas,
)
from bevy_tpu.render.sprite import sprite_from_handle
from bevy_tpu.time import Time, TimePlugin
from bevy_tpu.transform import Transform, TransformPlugin, transform_bundle


@component
class Player:
    pass


def build_app(width=320, height=180):
    app = App(capacity=16)
    app.add_plugins(TimePlugin(), TransformPlugin(),
                    RenderPlugin(width=width, height=height),
                    SpritePlugin())
    app.world.spawn(Camera2d(), *transform_bundle())
    atlas = AtlasBuilder(64, 32)
    tile = np.ones((32, 32, 4), np.float32)
    tile[..., :3] = (0.15, 0.25, 0.2)
    ht = atlas.add(tile, "tile", srgb=False)
    player = np.ones((24, 24, 4), np.float32)
    player[..., :3] = (0.95, 0.8, 0.2)
    hp = atlas.add(player, "player", srgb=False)
    app.insert_resource(TextureAtlas.RESOURCE, {"data": atlas.build()})
    for gx in range(-3, 4):
        for gy in range(-2, 3):
            app.world.spawn(
                sprite_from_handle(ht, size=(48.0, 48.0)),
                *transform_bundle(translation=(gx * 52.0, gy * 52.0,
                                               -1.0)))
    app.world.spawn(sprite_from_handle(hp), Player(), *transform_bundle())

    @system
    def move_player(q=Query(Transform, With(Player)), time=Res(Time)):
        t = time.elapsed
        q.transform.translation = q.transform.translation.at[:, :2].set(
            jnp.stack([90.0 * jnp.sin(t)[None],
                       50.0 * jnp.sin(t * 1.3)[None]], -1))

    @system
    def follow(cam=Query(Transform, With(Camera2d)),
               pl=Query(Transform, With(Player)), time=Res(Time)):
        target = pl.transform.translation[0, :2]
        cur = cam.transform.translation[:, :2]
        k = 1.0 - jnp.exp(-4.0 * time.delta)   # exponential ease
        cam.transform.translation = \
            cam.transform.translation.at[:, :2].add((target - cur) * k)

    app.add_systems(Update, [move_player, follow], chain=True)
    return app


if __name__ == "__main__":
    import jax
    app = build_app()
    for _ in range(60):
        app.update(dt=1 / 60)
    c = np.asarray(jax.device_get(
        app.world.state["comp"]["transform"]["f"]["translation"]))[0]
    print(f"camera eased to ({c[0]:.1f}, {c[1]:.1f})")
