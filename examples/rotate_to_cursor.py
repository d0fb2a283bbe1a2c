"""Rotate to cursor (reference twin: examples/2d/rotate_to_cursor.rs —
a turret tracks the pointer; headless input events feed the cursor)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax.numpy as jnp

from bevy_tpu import App, Query, Res, Update, With
from bevy_tpu.ecs.component import component
from bevy_tpu.ecs.system import system
from bevy_tpu.input import InputPlugin
from bevy_tpu.render import (
    AtlasBuilder, Camera2d, RenderPlugin, SpritePlugin, TextureAtlas,
)
from bevy_tpu.render.sprite import sprite_from_handle
from bevy_tpu.time import TimePlugin
from bevy_tpu.transform import Transform, TransformPlugin, transform_bundle


@component
class Turret:
    pass


def build_app(width=320, height=180):
    app = App(capacity=8)
    app.add_plugins(TimePlugin(), TransformPlugin(), InputPlugin(),
                    RenderPlugin(width=width, height=height),
                    SpritePlugin())
    app.world.spawn(Camera2d(), *transform_bundle())
    atlas = AtlasBuilder(32, 32)
    img = np.zeros((32, 32, 4), np.float32)
    img[12:20, 4:28] = (0.3, 0.8, 0.9, 1.0)      # barrel along +x
    img[8:24, 4:14] = (0.2, 0.5, 0.7, 1.0)       # base
    h = atlas.add(img, "turret", srgb=False)
    app.insert_resource(TextureAtlas.RESOURCE, {"data": atlas.build()})
    app.world.spawn(sprite_from_handle(h, size=(40.0, 40.0)), Turret(),
                    *transform_bundle())
    app.insert_resource("cursor_world", {"xy": jnp.zeros(2, jnp.float32)})

    @system
    def track_cursor(q=Query(Transform, With(Turret)),
                     cur=Res("cursor_world")):
        d = cur.xy
        ang = jnp.arctan2(d[1], d[0])
        q.transform.rotation = jnp.broadcast_to(
            jnp.stack([0.0 * ang, 0.0 * ang, jnp.sin(ang / 2),
                       jnp.cos(ang / 2)]),
            q.transform.rotation.shape)

    def on_cursor(app_, x, y):
        # window px -> world (origin center, y up)
        wx = x - app_._rp_width / 2
        wy = app_._rp_height / 2 - y
        app_.world.state["res"]["cursor_world"]["xy"] = \
            jnp.asarray([wx, wy], jnp.float32)

    app._rp_width, app._rp_height = width, height
    app.on_cursor = lambda x, y: on_cursor(app, x, y)
    app.add_systems(Update, track_cursor)
    return app


if __name__ == "__main__":
    app = build_app()
    app.on_cursor(300.0, 20.0)           # cursor top-right
    for _ in range(3):
        app.update(dt=1 / 60)
    import jax
    r = np.asarray(jax.device_get(
        app.world.state["comp"]["transform"]["f"]["rotation"]))[1]
    ang = 2.0 * np.arctan2(r[2], r[3])
    print(f"turret angle: {np.degrees(ang):.1f} deg (expect ~26.6)")
