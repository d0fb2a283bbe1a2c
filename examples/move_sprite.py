"""Move sprite (reference twin: examples/2d/move_sprite.rs — a sprite
ping-pongs vertically by mutating Transform in Update)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax.numpy as jnp

from bevy_tpu import App, Query, Res, Update, With
from bevy_tpu.ecs.component import component
from bevy_tpu.ecs.system import system
from bevy_tpu.render import (
    AtlasBuilder, Camera2d, RenderPlugin, SpritePlugin, TextureAtlas,
)
from bevy_tpu.render.sprite import Sprite, sprite_from_handle
from bevy_tpu.time import Time, TimePlugin
from bevy_tpu.transform import Transform, TransformPlugin, transform_bundle


@component
class Mover:
    pass


def build_app(width=320, height=180):
    app = App(capacity=8)
    app.add_plugins(TimePlugin(), TransformPlugin(),
                    RenderPlugin(width=width, height=height), SpritePlugin())
    app.world.spawn(Camera2d(), *transform_bundle())
    atlas = AtlasBuilder(32, 32)
    img = np.zeros((32, 32, 4), np.float32)
    img[4:28, 4:28] = (0.9, 0.4, 0.1, 1.0)
    handle = atlas.add(img, "box", srgb=False)
    app.insert_resource(TextureAtlas.RESOURCE, {"data": atlas.build()})
    app.world.spawn(sprite_from_handle(handle, size=(48.0, 48.0)),
                    Mover(), *transform_bundle())

    @system
    def bounce(q=Query(Transform, With(Mover)), time=Res(Time)):
        y = 60.0 * jnp.sin(time.elapsed * 2.0)
        q.transform.translation = q.transform.translation.at[:, 1].set(y)

    app.add_systems(Update, bounce)
    return app


if __name__ == "__main__":
    app = build_app()
    for _ in range(30):
        app.update(dt=1 / 60)
    y = float(np.asarray(
        app.world.state["comp"]["transform"]["f"]["translation"])[1, 1])
    print(f"sprite y after 0.5s: {y:.1f}")
