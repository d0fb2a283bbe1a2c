"""Contributors (reference twin: examples/games/contributors.rs — one
bouncing, gravity-bound sprite per contributor name, each tinted by a
name-hash hue; a tiny complete game loop)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax.numpy as jnp

from bevy_tpu import App, Query, Res, Update
from bevy_tpu.color import hsla
from bevy_tpu.ecs.component import component, field
from bevy_tpu.ecs.system import system
from bevy_tpu.render import (
    AtlasBuilder, Camera2d, RenderPlugin, SpritePlugin, TextureAtlas,
)
from bevy_tpu.render.sprite import Sprite
from bevy_tpu.time import Time, TimePlugin
from bevy_tpu.transform import Transform, TransformPlugin, transform_bundle

NAMES = ["alice", "bob", "carol", "dave", "erin", "frank", "grace",
         "heidi", "ivan", "judy", "mallory", "niaj", "olivia", "peggy"]
GRAVITY = -300.0
FLOOR = -80.0


@component
class Contributor:
    velocity = field(2)


def build_app(width=320, height=180):
    app = App(capacity=64)
    app.add_plugins(TimePlugin(), TransformPlugin(),
                    RenderPlugin(width=width, height=height), SpritePlugin())
    app.world.spawn(Camera2d(), *transform_bundle())
    atlas = AtlasBuilder(16, 16)
    chip = np.ones((12, 12, 4), np.float32)
    h = atlas.add(chip, "chip", srgb=False)
    app.insert_resource(TextureAtlas.RESOURCE, {"data": atlas.build()})
    rng = np.random.RandomState(1)
    for name in NAMES:
        hue = (hash(name) % 360) / 360.0 * 360.0
        color = np.asarray(hsla(hue, 0.8, 0.55))
        app.world.spawn(
            Sprite(size=(14.0, 14.0), uv_min=h["uv_min"],
                   uv_max=h["uv_max"], tex=h["tex"], color=color),
            Contributor(velocity=(float(rng.uniform(-80, 80)),
                                  float(rng.uniform(0, 120)))),
            *transform_bundle(translation=(
                float(rng.uniform(-140, 140)), 60.0, 1.0)))

    @system
    def physics(q=Query(Transform, Contributor), time=Res(Time)):
        dt = time.delta
        pos = q.transform.translation
        vel = q.contributor.velocity
        vy = vel[:, 1] + GRAVITY * dt
        nx = pos[:, 0] + vel[:, 0] * dt
        ny = pos[:, 1] + vy * dt
        # bounce off the floor and the side walls
        vy = jnp.where(ny < FLOOR, jnp.abs(vy) * 0.9, vy)
        vx = jnp.where(jnp.abs(nx) > 150.0, -vel[:, 0], vel[:, 0])
        q.contributor.velocity = jnp.stack([vx, vy], 1)
        q.transform.translation = jnp.stack(
            [jnp.clip(nx, -150.0, 150.0), jnp.maximum(ny, FLOOR),
             pos[:, 2]], 1)

    app.add_systems(Update, physics)
    return app


if __name__ == "__main__":
    app = build_app()
    for _ in range(60):
        app.update(dt=1 / 60)
    y = np.asarray(app.world.state["comp"]["transform"]["f"]["translation"])
    print("contributor heights:", y[1:6, 1].round(1))
