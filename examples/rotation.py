"""2D rotation (reference twin: examples/2d/rotation.rs — a ship
rotates toward a target and thrusts forward; quaternion-z rotation
drives both the sprite orientation and the motion)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax.numpy as jnp

from bevy_tpu import App, Query, Res, Update, With
from bevy_tpu.ecs.component import component, field
from bevy_tpu.ecs.system import system
from bevy_tpu.render import (
    AtlasBuilder, Camera2d, RenderPlugin, SpritePlugin, TextureAtlas,
)
from bevy_tpu.render.sprite import sprite_from_handle
from bevy_tpu.time import Time, TimePlugin
from bevy_tpu.transform import Transform, TransformPlugin, transform_bundle


@component
class Ship:
    turn_speed = field((), default=2.5)
    speed = field((), default=40.0)


def build_app(width=320, height=180):
    app = App(capacity=8)
    app.add_plugins(TimePlugin(), TransformPlugin(),
                    RenderPlugin(width=width, height=height),
                    SpritePlugin())
    app.world.spawn(Camera2d(), *transform_bundle())
    atlas = AtlasBuilder(32, 32)
    img = np.zeros((32, 32, 4), np.float32)
    for y in range(32):                      # arrow pointing +y
        half = max(1, (31 - y) // 2)
        img[y, 16 - half:16 + half] = (0.9, 0.8, 0.3, 1.0)
    h = atlas.add(img, "ship", srgb=False)
    app.insert_resource(TextureAtlas.RESOURCE, {"data": atlas.build()})
    app.world.spawn(sprite_from_handle(h, size=(28.0, 28.0)), Ship(),
                    *transform_bundle(translation=(-20.0, -10.0, 0.0)))

    @system
    def steer(q=Query(Transform, Ship), time=Res(Time)):
        dt = time.delta
        # rotate at turn_speed and thrust along the ship's +y
        rot = q.transform.rotation
        half = q.ship.turn_speed * dt * 0.5
        dq = jnp.stack([jnp.zeros_like(half), jnp.zeros_like(half),
                        jnp.sin(half), jnp.cos(half)], -1)
        x1, y1, z1, w1 = [dq[:, i] for i in range(4)]
        x2, y2, z2, w2 = [rot[:, i] for i in range(4)]
        rot = jnp.stack([
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2], -1)
        q.transform.rotation = rot
        # ship forward = rotate (0,1,0) by z-quat: angle from z,w
        ang = 2.0 * jnp.arctan2(rot[:, 2], rot[:, 3])
        fwd = jnp.stack([-jnp.sin(ang), jnp.cos(ang)], -1)
        q.transform.translation = q.transform.translation.at[:, :2].add(
            fwd * (q.ship.speed * dt)[:, None])

    app.add_systems(Update, steer)
    return app


if __name__ == "__main__":
    app = build_app()
    for _ in range(60):
        app.update(dt=1 / 60)
    import jax
    t = np.asarray(jax.device_get(
        app.world.state["comp"]["transform"]["f"]["translation"]))[1]
    print(f"ship at ({t[0]:.1f}, {t[1]:.1f}) after 1s of steering")
