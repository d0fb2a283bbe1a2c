"""Desk toy (reference twin: examples/games/desk_toy.rs — a mascot you
grab and fling with the mouse; spring-follow while held, ballistic with
wall bounces when released)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax.numpy as jnp

from bevy_tpu import App, Query, Res, Update
from bevy_tpu.ecs.component import component, field
from bevy_tpu.ecs.system import system
from bevy_tpu.input import InputPlugin, MouseButton
from bevy_tpu.render import (
    AtlasBuilder, Camera2d, RenderPlugin, SpritePlugin, TextureAtlas,
)
from bevy_tpu.render.sprite import Sprite, sprite_from_handle
from bevy_tpu.time import Time, TimePlugin
from bevy_tpu.transform import Transform, TransformPlugin, transform_bundle

W, H = 320, 180
GRAVITY = -500.0


@component
class Toy:
    velocity = field(2)
    held = field((), jnp.bool_)


def build_app(width=W, height=H):
    app = App(capacity=8)
    app.add_plugins(TimePlugin(), InputPlugin(), TransformPlugin(),
                    RenderPlugin(width=width, height=height), SpritePlugin())
    app.world.spawn(Camera2d(), *transform_bundle())
    atlas = AtlasBuilder(32, 32)
    face = np.zeros((24, 24, 4), np.float32)
    yy, xx = np.mgrid[0:24, 0:24]
    disk = (xx - 11.5) ** 2 + (yy - 11.5) ** 2 < 11.5 ** 2
    face[disk] = (1.0, 0.8, 0.2, 1.0)
    h = atlas.add(face, "face", srgb=False)
    app.insert_resource(TextureAtlas.RESOURCE, {"data": atlas.build()})
    app.world.spawn(sprite_from_handle(h, size=(28.0, 28.0)), Toy(),
                    *transform_bundle())

    @system
    def toy_physics(q=Query(Transform, Toy), mouse=Res("mouse"),
                    time=Res(Time)):
        dt = time.delta
        pos = q.transform.translation
        vel = q.toy.velocity
        # cursor in world coords (1 unit = 1 px, y-up)
        cx = mouse.position[0] - W * 0.5
        cy = H * 0.5 - mouse.position[1]
        near = (jnp.abs(pos[:, 0] - cx) < 20.0) & \
               (jnp.abs(pos[:, 1] - cy) < 20.0)
        held = jnp.where(mouse.pressed[MouseButton.Left],
                         q.toy.held | near, False)
        # held: spring to cursor (the fling velocity falls out of the
        # spring); free: gravity + wall/floor bounce
        to_cursor = jnp.stack([cx - pos[:, 0], cy - pos[:, 1]], 1)
        vel_held = to_cursor * 12.0
        vy = vel[:, 1] + GRAVITY * dt
        nx = pos[:, 0] + vel[:, 0] * dt
        ny = pos[:, 1] + vy * dt
        vx = jnp.where(jnp.abs(nx) > W / 2 - 14, -vel[:, 0] * 0.8, vel[:, 0])
        vy = jnp.where(ny < -H / 2 + 14, jnp.abs(vy) * 0.8, vy)
        vel_free = jnp.stack([vx, vy], 1)
        q.toy.held = held
        q.toy.velocity = jnp.where(held[:, None], vel_held, vel_free)
        newp = pos[:, :2] + q.toy.velocity * dt
        q.transform.translation = jnp.concatenate([
            jnp.stack([jnp.clip(newp[:, 0], -W / 2 + 14, W / 2 - 14),
                       jnp.maximum(newp[:, 1], -H / 2 + 14)], 1),
            pos[:, 2:]], 1)

    app.add_systems(Update, toy_physics)
    return app


if __name__ == "__main__":
    app = build_app()
    # grab the toy at center, drag right, release — it should fly on
    app.input.move_to(W / 2, H / 2)
    app.input.press_mouse(MouseButton.Left)
    for i in range(20):
        app.input.move_to(W / 2 + 4 * i, H / 2)
        app.update(dt=1 / 60)
    app.input.release_mouse(MouseButton.Left)
    for _ in range(20):
        app.update(dt=1 / 60)
    p = np.asarray(app.world.state["comp"]["transform"]["f"]["translation"])
    print("toy position after fling:", p[1, :2].round(1))
