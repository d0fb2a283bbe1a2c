"""Breakout — the reference's showcase game re-built on bevy_tpu
(reference twin: examples/showcase/breakout.rs — same constants, same
schedule layout (Update: apply_velocity → move_paddle → check_for_collisions,
chained), same collision rules; game logic is vectorized over all colliders
and runs inside the single jitted frame).

Deviations from the reference, by design:
  * paddle input: a PaddleControl resource (-1/0/1) instead of keyboard;
    optional autoplay system tracks the ball (headless driver).
  * the ball is a textured sprite disc (no Mesh2d circle yet).
  * scoreboard text is a Score resource (no UI text yet).
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax.numpy as jnp

from bevy_tpu import (
    App, Commands, Query, Read, Res, ResMut, Startup, Update, With,
    component, field, resource,
)
from bevy_tpu.color import srgba
from bevy_tpu.ecs.message import MessageReader, MessageWriter, message
from bevy_tpu.ecs.system import system
from bevy_tpu.render import (
    AtlasBuilder, Camera2d, ClearColor, RenderPlugin, Sprite, SpritePlugin,
    TextureAtlas, sprite_from_handle,
)
from bevy_tpu.time import Time, TimePlugin
from bevy_tpu.transform import (
    GlobalTransform, Transform, TransformPlugin, transform_bundle,
)

# Constants (ref: breakout.rs:14-51, transform units = pixels)
PADDLE_SIZE = (120.0, 20.0)
GAP_BETWEEN_PADDLE_AND_FLOOR = 60.0
PADDLE_SPEED = 500.0
PADDLE_PADDING = 10.0

BALL_STARTING_POSITION = (0.0, -50.0, 1.0)
BALL_DIAMETER = 30.0
BALL_SPEED = 400.0
INITIAL_BALL_DIRECTION = (0.5, -0.5)

WALL_THICKNESS = 10.0
LEFT_WALL, RIGHT_WALL = -450.0, 450.0
BOTTOM_WALL, TOP_WALL = -300.0, 300.0

BRICK_SIZE = (100.0, 30.0)
GAP_BETWEEN_PADDLE_AND_BRICKS = 270.0
GAP_BETWEEN_BRICKS = 5.0
GAP_BETWEEN_BRICKS_AND_CEILING = 20.0
GAP_BETWEEN_BRICKS_AND_SIDES = 20.0

BACKGROUND_COLOR = srgba(0.9, 0.9, 0.9)
PADDLE_COLOR = srgba(0.3, 0.3, 0.7)
BALL_COLOR = srgba(1.0, 0.5, 0.5)
BRICK_COLOR = srgba(0.5, 0.5, 1.0)
WALL_COLOR = srgba(0.8, 0.8, 0.8)


@component
class Paddle:
    pass


@component
class Ball:
    pass


@component
class Brick:
    pass


@component
class Collider:
    pass


@component
class Velocity:
    value = field(2)


@resource
class Score:
    value = field((), jnp.int32)


@resource
class PaddleControl:
    """-1 / 0 / +1 steering (ref: keyboard ArrowLeft/ArrowRight)."""
    direction = field((), jnp.float32)
    autoplay = field((), jnp.bool_, default=True)


@message
class BallCollided:
    """ref: BallCollided event (breakout.rs:87) — buffered message here."""
    hits = field((), jnp.int32)


@system
def apply_velocity(q=Query(Transform, Read(Velocity)), time=Res(Time)):
    """ref: apply_velocity (breakout.rs:319)."""
    t = q.transform.translation
    q.transform.translation = t.at[:, :2].add(q.velocity.value * time.delta)


@system
def autopilot(q=Query(Read(Transform), With(Ball)),
              ctrl=ResMut(PaddleControl),
              p=Query(Read(Transform), With(Paddle))):
    """Headless stand-in for keyboard input: steer toward the ball."""
    ball_idx = jnp.argmax(q.mask)
    pad_idx = jnp.argmax(p.mask)
    dx = q.transform.translation[ball_idx, 0] - p.transform.translation[pad_idx, 0]
    auto_dir = jnp.sign(jnp.where(jnp.abs(dx) < 5.0, 0.0, dx))
    ctrl.direction = jnp.where(ctrl.autoplay, auto_dir, ctrl.direction)


@system
def move_paddle(q=Query(Transform, With(Paddle)), ctrl=Res(PaddleControl),
                time=Res(Time)):
    """ref: move_paddle (breakout.rs:292) — same clamp bounds."""
    left = LEFT_WALL + WALL_THICKNESS / 2 + PADDLE_SIZE[0] / 2 + PADDLE_PADDING
    right = RIGHT_WALL - WALL_THICKNESS / 2 - PADDLE_SIZE[0] / 2 - PADDLE_PADDING
    t = q.transform.translation
    new_x = jnp.clip(t[:, 0] + ctrl.direction * PADDLE_SPEED * time.delta,
                     left, right)
    q.transform.translation = t.at[:, 0].set(new_x)


@system
def check_for_collisions(ball=Query(Velocity, Read(Transform), With(Ball)),
                         col=Query(Read(Transform), With(Collider)),
                         bricks=Query(Read(Transform), With(Brick)),
                         score=ResMut(Score),
                         commands=Commands(),
                         events=MessageWriter(BallCollided, budget=1)):
    """ref: check_for_collisions (breakout.rs:334) — vectorized circle-vs-AABB
    over ALL colliders at once instead of the reference's sequential loop;
    reflection fires if any collider demands it on that axis."""
    bi = jnp.argmax(ball.mask)
    pos = ball.transform.translation[bi, :2]
    vel = ball.velocity.value[bi]
    r = BALL_DIAMETER / 2.0

    centers = col.transform.translation[:, :2]
    half = col.transform.scale[:, :2] * 0.5  # unit sprites scaled (ref:347)
    closest = jnp.clip(pos, centers - half, centers + half)
    offset = pos - closest
    d2 = jnp.sum(offset * offset, axis=-1)
    hit = col.mask & (d2 < r * r)

    # side selection (ref: ball_collision breakout.rs:405)
    ox, oy = offset[:, 0], offset[:, 1]
    side_x = jnp.abs(ox) > jnp.abs(oy)
    left = side_x & (ox < 0.0)
    right = side_x & (ox >= 0.0)
    top = ~side_x & (oy > 0.0)
    bottom = ~side_x & (oy <= 0.0)
    # reflect only against approach direction (ref:365-372)
    reflect_x = jnp.any(hit & ((left & (vel[0] > 0)) | (right & (vel[0] < 0))))
    reflect_y = jnp.any(hit & ((top & (vel[1] < 0)) | (bottom & (vel[1] > 0))))
    new_vel = jnp.stack([jnp.where(reflect_x, -vel[0], vel[0]),
                         jnp.where(reflect_y, -vel[1], vel[1])])
    ball.velocity.value = jnp.where(
        ball.mask[:, None], new_vel[None, :], ball.velocity.value)

    # brick despawn + score (ref:356-359)
    brick_hit = hit & bricks.mask
    n_broken = jnp.sum(brick_hit.astype(jnp.int32))
    commands.despawn(brick_hit)
    score.value = score.value + n_broken

    n_hits = jnp.sum(hit.astype(jnp.int32))
    events.send(count=jnp.minimum(n_hits, 1), hits=n_hits)


def build_app(width=1280, height=720, capacity=128, camera_scale=1.0,
              ball_velocity=None, autoplay=True) -> App:
    app = App(capacity=capacity)
    app.add_plugins(TimePlugin(), TransformPlugin(),
                    RenderPlugin(width=width, height=height), SpritePlugin())
    app.insert_resource(ClearColor(color=tuple(np.asarray(BACKGROUND_COLOR))))
    app.insert_resource(Score())
    app.insert_resource(PaddleControl(autoplay=autoplay))
    app.add_message(BallCollided, capacity=4)
    app.add_systems(Update, [autopilot, apply_velocity, move_paddle,
                             check_for_collisions], chain=True)

    # --- atlas: a procedural AA disc for the ball (ref uses a circle mesh)
    atlas = AtlasBuilder(64, 64)
    yy, xx = np.mgrid[0:64, 0:64]
    dist = np.sqrt((xx - 31.5) ** 2 + (yy - 31.5) ** 2)
    disc = np.ones((64, 64, 4), np.float32)
    disc[..., 3] = np.clip(31.5 - dist + 0.5, 0.0, 1.0)
    ball_handle = atlas.add(disc, "disc", srgb=False)
    app.insert_resource(TextureAtlas.RESOURCE, {"data": atlas.build()})

    # --- world setup (ref: setup, breakout.rs:172)
    w = app.world
    w.spawn(Camera2d(scale=camera_scale), *transform_bundle())

    paddle_y = BOTTOM_WALL + GAP_BETWEEN_PADDLE_AND_FLOOR
    w.spawn(Paddle(), Collider(),
            Sprite(color=tuple(np.asarray(PADDLE_COLOR)), size=(1.0, 1.0)),
            *transform_bundle(translation=(0.0, paddle_y, 0.0),
                              scale=(PADDLE_SIZE[0], PADDLE_SIZE[1], 1.0)))

    v = np.asarray(ball_velocity if ball_velocity is not None
                   else np.asarray(INITIAL_BALL_DIRECTION) /
                   np.linalg.norm(INITIAL_BALL_DIRECTION) * BALL_SPEED,
                   np.float32)
    w.spawn(Ball(), Velocity(value=tuple(v)),
            sprite_from_handle(ball_handle, color=tuple(np.asarray(BALL_COLOR)),
                               size=(BALL_DIAMETER, BALL_DIAMETER)),
            *transform_bundle(translation=BALL_STARTING_POSITION))

    arena_w, arena_h = RIGHT_WALL - LEFT_WALL, TOP_WALL - BOTTOM_WALL
    walls = [
        ((LEFT_WALL, 0.0), (WALL_THICKNESS, arena_h + WALL_THICKNESS)),
        ((RIGHT_WALL, 0.0), (WALL_THICKNESS, arena_h + WALL_THICKNESS)),
        ((0.0, BOTTOM_WALL), (arena_w + WALL_THICKNESS, WALL_THICKNESS)),
        ((0.0, TOP_WALL), (arena_w + WALL_THICKNESS, WALL_THICKNESS)),
    ]
    for pos, size in walls:
        w.spawn(Collider(),
                Sprite(color=tuple(np.asarray(WALL_COLOR)), size=(1.0, 1.0)),
                *transform_bundle(translation=(pos[0], pos[1], 0.0),
                                  scale=(size[0], size[1], 1.0)))

    # bricks (ref:240-289)
    total_w = arena_w - 2 * GAP_BETWEEN_BRICKS_AND_SIDES
    bottom_edge = paddle_y + GAP_BETWEEN_PADDLE_AND_BRICKS
    total_h = TOP_WALL - bottom_edge - GAP_BETWEEN_BRICKS_AND_CEILING
    n_cols = int(total_w // (BRICK_SIZE[0] + GAP_BETWEEN_BRICKS))
    n_rows = int(total_h // (BRICK_SIZE[1] + GAP_BETWEEN_BRICKS))
    center = (LEFT_WALL + RIGHT_WALL) / 2
    left_edge = center - n_cols / 2 * BRICK_SIZE[0] - (n_cols - 1) / 2 * GAP_BETWEEN_BRICKS
    off_x = left_edge + BRICK_SIZE[0] / 2
    off_y = bottom_edge + BRICK_SIZE[1] / 2
    positions = [
        (off_x + c * (BRICK_SIZE[0] + GAP_BETWEEN_BRICKS),
         off_y + r * (BRICK_SIZE[1] + GAP_BETWEEN_BRICKS), 0.0)
        for r in range(n_rows) for c in range(n_cols)
    ]
    xyz = np.asarray(positions, np.float32)
    brick_scale = (BRICK_SIZE[0], BRICK_SIZE[1], 1.0)
    w.spawn_batch([
        Brick(), Collider(),
        Sprite(color=tuple(np.asarray(BRICK_COLOR)), size=(1.0, 1.0)),
        Transform(translation=xyz, scale=brick_scale),
        GlobalTransform(translation=xyz, scale=brick_scale),
    ], len(positions))
    return app


def main():
    app = build_app()
    from bevy_tpu.render.plugin import frame_image
    app.run(max_frames=240, dt=1 / 60.0)
    img = frame_image(app)
    np.save("/tmp/breakout_frame.npy", img)
    print("score:", int(app.world.resource(Score).value),
          "bricks left:", app.world.entity_count(Brick))


if __name__ == "__main__":
    main()
