"""System piping (reference twin: examples/ecs/system_piping.rs — a
producer system's output feeds a consumer; the reference pipes return
values, the TPU form routes through a typed resource so both stages
stay inside the one jitted frame)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax.numpy as jnp

from bevy_tpu import App, Query, Res, ResMut, Update
from bevy_tpu.ecs.component import component, field, resource
from bevy_tpu.ecs.system import system
from bevy_tpu.time import TimePlugin


@component
class Enemy:
    hp = field((), jnp.float32, default=3.0)


@resource
class Pipe:
    """The pipe: stage 1 writes, stage 2 reads (ref: In<T> params)."""
    weakest = field((), jnp.float32)
    any_alive = field((), jnp.bool_)


@resource
class Report:
    frames_with_enemies = field((), jnp.int32)


def build_app():
    app = App(capacity=16)
    app.add_plugins(TimePlugin())
    app.insert_resource(Pipe())
    app.insert_resource(Report())
    for hp in (5.0, 2.0, 9.0):
        app.world.spawn(Enemy(hp=hp))

    @system
    def find_weakest(q=Query(Enemy), pipe=ResMut(Pipe)):
        hp = jnp.where(q.mask, q.enemy.hp, jnp.inf)
        pipe.weakest = jnp.min(hp)
        pipe.any_alive = q.count() > 0

    @system
    def consume(pipe=Res(Pipe), rep=ResMut(Report)):
        rep.frames_with_enemies = rep.frames_with_enemies + \
            pipe.any_alive.astype(jnp.int32)

    # chain=True orders the pipe: producer strictly before consumer
    app.add_systems(Update, [find_weakest, consume], chain=True)
    return app


if __name__ == "__main__":
    app = build_app()
    for _ in range(3):
        app.update(dt=1 / 60)
    pipe = app.world.resource(Pipe)
    rep = app.world.resource(Report)
    print("weakest hp:", float(pipe.weakest),
          "frames with enemies:", int(rep.frames_with_enemies))
