"""System stepping (reference twin: examples/ecs/system_stepping.rs — a
debugger that pauses a schedule and runs it one system at a time,
inspecting world state between steps)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax.numpy as jnp

from bevy_tpu import App, ResMut, Update
from bevy_tpu.ecs.component import field, resource
from bevy_tpu.ecs.system import system
from bevy_tpu.stepping import Stepping
from bevy_tpu.time import TimePlugin


@resource
class Trace:
    moves = field((), jnp.int32)
    collides = field((), jnp.int32)


def build_app():
    app = App(capacity=4)
    app.add_plugins(TimePlugin())
    app.insert_resource(Trace())

    @system
    def movement(t=ResMut(Trace)):
        t.moves = t.moves + 1

    @system
    def collision(t=ResMut(Trace)):
        t.collides = t.collides + 1

    app.add_systems(Update, [movement, collision], chain=True)
    return app


if __name__ == "__main__":
    app = build_app()
    st = Stepping(app).add_schedule(Update)
    app.update(dt=1 / 60)
    st.enable()
    app.update(dt=1 / 60)            # paused — nothing advances
    t = app.world.resource(Trace)
    print("paused:", int(t.moves), int(t.collides))
    print("stepped:", st.step())     # runs just `movement`
    t = app.world.resource(Trace)
    print("after step:", int(t.moves), int(t.collides))
    print("continued:", st.continue_())
    st.disable()
    app.update(dt=1 / 60)
    t = app.world.resource(Trace)
    print("resumed:", int(t.moves), int(t.collides))
