"""Startup systems (reference twin: examples/ecs/startup_system.rs —
PreStartup/Startup/PostStartup run exactly once before the first frame,
in order)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from bevy_tpu import App, PostStartup, PreStartup, ResMut, Startup, Update
from bevy_tpu.ecs.component import field, resource
from bevy_tpu.ecs.system import system


@resource
class Trace:
    order = field((4,), jnp.int32, default=(0, 0, 0, 0))
    clock = field((), jnp.int32)
    frames = field((), jnp.int32)


def build_app():
    app = App(capacity=8)
    app.insert_resource(Trace())

    def stamp(slot):
        @system(name=f"stamp{slot}")
        def s(t=ResMut(Trace)):
            t.clock = t.clock + 1
            t.order = t.order.at[slot].set(t.clock)
        return s

    @system
    def per_frame(t=ResMut(Trace)):
        t.frames = t.frames + 1

    app.add_systems(PreStartup, stamp(0))
    app.add_systems(Startup, stamp(1))
    app.add_systems(PostStartup, stamp(2))
    app.add_systems(Update, per_frame)
    return app


def demo():
    app = build_app()
    for _ in range(3):
        app.update(dt=1 / 60)
    t = app.world.state["res"]["trace"]
    order = jax.device_get(t["order"]).tolist()
    frames = int(jax.device_get(t["frames"]))
    print(f"startup stamps {order[:3]} (once each), frames {frames}")
    return order, frames


if __name__ == "__main__":
    demo()
