"""Fixed timestep (reference twin: examples/time/time.rs +
examples/ecs/fixed_timestep.rs — a FixedUpdate system runs at a fixed
hz independent of the render frame rate; Time inside FixedUpdate
reports the fixed delta)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from bevy_tpu import App, FixedUpdate, Res, ResMut, Update
from bevy_tpu.ecs.component import field, resource
from bevy_tpu.ecs.system import system
from bevy_tpu.time import Time, TimePlugin


@resource
class Counters:
    fixed_ticks = field((), jnp.int32)
    frames = field((), jnp.int32)
    fixed_dt = field((), jnp.float32)


def build_app(fixed_hz=64.0):
    app = App(capacity=8)
    app.add_plugins(TimePlugin())
    # ref: Time<Fixed>::from_hz — override the default fixed timestep
    app.world.set_resource_field("time_fixed", "timestep", 1.0 / fixed_hz)
    app.insert_resource(Counters())

    @system
    def fixed_tick(c=ResMut(Counters), time=Res(Time)):
        c.fixed_ticks = c.fixed_ticks + 1
        c.fixed_dt = time.delta          # == 1/fixed_hz inside FixedMain

    @system
    def frame_tick(c=ResMut(Counters)):
        c.frames = c.frames + 1

    app.add_systems(FixedUpdate, fixed_tick)
    app.add_systems(Update, frame_tick)
    return app


def demo():
    app = build_app()
    for _ in range(30):                      # 30 frames at 30 fps = 1 s
        app.update(dt=1 / 30)
    c = app.world.state["res"]["counters"]
    ticks = int(jax.device_get(c["fixed_ticks"]))
    frames = int(jax.device_get(c["frames"]))
    fdt = float(jax.device_get(c["fixed_dt"]))
    print(f"{frames} frames, {ticks} fixed ticks (dt={fdt:.5f})")
    return ticks, frames

if __name__ == "__main__":
    demo()
