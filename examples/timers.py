"""Timers (reference twin: examples/time/timers.rs — a one-shot countdown
and a repeating tick timer ticked by Time.delta; timer state lives in a
dict resource of device arrays, batched the TPU way)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax.numpy as jnp

from bevy_tpu import App, Res, ResMut, Update
from bevy_tpu.ecs.system import system
from bevy_tpu.time import Time, TimePlugin, timer_new, timer_tick


def build_app():
    app = App(capacity=4)
    app.add_plugins(TimePlugin())
    app.insert_resource("countdown", {
        "oneshot": timer_new(0.25),
        "repeat": timer_new(0.1, repeating=True),
        "fired": jnp.asarray(0, jnp.int32),
        "ticks": jnp.asarray(0, jnp.int32),
    })

    @system
    def tick(c=ResMut("countdown"), time=Res(Time)):
        t, just = timer_tick(c.oneshot, time.delta)
        c.oneshot = t
        c.fired = c.fired + just.astype(jnp.int32)
        r, rjust = timer_tick(c.repeat, time.delta)
        c.repeat = r
        c.ticks = c.ticks + rjust.astype(jnp.int32)

    app.add_systems(Update, tick)
    return app


if __name__ == "__main__":
    app = build_app()
    for _ in range(60):
        app.update(dt=1 / 60)
    c = app.world.resource_raw("countdown")
    print(f"one-shot fired {int(c['fired'])}x, repeating ticked "
          f"{int(c['ticks'])}x over 1s")
