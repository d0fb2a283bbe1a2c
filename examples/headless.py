"""Headless app (reference twin: examples/app/headless.rs — run without
any window or renderer on a manual loop schedule; this build is
headless-native, so the example is the minimal ScheduleRunner form)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax.numpy as jnp

from bevy_tpu import App, ResMut, Update
from bevy_tpu.ecs.component import field, resource
from bevy_tpu.ecs.system import system
from bevy_tpu.time import TimePlugin


@resource
class Ticks:
    count = field((), jnp.int32)


def build_app():
    app = App(capacity=1)
    app.add_plugins(TimePlugin())        # no RenderPlugin: truly headless
    app.insert_resource(Ticks())

    @system
    def tick(t=ResMut(Ticks)):
        t.count = t.count + 1

    app.add_systems(Update, tick)
    return app


if __name__ == "__main__":
    app = build_app()
    # ScheduleRunner::run_loop equivalent: a fixed number of manual steps
    for _ in range(100):
        app.update(dt=1 / 60)
    print("ran", int(app.world.resource(Ticks).count), "headless ticks")
