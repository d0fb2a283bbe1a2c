"""Custom diagnostics (reference twin:
examples/diagnostics/custom_diagnostic.rs — register your own named
diagnostic, feed it measurements each frame, read smoothed values)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax.numpy as jnp

from bevy_tpu import App, Query, Update
from bevy_tpu.diagnostic import Diagnostic, DiagnosticsStore
from bevy_tpu.ecs.component import component, field
from bevy_tpu.ecs.system import system
from bevy_tpu.time import TimePlugin

ALTITUDE = "game/altitude"


@component
class Balloon:
    height = field((), jnp.float32)


def build_app():
    app = App(capacity=4)
    app.add_plugins(TimePlugin())
    store = DiagnosticsStore()
    store.register(Diagnostic(ALTITUDE, suffix="m"))
    app.diagnostics = store
    app.world.spawn(Balloon())

    @system
    def rise(q=Query(Balloon)):
        q.balloon.height = q.balloon.height + 0.7

    @system(host=True)
    def measure(q=Query(Balloon)):
        store.get(ALTITUDE).add_measurement(float(q.balloon.height[0]))

    app.add_systems(Update, [rise, measure], chain=True)
    return app


if __name__ == "__main__":
    app = build_app()
    for _ in range(10):
        app.update(dt=1 / 60)
    d = app.diagnostics.get(ALTITUDE)
    print(f"altitude: last={d.value:.1f}{d.suffix} "
          f"avg={d.average:.2f} smoothed={d.smoothed:.2f}")
