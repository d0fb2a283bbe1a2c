"""Diagnostics (reference twin: examples/diagnostics/log_diagnostics.rs
— frame-time/fps/entity-count diagnostics collected into the ring-
buffer store and printed by the log printer)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bevy_tpu import App
from bevy_tpu.diagnostic import (
    DiagnosticsStore, EntityCountDiagnosticsPlugin,
    FrameTimeDiagnosticsPlugin, LogDiagnosticsPlugin,
)
from bevy_tpu.ecs.component import component, field
from bevy_tpu.time import TimePlugin

import jax.numpy as jnp


@component
class Marker:
    v = field((), jnp.int32)


def build_app():
    app = App(capacity=64)
    app.add_plugins(TimePlugin(),
                    FrameTimeDiagnosticsPlugin(),
                    EntityCountDiagnosticsPlugin(),
                    LogDiagnosticsPlugin(interval=0.5))
    for i in range(10):
        app.world.spawn(Marker(v=i))
    return app


def demo():
    app = build_app()
    for _ in range(40):
        app.update(dt=1 / 60)
    store: DiagnosticsStore = app.diagnostics
    fps = store.get("fps")
    ft = store.get("frame_time")
    ents = store.get("entity_count")
    print(f"fps {fps.smoothed:.1f}  frame_time {ft.smoothed:.2f} ms  "
          f"entities {ents.value:.0f}")
    return fps.smoothed, ents.value


if __name__ == "__main__":
    demo()
