"""Runtime-defined components (reference twin: examples/ecs/dynamic.rs —
component layouts known only at runtime, e.g. loaded from config or a
network schema; `define_component` builds a normal component class)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax.numpy as jnp

from bevy_tpu import App, Query, Update
from bevy_tpu.ecs.component import define_component, field
from bevy_tpu.ecs.system import system
from bevy_tpu.time import TimePlugin

# pretend this arrived from a config file at startup
SCHEMA = {
    "sensor": {"reading": field((), jnp.float32),
               "samples": field((), jnp.int32)},
    "tag3": {"rgb": field(3)},
}


def build_app():
    app = App(capacity=8)
    app.add_plugins(TimePlugin())
    comps = {name: define_component(name, fields)
             for name, fields in SCHEMA.items()}
    Sensor = comps["sensor"]
    app.world.spawn(Sensor(reading=1.5))
    app.world.spawn(Sensor(reading=3.0), comps["tag3"](rgb=(1.0, 0.5, 0.0)))

    @system
    def integrate(q=Query(Sensor)):
        q.sensor.reading = q.sensor.reading * 1.1
        q.sensor.samples = q.sensor.samples + 1

    app.add_systems(Update, integrate)
    return app


if __name__ == "__main__":
    app = build_app()
    for _ in range(5):
        app.update(dt=1 / 60)
    st = app.world.state["comp"]["sensor"]["f"]
    print("readings:", [round(float(x), 3) for x in st["reading"][:2]],
          "samples:", int(st["samples"][0]))
