"""Run conditions (reference twin: examples/ecs/run_conditions.rs —
systems gated by composable conditions: a resource-driven predicate and
input-driven gating; conditions evaluate each frame before the system)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from bevy_tpu import App, Res, ResMut, Update
from bevy_tpu.ecs.component import field, resource
from bevy_tpu.ecs.system import system


@resource
class InputCounter:
    value = field((), jnp.int32)
    enabled = field((), jnp.int32, default=1)


def build_app():
    app = App(capacity=8)
    app.insert_resource(InputCounter())

    # a run condition is just a system returning a scalar bool
    # (ref: condition.rs — `.run_if(resource_exists_and_equals(...))`)
    @system(name="counter_enabled")
    def counter_enabled(c=Res(InputCounter)):
        return c.enabled > 0

    @system(name="below_five")
    def below_five(c=Res(InputCounter)):
        return c.value < 5

    @system
    def increment(c=ResMut(InputCounter)):
        c.value = c.value + 1

    # both conditions must pass (ref: .run_if(a).run_if(b) AND semantics)
    app.add_systems(Update, increment,
                    run_if=[counter_enabled, below_five])
    return app


def demo():
    app = build_app()
    for _ in range(8):
        app.update(dt=1 / 60)
    v = int(jax.device_get(app.world.state["res"]["input_counter"]["value"]))
    print(f"counter stopped at {v} (below_five gate)")
    app.world.set_resource_field("input_counter", "value", 0)
    app.world.set_resource_field("input_counter", "enabled", 0)
    for _ in range(3):
        app.update(dt=1 / 60)
    v2 = int(jax.device_get(app.world.state["res"]["input_counter"]["value"]))
    print(f"disabled: counter stays {v2}")
    return v, v2


if __name__ == "__main__":
    demo()
