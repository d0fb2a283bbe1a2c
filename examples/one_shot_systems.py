"""One-shot systems (reference twin: examples/ecs/one_shot_systems.rs —
register a system once, run it on demand via its SystemId instead of
every frame)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from bevy_tpu import App, Query, ResMut
from bevy_tpu.ecs.component import component, field, resource
from bevy_tpu.ecs.system import system


@component
class Counter:
    value = field((), jnp.int32)


@resource
class Log:
    runs = field((), jnp.int32)


def build_app():
    app = App(capacity=8)
    app.insert_resource(Log())
    app.world.spawn(Counter())
    app.world.spawn(Counter(value=100))

    @system
    def increment_all(q=Query(Counter), log=ResMut(Log)):
        q.counter.value = q.counter.value + 1
        log.runs = log.runs + 1

    # ref: World::register_system -> SystemId; Commands::run_system
    sys_id = app.register_system(increment_all)
    app._increment_id = sys_id
    return app


def demo():
    app = build_app()
    app.update(dt=1 / 60)        # frame runs; one-shot does NOT run
    app.run_system(app._increment_id)
    app.run_system(app._increment_id)
    vals = jax.device_get(app.world.column(Counter, "value"))
    runs = int(jax.device_get(app.world.state["res"]["log"]["runs"]))
    print(f"ran {runs} times on demand; counters: {vals[:2].tolist()}")
    return runs, vals


if __name__ == "__main__":
    demo()
