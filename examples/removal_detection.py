"""Removal detection (reference twin: examples/ecs/removal_detection.rs
— react to a component being removed via the Removed<T> query filter in
the frame after removal)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from bevy_tpu import App, Query, Removed, ResMut, Update
from bevy_tpu.ecs.component import component, field, resource
from bevy_tpu.ecs.system import system


@component
class MyComponent:
    tag = field((), jnp.int32)


@resource
class RemovalLog:
    count = field((), jnp.int32)
    last_row = field((), jnp.int32, default=-1)


def build_app():
    app = App(capacity=16)
    app.insert_resource(RemovalLog())
    e = app.world.spawn(MyComponent(tag=7))

    @system
    def react_on_removal(q=Query(Removed(MyComponent)),
                         log=ResMut(RemovalLog)):
        n = jnp.sum(q.mask.astype(jnp.int32))
        log.count = log.count + n
        rows = jnp.arange(q.mask.shape[0], dtype=jnp.int32)
        log.last_row = jnp.where(n > 0, jnp.max(
            jnp.where(q.mask, rows, -1)), log.last_row)

    app.add_systems(Update, react_on_removal)
    app._target = e
    return app


def demo():
    app = build_app()
    app.update(dt=1 / 60)                     # nothing removed yet
    app.world.remove(app._target, MyComponent)
    app.update(dt=1 / 60)                     # removal observed this frame
    app.update(dt=1 / 60)                     # ...and only once
    log = app.world.state["res"]["removal_log"]
    count = int(jax.device_get(log["count"]))
    row = int(jax.device_get(log["last_row"]))
    print(f"removals seen: {count} (row {row})")
    return count, row


if __name__ == "__main__":
    demo()
