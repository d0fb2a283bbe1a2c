"""Component lifecycle hooks (reference twin:
examples/ecs/component_hooks.rs — react to a component being added,
inserted, or removed with lifecycle observers; here they maintain an
inventory count as items come and go)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from bevy_tpu import App, ResMut, Update
from bevy_tpu.ecs.component import component, field, resource
from bevy_tpu.ecs.observer import LifecycleMask, OnAdd, OnRemove
from bevy_tpu.ecs.system import system


@component
class Item:
    kind = field((), jnp.int32)


@resource
class Inventory:
    count = field((), jnp.int32)
    total_ever = field((), jnp.int32)


def build_app():
    app = App(capacity=16)
    app.insert_resource(Inventory())
    app.world.register_component(Item)

    # lifecycle observers fire the frame the component appears/vanishes
    # (ref: world.add_observer(|On<Add, Item>| ...), lifecycle.rs)
    @system
    def on_item_added(life=LifecycleMask(OnAdd(Item)),
                      inv=ResMut(Inventory)):
        n = life.count()
        inv.count = inv.count + n
        inv.total_ever = inv.total_ever + n

    @system
    def on_item_removed(life=LifecycleMask(OnRemove(Item)),
                        inv=ResMut(Inventory)):
        inv.count = inv.count - life.count()

    app.add_observer(OnAdd(Item), on_item_added)
    app.add_observer(OnRemove(Item), on_item_removed)
    return app


def demo():
    app = build_app()
    a = app.world.spawn(Item(kind=1))
    b = app.world.spawn(Item(kind=2))
    app.update(dt=1 / 60)
    inv = app.world.state["res"]["inventory"]
    print("after 2 spawns: count", int(jax.device_get(inv["count"])))
    app.world.despawn(a)
    app.update(dt=1 / 60)
    inv = app.world.state["res"]["inventory"]
    count = int(jax.device_get(inv["count"]))
    ever = int(jax.device_get(inv["total_ever"]))
    print(f"after despawn: count {count}, total_ever {ever}")
    return count, ever


if __name__ == "__main__":
    demo()
