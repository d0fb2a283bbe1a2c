"""World serialization round trip (reference twins:
examples/scene/scene.rs + examples/reflection/serialization.rs — save a
world's entities to a JSON-able snapshot via the reflection schema
registry, mutate, then respawn the snapshot into a fresh world with
entity remapping)."""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax.numpy as jnp

from bevy_tpu.app.app import App
from bevy_tpu.ecs.component import component, field
from bevy_tpu.ecs.world import World
from bevy_tpu.scene import load_world, save_world
from bevy_tpu.transform import Transform


@component
class Inventory:
    gold = field((), jnp.int32, default=10)
    slots = field(4)


def build_snapshot():
    w = World(capacity=16)
    w.spawn(Transform(translation=(1.0, 2.0, 3.0)),
            Inventory(gold=99, slots=(1.0, 0.0, 2.0, 0.0)))
    w.spawn(Inventory())
    return save_world(w)


def main():
    snap = build_snapshot()
    text = json.dumps(snap, indent=2)        # plain JSON — versionable
    print("snapshot bytes:", len(text))

    w2 = World(capacity=16)
    remap = load_world(w2, json.loads(text))
    print("respawned entities:", len(remap))
    inv = w2.state["comp"][
        [k for k in w2.state["comp"] if k.endswith("inventory")][0]]
    print("gold column:", [int(g) for g, h in
                           zip(inv["f"]["gold"], inv["has"]) if bool(h)])


build_app = None  # host-only example: no App loop


if __name__ == "__main__":
    main()
