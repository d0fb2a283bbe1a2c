"""Reflection (reference twins: examples/reflection/reflection.rs +
dynamic_types.rs + mutation_by_reflection — inspect a component's
schema, read and mutate live world values through string paths)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax.numpy as jnp

from bevy_tpu.ecs.component import component, field, get_spec
from bevy_tpu.ecs.world import World
from bevy_tpu.reflect_path import reflect_entity_get, reflect_entity_set


@component
class Ship:
    hull = field((), jnp.float32, default=100.0)
    thrusters = field(3)


def main():
    # schema introspection (ref: Reflect::type_info)
    spec = get_spec(Ship)
    print("type:", spec.name)
    for fname, f in spec.fields.items():
        print(f"  .{fname}: shape={f.shape} dtype={jnp.dtype(f.dtype).name}")

    w = World(capacity=4)
    e = w.spawn(Ship(thrusters=(1.0, 0.0, 0.5)))

    # path-based access (ref: GetPath — "path string" reflection)
    print("hull =", float(reflect_entity_get(w, e, "ship.hull")))
    print("thrusters[2] =", float(reflect_entity_get(w, e, "ship.thrusters[2]")))

    # mutation by reflection
    reflect_entity_set(w, e, "ship.hull", 55.0)
    reflect_entity_set(w, e, "ship.thrusters[0]", 9.0)
    print("after mutation: hull =", float(reflect_entity_get(w, e, "ship.hull")),
          "thrusters[0] =", float(reflect_entity_get(w, e, "ship.thrusters[0]")))


build_app = None  # host-only example


if __name__ == "__main__":
    main()
