"""transform_hierarchy stress test (reference twin:
examples/stress_tests/transform_hierarchy.rs — deep parent chains +
wide sibling fans propagate every frame)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import time as pytime

import numpy as np
import jax.numpy as jnp

from bevy_tpu import App, Query, Res, Update, With
from bevy_tpu.ecs.component import component
from bevy_tpu.ecs.system import system
from bevy_tpu.time import Time, TimePlugin
from bevy_tpu.transform import (
    ChildOf, Transform, TransformPlugin, transform_bundle,
)


@component
class Root:
    pass


def build_app(depth=24, fanout=64):
    app = App(capacity=4096)
    app.add_plugins(TimePlugin(), TransformPlugin())
    # one deep spine with a wide fan at every level
    root = app.world.spawn(Root(), *transform_bundle())
    parent = root
    for d in range(depth):
        nxt = app.world.spawn(ChildOf(parent=parent.index),
                              *transform_bundle(translation=(0.1, 0, 0)))
        for k in range(fanout):
            app.world.spawn(ChildOf(parent=parent.index),
                            *transform_bundle(translation=(0, 0.1, 0)))
        parent = nxt

    @system
    def spin_root(q=Query(Transform, With(Root)), time=Res(Time)):
        half = time.elapsed * 0.5
        q.transform.rotation = jnp.broadcast_to(
            jnp.stack([jnp.zeros_like(half), jnp.sin(half),
                       jnp.zeros_like(half), jnp.cos(half)]),
            q.transform.rotation.shape)

    app.add_systems(Update, spin_root)
    return app


def main():
    app = build_app()
    app.update(dt=1 / 60)
    t0 = pytime.perf_counter()
    for _ in range(20):
        app.update(dt=1 / 60)
    n = app.world.entity_count(Transform)
    print(f"transform_hierarchy: {(pytime.perf_counter() - t0) / 20 * 1000:.2f} "
          f"ms/frame ({n} transforms, depth 24)")


if __name__ == "__main__":
    main()
