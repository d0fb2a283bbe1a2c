"""Parenting (reference twin: examples/3d/parenting.rs — a child entity
orbits because only its PARENT rotates; transform propagation composes
the hierarchy every frame)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax.numpy as jnp

from bevy_tpu import App, Query, Res, Update, With
from bevy_tpu.ecs.component import component
from bevy_tpu.ecs.system import system
from bevy_tpu.math import quat_from_axis_angle, quat_mul
from bevy_tpu.time import Time, TimePlugin
from bevy_tpu.transform import (
    ChildOf, GlobalTransform, Transform, TransformPlugin, transform_bundle,
)


@component
class Spinner:
    pass


def build_app():
    app = App(capacity=8)
    app.add_plugins(TimePlugin(), TransformPlugin())
    parent = app.world.spawn(Spinner(), *transform_bundle())
    app.world.spawn(*transform_bundle(translation=(3.0, 0.0, 0.0)),
                    ChildOf(parent=parent.index, depth=1))

    @system
    def spin(q=Query(Transform, With(Spinner)), time=Res(Time)):
        dq = quat_from_axis_angle(
            jnp.asarray([0.0, 1.0, 0.0]), time.delta * 2.0)
        q.transform.rotation = quat_mul(dq[None, :], q.transform.rotation)

    app.add_systems(Update, spin)
    return app


if __name__ == "__main__":
    app = build_app()
    for _ in range(47):                  # ~ quarter turn at 2 rad/s
        app.update(dt=1 / 60)
    import numpy as np
    g = np.asarray(
        app.world.state["comp"]["global_transform"]["f"]["translation"])
    print("child world position:", g[1].round(2),
          "(orbited from [3, 0, 0])")
