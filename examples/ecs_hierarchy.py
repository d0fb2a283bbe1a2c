"""Entity hierarchies (reference twin: examples/ecs/hierarchy.rs —
spawn a parent with children, mutate the hierarchy at runtime, and let
transform propagation carry the parent's motion to the children)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from bevy_tpu import App, Query, Res, Update, With
from bevy_tpu.ecs.component import component, field
from bevy_tpu.ecs.system import system
from bevy_tpu.math import quat_from_axis_angle, quat_mul
from bevy_tpu.time import Time, TimePlugin
from bevy_tpu.transform import (
    GlobalTransform, Transform, TransformPlugin, set_parent,
    transform_bundle,
)


@component
class Spinner:
    speed = field((), jnp.float32, default=1.0)


def build_app():
    app = App(capacity=32)
    app.add_plugins(TimePlugin(), TransformPlugin())

    parent = app.world.spawn(Spinner(speed=1.5),
                             *transform_bundle(translation=(0.0, 0.0, 0.0)))
    # two children orbit with the parent via propagation, one grandchild
    c1 = app.world.spawn(*transform_bundle(translation=(2.0, 0.0, 0.0)))
    c2 = app.world.spawn(*transform_bundle(translation=(-2.0, 0.0, 0.0)))
    g1 = app.world.spawn(*transform_bundle(translation=(0.0, 1.0, 0.0)))
    set_parent(app.world, c1, parent)
    set_parent(app.world, c2, parent)
    set_parent(app.world, g1, c1)

    @system
    def spin(q=Query(Transform, Spinner), time=Res(Time)):
        ang = q.spinner.speed * time.delta
        dq = quat_from_axis_angle(jnp.asarray([0.0, 0.0, 1.0]), ang)
        q.transform.rotation = quat_mul(
            jnp.broadcast_to(dq, q.transform.rotation.shape),
            q.transform.rotation)

    app.add_systems(Update, spin)
    app._entities = {"parent": parent, "c1": c1, "c2": c2, "g1": g1}
    return app


def demo():
    app = build_app()
    for _ in range(30):
        app.update(dt=1 / 30)
    gt = np.asarray(jax.device_get(
        app.world.column(GlobalTransform, "translation")))
    for name, e in app._entities.items():
        print(f"{name}: {gt[e.index].round(3).tolist()}")
    # detach c2: it stops following the parent (ref: remove_parent —
    # removing ChildOf orphans the entity)
    from bevy_tpu.transform import ChildOf
    app.world.remove(app._entities["c2"], ChildOf)
    for _ in range(30):
        app.update(dt=1 / 30)
    gt = np.asarray(jax.device_get(
        app.world.column(GlobalTransform, "translation")))
    print("after detach c2:", gt[app._entities["c2"].index].round(3).tolist())
    return gt


if __name__ == "__main__":
    demo()
