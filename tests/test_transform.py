"""Transform propagation tests (ref twin: bevy_transform systems.rs tests —
did_propagate etc.)."""

import jax.numpy as jnp
import numpy as np

from bevy_tpu import App, Update
from bevy_tpu.ecs.query import Query
from bevy_tpu.ecs.system import system
from bevy_tpu.transform import (
    ChildOf, GlobalTransform, Transform, TransformPlugin, children_of,
    despawn_recursive, set_parent, transform_bundle,
)
from bevy_tpu.math.quat import quat_from_rotation_z


def test_root_sync():
    app = App(capacity=16)
    app.add_plugins(TransformPlugin())
    e = app.world.spawn(Transform(translation=(1.0, 2.0, 3.0)), GlobalTransform())
    app.update(dt=0.01)
    np.testing.assert_allclose(app.world.get(e, GlobalTransform).translation,
                               [1.0, 2.0, 3.0], atol=1e-6)


def test_parent_child_propagation():
    app = App(capacity=16)
    app.add_plugins(TransformPlugin())
    parent = app.world.spawn(*transform_bundle(translation=(10.0, 0.0, 0.0)))
    child = app.world.spawn(*transform_bundle(translation=(1.0, 0.0, 0.0)))
    grandchild = app.world.spawn(*transform_bundle(translation=(0.1, 0.0, 0.0)))
    set_parent(app.world, child, parent)
    set_parent(app.world, grandchild, child)
    app.update(dt=0.01)
    np.testing.assert_allclose(app.world.get(child, GlobalTransform).translation,
                               [11.0, 0.0, 0.0], atol=1e-5)
    np.testing.assert_allclose(app.world.get(grandchild, GlobalTransform).translation,
                               [11.1, 0.0, 0.0], atol=1e-5)


def test_rotated_parent():
    app = App(capacity=16)
    app.add_plugins(TransformPlugin())
    rot = np.asarray(quat_from_rotation_z(jnp.pi / 2))
    parent = app.world.spawn(*transform_bundle(translation=(0.0, 0.0, 0.0),
                                               rotation=tuple(rot)))
    child = app.world.spawn(*transform_bundle(translation=(1.0, 0.0, 0.0)))
    set_parent(app.world, child, parent)
    app.update(dt=0.01)
    np.testing.assert_allclose(app.world.get(child, GlobalTransform).translation,
                               [0.0, 1.0, 0.0], atol=1e-5)


def test_moving_parent_updates_children_same_frame():
    app = App(capacity=16)
    app.add_plugins(TransformPlugin())
    parent = app.world.spawn(*transform_bundle())
    child = app.world.spawn(*transform_bundle(translation=(0.0, 1.0, 0.0)))
    set_parent(app.world, child, parent)

    @system
    def move_parent(q=Query(Transform, without=[ChildOf])):
        q.transform.translation = q.transform.translation + jnp.array([1.0, 0.0, 0.0])

    app.add_systems(Update, move_parent)
    app.update(dt=0.01)
    np.testing.assert_allclose(app.world.get(child, GlobalTransform).translation,
                               [1.0, 1.0, 0.0], atol=1e-5)
    app.update(dt=0.01)
    np.testing.assert_allclose(app.world.get(child, GlobalTransform).translation,
                               [2.0, 1.0, 0.0], atol=1e-5)


def test_children_and_recursive_despawn():
    app = App(capacity=16)
    app.add_plugins(TransformPlugin())
    parent = app.world.spawn(*transform_bundle())
    c1 = app.world.spawn(*transform_bundle())
    c2 = app.world.spawn(*transform_bundle())
    g1 = app.world.spawn(*transform_bundle())
    set_parent(app.world, c1, parent)
    set_parent(app.world, c2, parent)
    set_parent(app.world, g1, c1)
    assert sorted(children_of(app.world, parent)) == sorted([c1.index, c2.index])
    despawn_recursive(app.world, parent)
    assert app.world.entity_count(Transform) == 0
