"""World serialization tests (ref model: bevy_world_serialization round-trip
tests — extraction, serde, entity remapping)."""

import jax.numpy as jnp
import numpy as np

from bevy_tpu import App, World, component, field
from bevy_tpu.scene import Scene, from_json, load_world, save_world, to_json
from bevy_tpu.transform import ChildOf, Transform, set_parent


@component
class Health:
    value = field((), jnp.float32, default=100.0)


def test_roundtrip_preserves_values():
    w = World(capacity=32)
    e = w.spawn(Transform(translation=(1.0, 2.0, 3.0)), Health(value=42.0))
    snap = save_world(w)
    text = to_json(snap)

    w2 = World(capacity=32)
    mapping = load_world(w2, from_json(text))
    e2 = mapping[e.index]
    assert np.allclose(w2.get(e2, Transform).translation, [1, 2, 3])
    assert float(w2.get(e2, Health).value) == 42.0


def test_entity_refs_remap():
    w = World(capacity=32)
    parent = w.spawn(Transform(translation=(5.0, 0.0, 0.0)))
    child = w.spawn(Transform())
    set_parent(w, child, parent)
    snap = save_world(w)

    w2 = World(capacity=32)
    w2.spawn(Health())  # occupy row 0 so remapping is observable
    mapping = load_world(w2, snap)
    new_child = mapping[child.index]
    new_parent = mapping[parent.index]
    assert int(w2.get(new_child, ChildOf).parent) == new_parent.index
    assert new_parent.index != parent.index  # actually remapped


def test_scene_spawns_many_copies():
    proto = World(capacity=8)
    proto.spawn(Health(value=7.0))
    scene = Scene.from_world(proto)

    w = World(capacity=64)
    for _ in range(5):
        scene.spawn(w)
    assert w.entity_count(Health) == 5
    rows = w.query_rows(Health)
    vals = np.asarray(w.column(Health, "value"))[rows]
    assert np.allclose(vals, 7.0)


def test_partial_component_filter():
    w = World(capacity=16)
    w.spawn(Transform(), Health())
    snap = save_world(w, components=[Health])
    assert "transform" not in snap["entities"][0]["components"]
    from bevy_tpu.ecs.component import get_spec
    assert get_spec(Health).name in snap["entities"][0]["components"]
