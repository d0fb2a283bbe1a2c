"""Reflection path access tests (ref model: bevy_reflect/src/path/mod.rs
doc examples — `.field`, `[index]`, `#index`, chained)."""

import numpy as np
import pytest

from bevy_tpu import App
from bevy_tpu.reflect_path import (
    Field, FieldAt, Index, PathApplyError, PathParseError, parse_path,
    path_get, path_set, reflect_entity_get, reflect_entity_set,
)
from bevy_tpu.transform import Transform, transform_bundle


def test_parse_basic():
    assert parse_path("foo.bar[2]#0") == (
        Field("foo"), Field("bar"), Index(2), FieldAt(0))
    assert parse_path(".leading") == (Field("leading"),)
    with pytest.raises(PathParseError):
        parse_path("a[unclosed")
    with pytest.raises(PathParseError):
        parse_path("a[x]")


def test_get_set_nested_dict_list():
    obj = {"a": [{"b": 10}, {"b": 20}], "c": (1, 2, 3)}
    assert path_get(obj, "a[1].b") == 20
    assert path_get(obj, "c[2]") == 3
    path_set(obj, "a[0].b", 99)
    assert obj["a"][0]["b"] == 99
    # tuple rebuild bubbles up into the parent dict
    path_set(obj, "c[1]", 42)
    assert obj["c"] == (1, 42, 3)


def test_field_at_positional():
    class P:
        def __init__(self):
            self.x = 1.0
            self.y = 2.0
    p = P()
    assert path_get(p, "#1") == 2.0
    path_set(p, "#0", 5.0)
    assert p.x == 5.0


def test_numpy_element_set():
    obj = {"v": np.array([1.0, 2.0, 3.0], np.float32)}
    path_set(obj, "v[1]", 9.0)
    assert obj["v"][1] == 9.0


def test_errors():
    with pytest.raises(PathApplyError):
        path_get({"a": 1}, "b")
    with pytest.raises(PathApplyError):
        path_get([1, 2], "[5]")


def test_world_entity_paths():
    app = App(capacity=8)
    e = app.world.spawn(*transform_bundle(translation=(1.0, 2.0, 3.0)))
    v = reflect_entity_get(app.world, e, "transform.translation[1]")
    assert float(v) == 2.0
    reflect_entity_set(app.world, e, "transform.translation[1]", 7.5)
    t = app.world.get(e, Transform)
    assert np.allclose(t.translation, [1.0, 7.5, 3.0])
    # whole-field write
    reflect_entity_set(app.world, e, "transform.translation",
                       np.array([0.0, 0.0, 9.0], np.float32))
    t = app.world.get(e, Transform)
    assert np.allclose(t.translation, [0.0, 0.0, 9.0])
