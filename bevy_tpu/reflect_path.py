"""Reflection path access (reference twin: bevy_reflect's `path` module —
`ParsedPath`/`GetPath`, crates/bevy_reflect/src/path/mod.rs): parse a
string like `translation[1]` or `.stats.hp` once, then get/set through it
on reflected data.

The TPU build's reflected values are host-side pytrees: component
namespaces from `World.get`, dicts, sequences, numpy/jax arrays and
plain attribute objects. Paths address any nesting of those. World-level
helpers resolve the first segment as a registered component name so a
single path string addresses an entity's data end-to-end
(`reflect_entity_get(world, e, "transform.translation[1]")`), the shape
BRP and inspectors consume (ref: bevy_remote path-style component
access + bevy_reflect/src/path/parse.rs)."""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, List, Tuple, Union

import numpy as np


@dataclass(frozen=True)
class Field:
    """`.name` — named field / dict key (ref: Access::Field)."""
    name: str


@dataclass(frozen=True)
class Index:
    """`[i]` — sequence / array element (ref: Access::ListIndex)."""
    index: int


@dataclass(frozen=True)
class FieldAt:
    """`#i` — positional field access (ref: Access::FieldIndex)."""
    index: int


Access = Union[Field, Index, FieldAt]


class PathParseError(ValueError):
    pass


class PathApplyError(ValueError):
    pass


def parse_path(path: str) -> Tuple[Access, ...]:
    """Parse bevy path syntax: `.field`, `field`, `[3]`, `#2`, chained.
    A leading `.` is optional (ref: parse.rs PathParser)."""
    out: List[Access] = []
    i, n = 0, len(path)
    while i < n:
        c = path[i]
        if c == ".":
            i += 1
            continue
        if c == "[":
            j = path.find("]", i)
            if j < 0:
                raise PathParseError(f"unclosed '[' in {path!r}")
            tok = path[i + 1:j]
            try:
                out.append(Index(int(tok)))
            except ValueError:
                raise PathParseError(f"bad index {tok!r} in {path!r}")
            i = j + 1
        elif c == "#":
            j = i + 1
            while j < n and (path[j].isdigit() or (j == i + 1 and
                                                   path[j] == "-")):
                j += 1
            tok = path[i + 1:j]
            if not tok:
                raise PathParseError(f"bad '#' access in {path!r}")
            out.append(FieldAt(int(tok)))
            i = j
        else:
            j = i
            while j < n and path[j] not in ".[#":
                j += 1
            name = path[i:j]
            if not name:
                raise PathParseError(f"empty segment in {path!r}")
            out.append(Field(name))
            i = j
    return tuple(out)


def _field_names(obj) -> List[str]:
    if isinstance(obj, dict):
        return list(obj.keys())
    if hasattr(obj, "__dict__"):
        return list(vars(obj).keys())
    raise PathApplyError(f"{type(obj).__name__} has no named fields")


def _get_one(obj, acc: Access):
    if isinstance(acc, Field):
        if isinstance(obj, dict):
            if acc.name not in obj:
                raise PathApplyError(f"no key {acc.name!r}")
            return obj[acc.name]
        if not hasattr(obj, acc.name):
            raise PathApplyError(
                f"{type(obj).__name__} has no field {acc.name!r}")
        return getattr(obj, acc.name)
    if isinstance(acc, FieldAt):
        names = _field_names(obj)
        try:
            return _get_one(obj, Field(names[acc.index]))
        except IndexError:
            raise PathApplyError(f"field index {acc.index} out of range")
    # Index
    try:
        return obj[acc.index]
    except (IndexError, TypeError) as e:
        raise PathApplyError(f"cannot index {type(obj).__name__}: {e}")


def _set_one(obj, acc: Access, value):
    """In-place where possible; returns the (possibly new) container —
    numpy scalars/arrays and tuples are immutable-ish, so parents rebuild."""
    if isinstance(acc, FieldAt):
        return _set_one(obj, Field(_field_names(obj)[acc.index]), value)
    if isinstance(acc, Field):
        if isinstance(obj, dict):
            obj[acc.name] = value
        else:
            setattr(obj, acc.name, value)
        return obj
    if isinstance(obj, np.ndarray):
        obj = obj.copy() if not obj.flags.writeable else obj
        obj[acc.index] = value
        return obj
    if isinstance(obj, tuple):
        lst = list(obj)
        lst[acc.index] = value
        return tuple(lst)
    if isinstance(obj, list):
        obj[acc.index] = value
        return obj
    # jax arrays: functional update
    if hasattr(obj, "at"):
        return obj.at[acc.index].set(value)
    raise PathApplyError(f"cannot set index on {type(obj).__name__}")


def path_get(obj, path: Union[str, Tuple[Access, ...]]):
    """ref: GetPath::reflect_path."""
    accs = parse_path(path) if isinstance(path, str) else path
    for acc in accs:
        obj = _get_one(obj, acc)
    return obj


def path_set(obj, path: Union[str, Tuple[Access, ...]], value):
    """ref: GetPath::reflect_path_mut + set. Returns the updated root
    (identical to `obj` when every step was in-place mutable)."""
    accs = parse_path(path) if isinstance(path, str) else path
    if not accs:
        raise PathApplyError("empty path")
    # walk down, remembering the chain to rebuild immutable steps
    chain = [obj]
    for acc in accs[:-1]:
        chain.append(_get_one(chain[-1], acc))
    updated = _set_one(chain[-1], accs[-1], value)
    # bubble replacements upward where containers were rebuilt
    for k in range(len(accs) - 2, -1, -1):
        if updated is chain[k + 1]:
            return obj
        updated = _set_one(chain[k], accs[k], updated)
    return updated


# ---- world-level path access (component-name head segment) ----

def _resolve_component(world, name: str):
    # exact / case-insensitive match first
    for spec_name, spec in world.specs.items():
        if spec_name == name or spec_name.lower() == name.lower():
            return spec
    # unique-suffix match: a component registered under a module-qualified
    # storage name ("mymod.ship", see ecs/component._claim_name) must stay
    # addressable by its bare class name when that is unambiguous in THIS
    # world (ref: bevy_reflect short type-path lookup,
    # bevy_reflect/src/type_registry.rs get_with_short_type_path).
    from bevy_tpu.ecs.component import bare_name
    low = name.lower()
    hits = [spec for spec_name, spec in world.specs.items()
            if bare_name(spec_name).lower() == low]
    if len(hits) == 1:
        return hits[0]
    if len(hits) > 1:
        raise PathApplyError(
            f"ambiguous component {name!r}: matches "
            f"{sorted(s.name for s in hits)} — use the qualified name")
    raise PathApplyError(f"unknown component {name!r}")


def _resolve_component_head(world, accs):
    """Match the LONGEST run of leading Field segments as the component
    name — module-qualified storage names contain dots ("mymod.ship"),
    which the path parser splits into separate segments. Returns
    (spec, remaining_accs)."""
    best = None
    joined = ""
    for k, acc in enumerate(accs):
        if not isinstance(acc, Field):
            break
        joined = f"{joined}.{acc.name}" if joined else acc.name
        try:
            best = (_resolve_component(world, joined), accs[k + 1:])
        except PathApplyError:
            continue
    if best is None:
        _resolve_component(world, accs[0].name)   # raise with best message
    return best


def reflect_entity_get(world, entity, path: str):
    """`"component.field[idx]…"` → value from the world's host view.
    ref: BRP world.get_components + bevy_reflect path access composed."""
    accs = parse_path(path)
    if not accs or not isinstance(accs[0], Field):
        raise PathParseError("path must start with a component name")
    spec, rest = _resolve_component_head(world, accs)
    ns = world.get(entity, spec.cls)
    if not rest:
        return ns
    return path_get(ns, rest)


def reflect_entity_set(world, entity, path: str, value):
    """Write through a path: reads the component's host view, applies the
    nested update, writes back ONLY the touched field via set_field (other
    fields untouched, changed tick stamped)."""
    accs = parse_path(path)
    if len(accs) < 2 or not isinstance(accs[0], Field):
        raise PathParseError(
            "path must be 'component.field…' for entity writes")
    spec, rest = _resolve_component_head(world, accs)
    if not rest or not isinstance(rest[0], (Field, FieldAt)):
        raise PathParseError(
            "path must be 'component.field…' for entity writes")
    ns = world.get(entity, spec.cls)
    if isinstance(rest[0], FieldAt):
        fname = list(vars(ns).keys())[rest[0].index]
    else:
        fname = rest[0].name
    if len(rest) == 1:
        new_val = value
    else:
        cur = getattr(ns, fname)
        new_val = path_set(cur, rest[1:], value)
    world.set_field(entity, spec.cls, fname, new_val)
    return new_val
