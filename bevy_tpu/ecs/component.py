"""Component definition & registry (reference twin: bevy_ecs component/
— ComponentInfo `component/info.rs:31`, registration `component/register.rs`).

A component is a named struct of fixed-shape fields. Storage is
structure-of-arrays: each field is one `(capacity, *shape)` device array in
the world state pytree (ref's Table columns, `storage/table/mod.rs:202` —
but global dense pools indexed by entity id instead of per-archetype tables;
see ARCHITECTURE.md for why that is the TPU-native layout).

Usage::

    @component
    class Velocity:
        value = field(2)                 # (2,) f32, zeros default

    @component
    class Player:                        # marker component (no fields)
        pass

    world.spawn(Velocity(value=(1.0, 0.0)), Player())
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import jax.numpy as jnp
import numpy as np


def _snake(name: str) -> str:
    return re.sub(r"(?<!^)(?=[A-Z])", "_", name).lower()


@dataclass(frozen=True)
class Field:
    shape: Tuple[int, ...]
    dtype: Any
    default: Any
    entity_ref: bool = False


def field(shape=(), dtype=jnp.float32, default=None, entity_ref=False):
    """Declare a component field. `shape` is the per-entity trailing shape
    (scalar = ()). `default` fills unspecified values at spawn.
    `entity_ref` marks the field as holding entity row ids — serialization
    remaps it on load (ref: MapEntities, entity/map_entities.rs)."""
    if isinstance(shape, int):
        shape = (shape,)
    shape = tuple(int(s) for s in shape)
    if default is None:
        default = np.zeros(shape, dtype=np.dtype(dtype) if dtype != jnp.bfloat16 else np.float32)
        if dtype == jnp.bfloat16:
            default = default.astype(jnp.bfloat16)
    return Field(shape=shape, dtype=dtype, default=default,
                 entity_ref=entity_ref)


class ComponentSpec:
    """Registered metadata for one component type (ref: ComponentInfo)."""

    def __init__(self, cls, name: str, fields: Dict[str, Field], sparse_capacity=None,
                 requires=()):
        self.cls = cls
        self.name = name
        # short attribute alias for query views (q.<attr>): the plain
        # snake name even when `name` was module-qualified to dodge a
        # cross-module class-name collision (see _claim_name)
        self.attr = _snake(cls.__name__)
        self.fields = fields
        # Reserved: per-component pool capacity for rare components.
        self.sparse_capacity = sparse_capacity
        # required components (ref: #[require]): classes or
        # ComponentInstances auto-inserted at spawn when absent
        self.requires = tuple(requires)

    def __repr__(self):
        return f"ComponentSpec({self.name}, fields={list(self.fields)})"


# Global spec registry: class -> ComponentSpec. Worlds allocate storage
# lazily on first use (ref: World::register_component).
_REGISTRY: Dict[type, ComponentSpec] = {}

# Storage-name ownership: snake name -> owning class. Two DIFFERENT
# classes may share a class name across modules (e.g. two test modules
# each defining `Health`); the second one is qualified by its module —
# the reference's full-type-path disambiguation (bevy_reflect type
# paths). Without this, World.register_component would silently alias
# the two components onto one storage pool.
_NAMES: Dict[str, type] = {}


def _claim_name(cls, base: str) -> str:
    # identity-based: any DISTINCT class object gets its own storage name
    # (two same-named classes across modules, function-local duplicates,
    # module re-execution all included) — a collision must never alias
    # two components onto one pool. Qualified/countered names stay
    # addressable by bare suffix (reflect_path/scene strip the module
    # prefix and '#n' counter when matching).
    if _NAMES.get(base) in (None, cls):
        _NAMES[base] = cls
        return base
    qual = f"{cls.__module__}.{base}"
    if _NAMES.get(qual) in (None, cls):
        _NAMES[qual] = cls
        return qual
    n = 2
    while True:
        cand = f"{qual}#{n}"
        if _NAMES.get(cand) in (None, cls):
            _NAMES[cand] = cls
            return cand
        n += 1


def bare_name(name: str) -> str:
    """Strip module qualification and '#n' counter from a storage name
    ('mymod.ship#2' → 'ship') — the short-type-path view used by
    reflect-path and snapshot name resolution."""
    return name.rsplit(".", 1)[-1].split("#", 1)[0]


def get_spec(comp) -> ComponentSpec:
    if isinstance(comp, ComponentSpec):
        return comp
    if isinstance(comp, ComponentInstance):
        return comp.spec
    spec = _REGISTRY.get(comp)
    if spec is None:
        raise TypeError(f"{comp!r} is not a registered component (use @component)")
    return spec


class ComponentInstance:
    """A spawnable value: spec + per-field values (host-side)."""

    __slots__ = ("spec", "values")

    def __init__(self, spec: ComponentSpec, values: Dict[str, Any]):
        self.spec = spec
        self.values = values

    def __repr__(self):
        return f"{self.spec.name}({self.values})"


def component(cls=None, *, name: Optional[str] = None, requires=()):
    """Class decorator registering a component type.

    The decorated class becomes a factory: calling it returns a
    `ComponentInstance` holding field values (defaults applied at spawn).
    The class object itself is the handle used in queries.

    `requires` (ref: #[require], bevy_ecs/src/component/require.rs): other
    component classes — or ComponentInstances carrying constructor values —
    auto-inserted (transitively) whenever this component is spawned or
    inserted on an entity that lacks them. Explicit values always win.
    """

    def wrap(cls):
        fields: Dict[str, Field] = {}
        for key, val in list(vars(cls).items()):
            if isinstance(val, Field):
                fields[key] = val
        spec = ComponentSpec(cls, name or _claim_name(cls, _snake(cls.__name__)),
                             fields, requires=requires)
        _REGISTRY[cls] = spec

        def __new__(klass, **kwargs):
            unknown = set(kwargs) - set(fields)
            if unknown:
                raise TypeError(f"{spec.name}: unknown fields {unknown}")
            return ComponentInstance(spec, kwargs)

        cls.__new__ = staticmethod(__new__)
        cls.__component_spec__ = spec
        return cls

    if cls is not None:
        return wrap(cls)
    return wrap


def expand_required(components):
    """Instances + transitively required components not already present
    (ref: the require-graph walk at insert, bevy_ecs component/require.rs).
    Order: explicit components first, then requirements breadth-first."""
    out = list(components)
    present = set()
    queue = []
    for inst in components:
        spec = inst.spec if isinstance(inst, ComponentInstance) else get_spec(inst)
        present.add(spec.name)
        queue.extend(spec.requires)
    while queue:
        req = queue.pop(0)
        inst = req if isinstance(req, ComponentInstance) else req()
        if inst.spec.name in present:
            continue
        present.add(inst.spec.name)
        out.append(inst)
        queue.extend(inst.spec.requires)
    return out


def resource(cls=None, *, name: Optional[str] = None):
    """Like @component but for singleton resources (ref: Resource; the
    reference backs resources with entities, `bevy_ecs/src/resource.rs:91` —
    here they are named pytrees in `state['res']`)."""
    return component(cls, name=name) if cls is not None else component(name=name)


def define_component(name: str, fields: dict, requires=()):
    """Create a component type at runtime (ref: examples/ecs/dynamic.rs —
    components whose layout is only known at runtime, e.g. from config
    or a network schema).

        Pos = define_component("pos3", {"xyz": field(3)})

    Field values are `field(...)` descriptors; the returned class is a
    normal @component (usable in Query/spawn/Commands)."""
    cls = type(name, (), dict(fields))
    return component(cls, name=name, requires=requires)
