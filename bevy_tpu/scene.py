"""World serialization & scenes (reference twin: bevy_world_serialization —
DynamicWorld extraction `src/dynamic_world.rs`, serde round-trip
`src/serde.rs`, entity remapping via MapEntities
`bevy_ecs/src/entity/map_entities.rs`; spawning mirrors bevy_scene's
SceneSpawner).

A snapshot is a plain dict (JSON-serializable): entity rows with per-
component field values. Loading spawns fresh rows and remaps
`entity_ref` fields (e.g. ChildOf.parent) through the old→new map —
the reference's MapEntities pass.
"""

from __future__ import annotations

import json
from typing import Dict, Iterable, Optional

import jax
import numpy as np

from bevy_tpu.ecs.component import get_spec
from bevy_tpu.ecs.entity import Entity


def save_world(world, components: Optional[Iterable] = None,
               entities: Optional[Iterable[int]] = None) -> dict:
    """Extract a snapshot (ref: DynamicWorldBuilder with filters)."""
    world._sync()
    names = ([get_spec(c).name for c in components] if components is not None
             else list(world.specs.keys()))
    rows = (np.asarray(list(entities), np.int64) if entities is not None
            else np.flatnonzero(world._host_alive))
    host = {n: {f: np.asarray(jax.device_get(a))
                for f, a in world.state["comp"][n]["f"].items()}
            for n in names if n in world.state["comp"]}
    out = {"entities": []}
    for row in rows:
        row = int(row)
        comps = {}
        for n in names:
            if n in world._host_has and world._host_has[n][row]:
                comps[n] = {f: host[n][f][row].tolist()
                            for f in world.specs[n].fields}
        out["entities"].append({"entity": row, "components": comps})
    return out


def load_world(world, snapshot: dict) -> Dict[int, Entity]:
    """Spawn a snapshot into `world`, remapping entity references
    (ref: DynamicWorld::write_to_world + MapEntities)."""
    mapping: Dict[int, Entity] = {}
    for ent in snapshot["entities"]:
        mapping[int(ent["entity"])] = world.spawn()
    for ent in snapshot["entities"]:
        target = mapping[int(ent["entity"])]
        for name, fields in ent["components"].items():
            spec = _resolve_snapshot_component(world, name)
            if spec is None:
                raise KeyError(f"unknown component '{name}' in snapshot")
            values = {}
            for fname, fld in spec.fields.items():
                if fname not in fields:
                    continue
                val = np.asarray(fields[fname], np.dtype(fld.dtype)
                                 if fld.dtype != bool else bool)
                if fld.entity_ref:
                    val = _remap(val, mapping)
                values[fname] = val
            from bevy_tpu.ecs.component import ComponentInstance
            world.insert(target, ComponentInstance(spec, values))
    return mapping


def _resolve_snapshot_component(world, name: str):
    """Storage names are registration-order dependent (first class with a
    bare snake name keeps it; later same-named classes get module-
    qualified — ecs/component._claim_name). A snapshot written in one
    process must load in another with a different import order, so
    resolve tolerantly: exact match in the world, exact in the global
    registry, then unique bare-suffix match in either direction (ref:
    bevy always keys by the deterministic full type path)."""
    spec = world.specs.get(name)
    if spec is not None:
        return spec
    # the target world's own components win over the global registry:
    # a bare key written by another process most plausibly means "the
    # component this world knows by that short name"
    from bevy_tpu.ecs.component import bare_name
    bare = bare_name(name)
    hits = [s for n, s in world.specs.items() if bare_name(n) == bare]
    if len(hits) == 1:
        return hits[0]
    if len(hits) > 1:
        return None
    for _cls, s in _registry_items():
        if s.name == name:
            return world.register_component(s)
    hits = [s for _cls, s in _registry_items()
            if bare_name(s.name) == bare]
    if len(hits) == 1:
        return world.register_component(hits[0])
    return None


def _remap(val, mapping):
    flat = np.asarray(val).reshape(-1).astype(np.int64)
    out = np.asarray([mapping[int(v)].index if int(v) in mapping else int(v)
                      for v in flat], np.int32)
    return out.reshape(np.shape(val)) if np.shape(val) else out[0]


def _registry_items():
    from bevy_tpu.ecs.component import _REGISTRY
    return _REGISTRY.items()


def to_json(snapshot: dict) -> str:
    return json.dumps(snapshot)


def from_json(text: str) -> dict:
    return json.loads(text)


class Scene:
    """A reusable snapshot, spawnable many times (ref: bevy_scene Scene /
    SceneSpawner::spawn)."""

    def __init__(self, snapshot: dict):
        self.snapshot = snapshot

    @classmethod
    def from_world(cls, world, **kw):
        return cls(save_world(world, **kw))

    def spawn(self, world) -> Dict[int, Entity]:
        return load_world(world, self.snapshot)
