"""The World: host-side structural API over an HBM-resident state pytree
(reference twin: bevy_ecs World, `world/mod.rs:93`).

Storage model (see ARCHITECTURE.md): global dense SoA pools. Every
registered component owns, per field, one `(capacity, *shape)` device array
plus a `(capacity,)` membership mask; entity id == row index. Queries are
mask-ANDs + whole-column vector ops — the TPU-native equivalent of the
reference's archetype-table iteration (`storage/table/mod.rs:202`,
`query/iter.rs:178`).

Two tiers of structural mutation:
  * host tier (this file): spawn/despawn/insert/remove between jit steps;
    numpy mirrors track liveness; capacity growth doubles arrays and bumps
    `structure_version` (the only retrace trigger).
  * device tier (`commands.py`): masked in-jit spawn/despawn against the
    same pools (ref: Commands + ApplyDeferred,
    `system/commands/mod.rs:106`).
"""

from __future__ import annotations

from types import SimpleNamespace
from typing import Any, Dict, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

from bevy_tpu.ecs.component import (
    ComponentInstance, ComponentSpec, get_spec,
)
from bevy_tpu.ecs.entity import Entity


def _as_field_array(value, count, fld):
    """Broadcast a host value to a (count, *shape) array of the field dtype."""
    arr = np.asarray(jax.device_get(value) if isinstance(value, jnp.ndarray) else value)
    target = (count,) + fld.shape
    if arr.shape == target:
        return jnp.asarray(arr, fld.dtype)
    return jnp.broadcast_to(jnp.asarray(arr, fld.dtype), target)


class World:
    DEFAULT_CAPACITY = 1024

    def __init__(self, capacity: int = DEFAULT_CAPACITY):
        self.capacity = int(capacity)
        self.structure_version = 0
        self.specs: Dict[str, ComponentSpec] = {}
        self.message_specs: Dict[str, ComponentSpec] = {}
        self.message_capacity: Dict[str, int] = {}
        self.state: Dict[str, Any] = {
            "ent": {
                "alive": jnp.zeros(self.capacity, jnp.bool_),
                "generation": jnp.zeros(self.capacity, jnp.int32),
            },
            "comp": {},
            "res": {},
            "msg": {},
            "obs": {},
            "sys": {},
            "tick": jnp.asarray(1, jnp.int32),
            "frame": jnp.asarray(0, jnp.int32),
        }
        # Host mirrors of liveness for structural allocation (ref: Entities
        # metadata, entity/mod.rs:827). Stale after in-jit Commands ran;
        # mark via _device_dirty and resync lazily.
        self._host_alive = np.zeros(self.capacity, bool)
        self._host_gen = np.zeros(self.capacity, np.int32)
        self._host_has: Dict[str, np.ndarray] = {}
        self._device_dirty = False

    def component_rows(self, comp) -> int:
        """Host-known row count for a component — used for TRACE-TIME fast
        paths (e.g. skipping hierarchy propagation in flat worlds). The
        0→nonzero transition bumps structure_version so cached plans
        retrace. In-jit Commands inserts are not reflected until the next
        host sync (documented limitation)."""
        self._sync()
        name = get_spec(comp).name
        has = self._host_has.get(name)
        return 0 if has is None else int(has.sum())

    # ------------------------------------------------------------------
    # registration

    def register_component(self, comp) -> ComponentSpec:
        spec = get_spec(comp)
        if spec.name in self.specs:
            if self.specs[spec.name] is not spec:
                # defense in depth: @component's name claiming should
                # make this unreachable (see ecs/component._claim_name)
                raise ValueError(
                    f"component name {spec.name!r} already registered "
                    f"by a different type")
            return spec
        self.specs[spec.name] = spec
        n = self.capacity
        store = {
            "has": jnp.zeros(n, jnp.bool_),
            "added": jnp.zeros(n, jnp.int32),
            "changed": jnp.zeros(n, jnp.int32),
            "removed": jnp.zeros(n, jnp.int32),
            "f": {
                fname: jnp.zeros((n,) + fld.shape, fld.dtype)
                for fname, fld in spec.fields.items()
            },
        }
        self.state["comp"][spec.name] = store
        self._host_has[spec.name] = np.zeros(n, bool)
        self.structure_version += 1
        # required components get storage too (ref: #[require] registration)
        for req in spec.requires:
            self.register_component(
                req.spec if isinstance(req, ComponentInstance) else req)
        return spec

    def add_message(self, msg, capacity: int = 1024) -> ComponentSpec:
        """Register a double-buffered message queue (ref: Messages<M>
        two-frame ring, message/messages.rs:95)."""
        spec = get_spec(msg)
        if spec.name in self.message_specs:
            return spec
        self.message_specs[spec.name] = spec
        self.message_capacity[spec.name] = capacity
        self.state["msg"][spec.name] = {
            "f": {
                fname: jnp.zeros((2, capacity) + fld.shape, fld.dtype)
                for fname, fld in spec.fields.items()
            },
            "count": jnp.zeros(2, jnp.int32),
            # per-slot write tick: backs the reader cursor (ref:
            # MessageCursor, message/messages.rs — each reader sees each
            # message once, regardless of writer/reader order)
            "t": jnp.zeros((2, capacity), jnp.int32),
            "cur": jnp.asarray(0, jnp.int32),
        }
        self.structure_version += 1
        return spec

    # ------------------------------------------------------------------
    # resources (ref: World resources; entity-backed in the reference,
    # named pytrees here)

    def insert_resource(self, res, value: Optional[Any] = None):
        if isinstance(res, ComponentInstance):
            spec = res.spec
            vals = {}
            for fname, fld in spec.fields.items():
                v = res.values.get(fname, fld.default)
                vals[fname] = jnp.asarray(v, fld.dtype)
            self.state["res"][spec.name] = vals
            name = spec.name
        elif isinstance(res, str):
            name = res
            self.state["res"][name] = jax.tree.map(jnp.asarray, value)
        else:
            raise TypeError("insert_resource expects a component instance or (name, pytree)")
        self.structure_version += 1
        return name

    def has_resource(self, res) -> bool:
        name = res if isinstance(res, str) else get_spec(res).name
        return name in self.state["res"]

    def resource(self, res):
        """Host copy of a resource as an attribute namespace."""
        name = res if isinstance(res, str) else get_spec(res).name
        val = jax.device_get(self.state["res"][name])
        if isinstance(val, dict):
            return SimpleNamespace(**val)
        return val

    def resource_raw(self, res):
        name = res if isinstance(res, str) else get_spec(res).name
        return self.state["res"][name]

    def set_resource_field(self, res, fname: str, value):
        name = res if isinstance(res, str) else get_spec(res).name
        store = dict(self.state["res"][name])
        store[fname] = jnp.asarray(value, store[fname].dtype) if hasattr(store[fname], "dtype") else value
        self.state["res"][name] = store

    # ------------------------------------------------------------------
    # liveness sync

    def mark_device_dirty(self):
        self._device_dirty = True

    def _sync(self):
        if not self._device_dirty:
            return
        # np.array (copy) NOT np.asarray: device_get buffers are read-only
        # and the host mirrors are mutated by spawn/despawn/insert/remove
        self._host_alive = np.array(self.state["ent"]["alive"])
        self._host_gen = np.array(self.state["ent"]["generation"])
        for name in self.specs:
            self._host_has[name] = np.array(self.state["comp"][name]["has"])
        self._device_dirty = False

    @property
    def num_alive(self) -> int:
        self._sync()
        return int(self._host_alive.sum())

    # ------------------------------------------------------------------
    # capacity growth (the one retrace trigger)

    def grow(self, min_capacity: int):
        new_cap = self.capacity
        while new_cap < min_capacity:
            new_cap *= 2
        if new_cap == self.capacity:
            return
        pad = new_cap - self.capacity

        def pad0(arr):
            widths = [(0, pad)] + [(0, 0)] * (arr.ndim - 1)
            return jnp.pad(arr, widths)

        ent = self.state["ent"]
        self.state["ent"] = {k: pad0(v) for k, v in ent.items()}
        self.state["comp"] = {
            name: {
                "has": pad0(c["has"]),
                "added": pad0(c["added"]),
                "changed": pad0(c["changed"]),
                "removed": pad0(c["removed"]),
                "f": {f: pad0(a) for f, a in c["f"].items()},
            }
            for name, c in self.state["comp"].items()
        }
        self._host_alive = np.pad(self._host_alive, (0, pad))
        self._host_gen = np.pad(self._host_gen, (0, pad))
        for name in self._host_has:
            self._host_has[name] = np.pad(self._host_has[name], (0, pad))
        self.capacity = new_cap
        self.structure_version += 1

    # ------------------------------------------------------------------
    # host-tier structural ops

    def spawn(self, *components: ComponentInstance) -> Entity:
        rows = self.spawn_batch(list(components), 1)
        return Entity(int(rows[0]), int(self._host_gen[rows[0]]))

    def spawn_batch(self, components: Sequence[ComponentInstance], count: int) -> np.ndarray:
        """Bulk spawn `count` entities sharing a component set; field values
        may be scalars (broadcast) or (count, *shape) arrays. Returns row
        indices. (ref: World::spawn_batch)"""
        from bevy_tpu.ecs.component import expand_required
        components = expand_required(components)
        self._sync()
        free = np.flatnonzero(~self._host_alive)
        if len(free) < count:
            self.grow(self.capacity + (count - len(free)))
            free = np.flatnonzero(~self._host_alive)
        rows = free[:count]
        self._host_alive[rows] = True
        jrows = jnp.asarray(rows, jnp.int32)
        # advance the tick: host structural ops must stamp STRICTLY after
        # any last_run snapshot taken at the same tick (lifecycle observers
        # registered this tick would otherwise miss these rows)
        tick = self.state["tick"] + 1
        self.state["tick"] = tick

        ent = self.state["ent"]
        self.state["ent"] = {
            "alive": ent["alive"].at[jrows].set(True),
            "generation": ent["generation"],
        }
        for inst in components:
            spec = self.register_component(inst.spec if isinstance(inst, ComponentInstance) else inst)
            if not isinstance(inst, ComponentInstance):
                inst = ComponentInstance(spec, {})
            if not self._host_has[spec.name].any():
                self.structure_version += 1  # 0→nonzero: retrace fast paths
            self._host_has[spec.name][rows] = True
            store = self.state["comp"][spec.name]
            new_fields = {}
            for fname, fld in spec.fields.items():
                val = inst.values.get(fname, fld.default)
                arr = _as_field_array(val, count, fld)
                new_fields[fname] = store["f"][fname].at[jrows].set(arr)
            self.state["comp"][spec.name] = {
                "has": store["has"].at[jrows].set(True),
                "added": store["added"].at[jrows].set(tick),
                "changed": store["changed"].at[jrows].set(tick),
                "removed": store["removed"],
                "f": new_fields,
            }
        return rows

    def insert(self, entity: Union[Entity, int], *components: ComponentInstance):
        from bevy_tpu.ecs.component import expand_required
        row = entity.index if isinstance(entity, Entity) else int(entity)
        expanded = expand_required(components)
        # auto-required components never clobber existing values
        components = list(components) + [
            inst for inst in expanded[len(components):]
            if not self.has(row, inst.spec)]
        jrow = jnp.asarray([row], jnp.int32)
        tick = self.state["tick"] + 1  # see spawn_batch
        self.state["tick"] = tick
        for inst in components:
            spec = self.register_component(inst.spec)
            if not self._host_has[spec.name].any():
                self.structure_version += 1  # 0→nonzero: retrace fast paths
            self._host_has[spec.name][row] = True
            store = self.state["comp"][spec.name]
            new_fields = {}
            for fname, fld in spec.fields.items():
                val = inst.values.get(fname, fld.default)
                arr = _as_field_array(val, 1, fld)
                new_fields[fname] = store["f"][fname].at[jrow].set(arr)
            self.state["comp"][spec.name] = {
                "has": store["has"].at[jrow].set(True),
                "added": store["added"].at[jrow].set(tick),
                "changed": store["changed"].at[jrow].set(tick),
                "removed": store["removed"],
                "f": new_fields,
            }

    def remove(self, entity: Union[Entity, int], *comps):
        row = entity.index if isinstance(entity, Entity) else int(entity)
        tick = self.state["tick"] + 1  # see spawn_batch
        self.state["tick"] = tick
        for comp in comps:
            spec = get_spec(comp)
            if spec.name not in self.specs:
                continue
            self._host_has[spec.name][row] = False
            store = self.state["comp"][spec.name]
            self.state["comp"][spec.name] = dict(
                store, has=store["has"].at[row].set(False),
                removed=store["removed"].at[row].set(tick))

    def despawn(self, entity: Union[Entity, int]):
        row = entity.index if isinstance(entity, Entity) else int(entity)
        self._sync()
        if not self._host_alive[row]:
            return False
        self._host_alive[row] = False
        self._host_gen[row] += 1
        ent = self.state["ent"]
        self.state["ent"] = {
            "alive": ent["alive"].at[row].set(False),
            "generation": ent["generation"].at[row].add(1),
        }
        tick = self.state["tick"] + 1  # see spawn_batch
        self.state["tick"] = tick
        for name in self.specs:
            if self._host_has[name][row]:
                self._host_has[name][row] = False
                store = self.state["comp"][name]
                # stamp removal so Removed filters / OnRemove observers see
                # host-tier despawns too (ref: RemovedComponents covers
                # despawn, bevy_ecs/src/removal_detection.rs)
                self.state["comp"][name] = dict(
                    store, has=store["has"].at[row].set(False),
                    removed=store["removed"].at[row].set(tick))
        return True

    # ------------------------------------------------------------------
    # host-tier reads

    def is_alive(self, entity: Entity) -> bool:
        self._sync()
        return bool(self._host_alive[entity.index]) and \
            int(self._host_gen[entity.index]) == entity.generation

    def has(self, entity: Union[Entity, int], comp) -> bool:
        self._sync()
        row = entity.index if isinstance(entity, Entity) else int(entity)
        spec = get_spec(comp)
        return spec.name in self._host_has and bool(self._host_has[spec.name][row])

    def get(self, entity: Union[Entity, int], comp):
        """Host copy of one entity's component as a namespace."""
        row = entity.index if isinstance(entity, Entity) else int(entity)
        spec = get_spec(comp)
        store = self.state["comp"][spec.name]
        vals = {f: np.asarray(jax.device_get(a[row])) for f, a in store["f"].items()}
        return SimpleNamespace(**vals)

    def column(self, comp, fname: str) -> jnp.ndarray:
        """Whole field column (device array, capacity rows)."""
        return self.state["comp"][get_spec(comp).name]["f"][fname]

    def set_field(self, entity: Union[Entity, int], comp, fname: str,
                  value):
        """Host-tier single-field write: updates one field of an entity's
        existing component without touching its other fields (unlike
        `insert`, which resets unspecified fields to defaults). Stamps the
        changed tick; the `has` bit is left as-is."""
        row = entity.index if isinstance(entity, Entity) else int(entity)
        spec = get_spec(comp)
        fld = spec.fields[fname]
        store = self.state["comp"][spec.name]
        tick = self.state["tick"] + 1  # see spawn_batch
        self.state["tick"] = tick
        arr = _as_field_array(value, 1, fld)
        self.state["comp"][spec.name] = dict(
            store,
            changed=store["changed"].at[row].set(tick),
            f=dict(store["f"],
                   **{fname: store["f"][fname].at[row].set(arr[0])}))

    def clone_entity(self, entity: Union[Entity, int],
                     without=()) -> Entity:
        """Host-tier entity clone (ref: EntityCloner /
        EntityWorldMut::clone_and_spawn, bevy_ecs/src/entity/clone_entities.rs):
        spawns a new entity carrying copies of every component on the
        source, minus `without`. One gathered device read per component —
        a between-frames tool, not a per-frame op."""
        self._sync()
        row = entity.index if isinstance(entity, Entity) else int(entity)
        if not self._host_alive[row]:
            raise ValueError(
                f"clone_entity: entity row {row} is not alive")
        skip = {get_spec(c).name for c in without}
        insts = []
        for name, spec in self.specs.items():
            if name in skip or not self._host_has[name][row]:
                continue
            store = self.state["comp"][name]
            vals = {f: np.asarray(jax.device_get(a[row]))
                    for f, a in store["f"].items()}
            insts.append(ComponentInstance(spec, vals))
        return self.spawn(*insts)

    def mask_of(self, *comps) -> jnp.ndarray:
        m = self.state["ent"]["alive"]
        for comp in comps:
            m = m & self.state["comp"][get_spec(comp).name]["has"]
        return m

    def query_rows(self, *comps) -> np.ndarray:
        self._sync()
        m = self._host_alive.copy()
        for comp in comps:
            m &= self._host_has[get_spec(comp).name]
        return np.flatnonzero(m)

    def entity_count(self, *comps) -> int:
        return len(self.query_rows(*comps))


def _define_disabled():
    from bevy_tpu.ecs.component import component

    @component
    class Disabled:
        """Marker excluding an entity from every query that does not
        mention Disabled itself (ref: bevy_ecs entity_disabling.rs —
        DefaultQueryFilters). Insert to disable, remove to re-enable."""

    return Disabled


Disabled = _define_disabled()
