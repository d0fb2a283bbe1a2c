"""Device-tier Commands: masked structural mutation inside the jitted step
(reference twin: Commands `system/commands/mod.rs:106` + ApplyDeferred).

The reference queues closures and applies them at sync points, moving
entities between archetype tables. Archetype moves are the one thing XLA
hates, so here structural edits are masked scatter ops against the global
fixed-capacity pools: despawn clears alive bits (+ bumps generations), spawn
claims free rows via `nonzero(size=budget)`. No retrace as long as capacity
holds. Ops are recorded during the system body and applied in order at merge
time — the same deferred semantics as the reference.
"""

from __future__ import annotations

from typing import Any, List

import jax.numpy as jnp

from bevy_tpu.ecs._state import set_in
from bevy_tpu.ecs.component import ComponentInstance, get_spec


class Commands:
    def __init__(self, spawn_comps=(), budget: int = 0):
        """`spawn_comps`/`budget`: components this system may spawn and the
        static per-frame row budget (pre-registers storage; budget bounds the
        nonzero() size so shapes stay static)."""
        self.spawn_comps = [get_spec(c) for c in spawn_comps]
        self.budget = budget

    def reads(self):
        return set()

    def writes(self):
        # Deferred like the reference: does not conflict with component access.
        return set()

    def build(self, state, world, sysctx):
        return CommandsView(self, world)


class CommandsView:
    def __init__(self, param: Commands, world):
        self._param = param
        self._world = world
        self._ops: List[Any] = []

    def despawn(self, mask):
        """Despawn all rows where mask is True (bool (capacity,))."""
        self._ops.append(("despawn", mask))

    def despawn_entities(self, rows, valid=None):
        """Despawn by row-index array; `valid` masks which lanes count."""
        self._ops.append(("despawn_rows", rows, valid))

    def spawn(self, *components: ComponentInstance, count=None, budget=None):
        """Spawn up to `budget` entities (static), `count` of them real
        (traced). Field values: (budget, *shape) arrays or broadcastable.
        Returns nothing — deferred (ref: commands apply at sync points)."""
        budget = budget or self._param.budget
        if budget <= 0:
            raise ValueError("Commands.spawn needs a positive budget "
                             "(declare via Commands(budget=N) or spawn(budget=N))")
        count = budget if count is None else count
        from bevy_tpu.ecs.component import expand_required
        self._ops.append(("spawn", expand_required(components), count, budget))

    def insert(self, mask, *components: ComponentInstance):
        """Add/overwrite components on all rows where mask is True. Required
        components (ref: #[require]) are added only to rows lacking them."""
        from bevy_tpu.ecs.component import expand_required
        expanded = expand_required(components)
        self._ops.append(("insert", mask, tuple(expanded[:len(components)])))
        for inst in expanded[len(components):]:
            self._ops.append(("insert_missing", mask, (inst,)))

    def remove(self, mask, *comps):
        self._ops.append(("remove", mask, [get_spec(c) for c in comps]))

    # ------------------------------------------------------------------

    def merge(self, state, tick):
        if not self._ops:
            return state
        self._world.mark_device_dirty()
        for op in self._ops:
            kind = op[0]
            if kind == "despawn":
                state = _apply_despawn(state, op[1])
            elif kind == "despawn_rows":
                _, rows, valid = op
                n = state["ent"]["alive"].shape[0]
                mask = jnp.zeros(n, jnp.bool_)
                rows = jnp.asarray(rows, jnp.int32)
                if valid is not None:
                    rows = jnp.where(valid, rows, n)
                mask = mask.at[rows].set(True, mode="drop")
                state = _apply_despawn(state, mask)
            elif kind == "spawn":
                _, components, count, budget = op
                state = _apply_spawn(state, components, count, budget, tick)
            elif kind == "insert":
                _, mask, components = op
                state = _apply_insert(state, mask, components, tick)
            elif kind == "insert_missing":
                # auto-required component: don't clobber rows that have it
                _, mask, components = op
                for inst in components:
                    have = state["comp"][inst.spec.name]["has"]
                    state = _apply_insert(state, mask & ~have, [inst], tick)
            elif kind == "remove":
                _, mask, specs = op
                for spec in specs:
                    store = state["comp"][spec.name]
                    state = set_in(
                        state, ("comp", spec.name),
                        dict(store, has=store["has"] & ~mask,
                             removed=jnp.where(
                                 mask & store["has"], state["tick"],
                                 store["removed"])))
        return state


def _apply_despawn(state, mask):
    mask = mask & state["ent"]["alive"]
    tick = state["tick"]
    ent = {
        "alive": state["ent"]["alive"] & ~mask,
        "generation": state["ent"]["generation"] + mask.astype(jnp.int32),
    }
    state = set_in(state, ("ent",), ent)
    comp = {}
    for name, store in state["comp"].items():
        comp[name] = dict(
            store, has=store["has"] & ~mask,
            removed=jnp.where(mask & store["has"], tick, store["removed"]))
    return set_in(state, ("comp",), comp)


def _apply_spawn(state, components, count, budget, tick):
    alive = state["ent"]["alive"]
    n = alive.shape[0]
    (rows,) = jnp.nonzero(~alive, size=budget, fill_value=n)
    lane = jnp.arange(budget, dtype=jnp.int32)
    valid = (lane < count) & (rows < n)
    rows = jnp.where(valid, rows, n).astype(jnp.int32)
    state = set_in(state, ("ent", "alive"), alive.at[rows].set(True, mode="drop"))
    for inst in components:
        spec = inst.spec if isinstance(inst, ComponentInstance) else get_spec(inst)
        values = inst.values if isinstance(inst, ComponentInstance) else {}
        store = state["comp"][spec.name]
        new_fields = dict(store["f"])
        for fname, fld in spec.fields.items():
            val = values.get(fname, fld.default)
            val = jnp.broadcast_to(jnp.asarray(val, fld.dtype), (budget,) + fld.shape)
            new_fields[fname] = store["f"][fname].at[rows].set(val, mode="drop")
        new_store = {
            "has": store["has"].at[rows].set(True, mode="drop"),
            "added": store["added"].at[rows].set(tick, mode="drop"),
            "changed": store["changed"].at[rows].set(tick, mode="drop"),
            "removed": store["removed"],
            "f": new_fields,
        }
        state = set_in(state, ("comp", spec.name), new_store)
    return state


def _apply_insert(state, mask, components, tick):
    for inst in components:
        spec = inst.spec
        store = state["comp"][spec.name]
        new_fields = dict(store["f"])
        for fname, fld in spec.fields.items():
            if fname not in inst.values:
                continue
            old = store["f"][fname]
            val = jnp.broadcast_to(jnp.asarray(inst.values[fname], fld.dtype), old.shape)
            bmask = mask.reshape(mask.shape + (1,) * (old.ndim - 1))
            new_fields[fname] = jnp.where(bmask, val, old)
        new_store = {
            "has": store["has"] | mask,
            "added": jnp.where(mask & ~store["has"], tick, store["added"]),
            "changed": jnp.where(mask, tick, store["changed"]),
            "removed": store["removed"],
            "f": new_fields,
        }
        state = set_in(state, ("comp", spec.name), new_store)
    return state
