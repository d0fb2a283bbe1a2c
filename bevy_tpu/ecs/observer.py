"""Observers — push-based event reactions (reference twin: bevy_ecs
observer/ — Observer components `observer/distributed_storage.rs:207`,
`On<E>` param `observer/system_param.rs:38`, World::add_observer
`observer/mod.rs:55`).

TPU design: `trigger` writes events into a single-frame device buffer;
observer systems are spliced into the schedule immediately after the LAST
triggering system (trace-time ordering — the reference's dynamic dispatch
becomes static system insertion), read the buffer vectorized, and the
buffer clears at frame end. Unlike Messages (double-buffered, read next
frame), observers see events the same frame they fire — matching the
reference's immediacy semantics at schedule granularity.
"""

from __future__ import annotations

import jax.numpy as jnp

from bevy_tpu.ecs._state import set_in
from bevy_tpu.ecs.component import get_spec


def event(cls=None, **kw):
    """Decorator registering an observer-event struct (ref: #[derive(Event)]).
    Same field machinery as components."""
    from bevy_tpu.ecs.component import component as _component
    return _component(cls, **kw) if cls is not None else _component(**kw)


class Trigger:
    """System param for firing events (ref: Commands::trigger)."""

    def __init__(self, ev, budget: int = 64):
        self.spec = get_spec(ev)
        self.budget = budget

    def reads(self):
        return set()

    def writes(self):
        return {f"obs:{self.spec.name}"}

    def build(self, state, world, sysctx):
        return TriggerView(self, state["obs"][self.spec.name])


class TriggerView:
    def __init__(self, param, store):
        self._param = param
        self._store = store
        self._sends = []

    def trigger(self, count=None, **fields):
        """Fire up to `budget` events; `count` of them real (traced)."""
        self._sends.append((count, fields))

    def merge(self, state, tick):
        if not self._sends:
            return state
        name = self._param.spec.name
        budget = self._param.budget
        store = dict(state["obs"][name])
        fields = dict(store["f"])
        cap = next(iter(store["f"].values())).shape[0]
        for count, vals in self._sends:
            count = budget if count is None else count
            cnt = store["count"]
            lane = jnp.arange(budget, dtype=jnp.int32)
            rows = cnt + lane
            valid = (lane < count) & (rows < cap)
            rows = jnp.where(valid, rows, cap)
            for fname, fld in self._param.spec.fields.items():
                val = vals.get(fname, fld.default)
                val = jnp.broadcast_to(jnp.asarray(val, fld.dtype),
                                       (budget,) + fld.shape)
                fields[fname] = fields[fname].at[rows].set(val, mode="drop")
            store["count"] = cnt + jnp.sum(valid.astype(jnp.int32))
        store["f"] = fields
        return set_in(state, ("obs", name), store)


class On:
    """Observer system param: vectorized view of this frame's events
    (ref: On<E>). `.read()` -> (fields dict, valid mask); `.count()`.

    `bubble=True` additionally reads a parent-link hierarchy so the view
    can expand event targets up the ancestor chain (ref: event bubbling —
    bevy_ecs observer Traversal + bevy_picking/src/events.rs, where
    `Pointer<Click>` on a child is handleable on any ancestor).
    `via` picks the relationship component to traverse — the reference's
    generic `Traversal` type param — default the ChildOf hierarchy; any
    component with an entity-row `parent` field works (e.g. the UI
    tree's UiParent). `target_field` names the event's entity-row field
    to bubble from (default "row")."""

    def __init__(self, ev, bubble=False, target_field="row",
                 max_depth=16, via=None, parent_field="parent"):
        self.spec = get_spec(ev)
        self.bubble = bubble
        self.target_field = target_field
        self.max_depth = max_depth
        self.via_name = get_spec(via).name if via is not None else "child_of"
        self.parent_field = parent_field

    def reads(self):
        r = {f"obs:{self.spec.name}"}
        if self.bubble:
            r.add(f"comp:{self.via_name}")
        return r

    def writes(self):
        return set()

    def build(self, state, world, sysctx):
        via = state["comp"].get(self.via_name) if self.bubble else None
        return OnView(state["obs"][self.spec.name], via,
                      self.target_field, self.max_depth,
                      self.parent_field)


def bubble_rows(parent_col, has_childof, rows, valid, max_depth=16):
    """Vectorized ancestor expansion (ref: observer Traversal /
    `bevy_ecs/src/traversal.rs` — walk ChildOf up from the event target).
    rows (E,) int32 target rows, valid (E,) bool. Returns a (capacity,)
    bool mask marking every target and every ancestor on its chain —
    an observer "attached" to entity X handles the event iff mask[X]."""
    cap = parent_col.shape[0]
    cur = jnp.where(valid, rows, cap)         # cap = out-of-range sentinel
    mask = jnp.zeros(cap, bool)
    for _ in range(max_depth):
        mask = mask.at[cur].set(True, mode="drop")
        safe = jnp.clip(cur, 0, cap - 1)
        nxt = jnp.where(has_childof[safe] & (cur < cap),
                        parent_col[safe], cap)
        cur = nxt
    return mask


class OnView:
    def __init__(self, store, child_of=None, target_field="row",
                 max_depth=16, parent_field="parent"):
        self._store = store
        self._child_of = child_of
        self._target_field = target_field
        self._max_depth = max_depth
        self._parent_field = parent_field

    def read(self):
        cap = next(iter(self._store["f"].values())).shape[0]
        lane = jnp.arange(cap, dtype=jnp.int32)
        mask = lane < self._store["count"]
        return dict(self._store["f"]), mask

    def count(self):
        return self._store["count"]

    def bubble_mask(self):
        """(world capacity,) bool: event targets + all their ChildOf
        ancestors this frame (requires On(ev, bubble=True)). A handler on
        a parent entity P reacts with `view.bubble_mask()[P]` — the
        vectorized form of the reference's bubbled observer dispatch."""
        if self._child_of is None:
            raise ValueError("construct the param as On(ev, bubble=True)")
        fields, valid = self.read()
        rows = fields[self._target_field].astype(jnp.int32)
        return bubble_rows(self._child_of["f"][self._parent_field],
                           self._child_of["has"], rows, valid,
                           self._max_depth)

    def merge(self, state, tick):
        return state


class LifecycleTrigger:
    """Lifecycle observer trigger (ref: the Add/Insert/Remove lifecycle
    events, bevy_ecs/src/lifecycle.rs — OnAdd/OnInsert/OnRemove observers).
    Construct via OnAdd(Comp) / OnInsert(Comp) / OnRemove(Comp)."""

    def __init__(self, kind: str, comp):
        self.kind = kind
        self.spec = get_spec(comp)


def OnAdd(comp) -> LifecycleTrigger:
    """Fires for rows that newly gained `comp` (spawn or 0→1 insert)."""
    return LifecycleTrigger("add", comp)


def OnInsert(comp) -> LifecycleTrigger:
    """Fires for rows whose `comp` data was written. NOTE: a superset of the
    reference's OnInsert — in SoA column storage a re-insert and a query
    mutation both stamp the `changed` tick, so this also fires on Mut
    writes (the reference distinguishes them via archetype moves)."""
    return LifecycleTrigger("insert", comp)


def OnRemove(comp) -> LifecycleTrigger:
    """Fires for rows that lost `comp` (remove or despawn) since this
    observer last ran. The row may already be dead; its column data is
    still readable (despawn clears `has`, not the fields)."""
    return LifecycleTrigger("remove", comp)


class LifecycleMask:
    """System param for lifecycle observer bodies: `.mask` is the bool
    (capacity,) row mask of entities the trigger fired for since this
    system's last run (same tick semantics as the Added/Changed/Removed
    query filters — each splice point sees only fresh events, so an
    observer spliced N times per frame never double-fires)."""

    def __init__(self, trigger: LifecycleTrigger):
        self.trigger = trigger

    def reads(self):
        return {f"comp:{self.trigger.spec.name}"}

    def writes(self):
        return set()

    def build(self, state, world, sysctx):
        c = state["comp"][self.trigger.spec.name]
        last_run = state["sys"][sysctx["id"]]["last_run"]
        k = self.trigger.kind
        if k == "add":
            mask = c["has"] & (c["added"] > last_run)
        elif k == "insert":
            mask = c["has"] & (c["changed"] > last_run)
        else:  # remove
            mask = ~c["has"] & (c["removed"] > last_run)
        return _LifecycleView(mask)


class _LifecycleView:
    def __init__(self, mask):
        self.mask = mask

    def count(self):
        return jnp.sum(self.mask.astype(jnp.int32))

    def merge(self, state, tick):
        return state


def register_event_storage(world, ev, capacity: int = 64):
    spec = get_spec(ev)
    if "obs" not in world.state:
        world.state["obs"] = {}
    if spec.name in world.state["obs"]:
        return spec
    fields = {fname: jnp.zeros((capacity,) + fld.shape, fld.dtype)
              for fname, fld in spec.fields.items()}
    if not fields:  # marker events still need a capacity-carrying array
        fields["_"] = jnp.zeros(capacity, jnp.int32)
    world.state["obs"][spec.name] = {
        "f": fields,
        "count": jnp.asarray(0, jnp.int32),
    }
    world.structure_version += 1
    return spec


def clear_observer_buffers(state):
    """Frame-final clear (observers are same-frame only)."""
    if "obs" not in state:
        return state
    obs = {name: dict(store, count=jnp.zeros_like(store["count"]))
           for name, store in state["obs"].items()}
    return set_in(state, ("obs",), obs)
