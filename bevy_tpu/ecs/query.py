"""Queries & views (reference twin: bevy_ecs query/ — QueryState
`query/state.rs:79`, access analysis `query/access.rs`, filters
With/Without/Changed/Added).

A Query resolves to: a boolean row mask (alive ∧ membership ∧ filters) plus
direct views of whole component columns. System bodies read columns, compute
vectorized results, and assign back; merges apply `where(mask, new, old)` and
stamp change ticks — the TPU equivalent of `Mut` deref tick stamping
(`change_detection/params.rs:673`).
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp

from bevy_tpu.ecs._state import set_in
from bevy_tpu.ecs.component import get_spec


class Read:
    """Marks a query component as read-only (ref: `&T` vs `&mut T`)."""

    def __init__(self, comp):
        self.comp = comp


class QueryBuilder:
    """Runtime-composed query (ref: QueryBuilder,
    bevy_ecs/src/query/builder.rs): accumulate terms from data unknown at
    authoring time — component lists from config, plugins, or reflection —
    then `.build()` a Query usable as a system param.

        q = QueryBuilder().data(Pos).ref_(Vel).with_(Alive).build()
    """

    def __init__(self):
        self._comps = []
        self._kw = {"with_": [], "without": [], "changed": [],
                    "added": [], "removed": []}

    def data(self, comp):
        """Mutable access (ref: builder.data::<&mut T>())."""
        self._comps.append(comp)
        return self

    def ref_(self, comp):
        """Read-only access (ref: builder.data::<&T>())."""
        self._comps.append(Read(comp))
        return self

    def with_(self, comp):
        self._kw["with_"].append(comp)
        return self

    def without(self, comp):
        self._kw["without"].append(comp)
        return self

    def changed(self, comp):
        self._kw["changed"].append(comp)
        return self

    def added(self, comp):
        self._kw["added"].append(comp)
        return self

    def removed(self, comp):
        self._kw["removed"].append(comp)
        return self

    def build(self) -> "Query":
        return Query(*self._comps, **self._kw)


class Query:
    def __init__(self, *comps, with_=(), without=(), changed=(), added=(),
                 removed=()):
        self.comps = []
        self.read_only = set()
        self.with_ = [get_spec(c) for c in with_]
        self.without = [get_spec(c) for c in without]
        self.changed = [get_spec(c) for c in changed]
        self.added = [get_spec(c) for c in added]
        self.removed = [get_spec(c) for c in removed]
        for c in comps:
            # Accept bevy-style positional filters (With/Without/Changed/Added)
            tname = type(c).__name__
            if tname == "With":
                self.with_.append(get_spec(c.comp))
                continue
            if tname == "Without":
                self.without.append(get_spec(c.comp))
                continue
            if tname == "Changed":
                self.changed.append(get_spec(c.comp))
                continue
            if tname == "Added":
                self.added.append(get_spec(c.comp))
                continue
            if tname == "Removed":
                self.removed.append(get_spec(c.comp))
                continue
            if isinstance(c, Read):
                spec = get_spec(c.comp)
                self.read_only.add(spec.name)
            else:
                spec = get_spec(c)
            self.comps.append(spec)

    # -- access sets for ambiguity analysis (ref: FilteredAccessSet) -----
    def reads(self):
        out = {f"comp:{s.name}" for s in self.comps if s.name in self.read_only}
        out |= {f"comp:{s.name}" for s in self.with_ + self.without
                + self.changed + self.added + self.removed}
        return out

    def writes(self):
        return {f"comp:{s.name}" for s in self.comps if s.name not in self.read_only}

    def build(self, state, world, sysctx):
        for spec in (*self.comps, *self.with_, *self.without, *self.changed,
                     *self.added, *self.removed):
            if spec.name not in state["comp"]:
                # Component never stored: empty query (mask all-false) —
                # handled by registering storage host-side ahead of trace.
                raise KeyError(
                    f"component '{spec.name}' has no storage; register or spawn it "
                    f"before running schedules")
        mask = state["ent"]["alive"]
        # default query filter (ref: entity_disabling.rs
        # DefaultQueryFilters): rows carrying Disabled are skipped unless
        # the query mentions Disabled itself
        if "disabled" in state["comp"]:
            mentions = any(sp.name == "disabled" for sp in
                           (*self.comps, *self.with_, *self.without,
                            *self.changed, *self.added, *self.removed))
            if not mentions:
                mask = mask & ~state["comp"]["disabled"]["has"]
        for spec in self.comps + self.with_:
            mask = mask & state["comp"][spec.name]["has"]
        for spec in self.without:
            mask = mask & ~state["comp"][spec.name]["has"]
        last_run = state["sys"][sysctx["id"]]["last_run"]
        for spec in self.changed:
            c = state["comp"][spec.name]
            mask = mask & c["has"] & (c["changed"] > last_run)
        for spec in self.added:
            c = state["comp"][spec.name]
            mask = mask & c["has"] & (c["added"] > last_run)
        for spec in self.removed:
            # removal detection (ref: RemovedComponents): rows whose
            # component vanished since this system last ran. Note: the
            # entity itself may be despawned; `mask` intentionally does not
            # AND alive for pure-Removed queries to keep despawn visible.
            c = state["comp"][spec.name]
            rm = ~c["has"] & (c["removed"] > last_run)
            if not self.comps and not self.with_:
                mask = rm
            else:
                mask = mask & rm
        return QueryView(self, state, mask)


class ComponentView:
    """Attribute access to one component's field columns with staged writes."""

    def __init__(self, name, store, writable):
        object.__setattr__(self, "_name", name)
        object.__setattr__(self, "_store", store)
        object.__setattr__(self, "_writable", writable)
        object.__setattr__(self, "_staged", {})

    def __getattr__(self, fname):
        staged = object.__getattribute__(self, "_staged")
        if fname in staged:
            return staged[fname]
        store = object.__getattribute__(self, "_store")
        try:
            return store["f"][fname]
        except KeyError:
            raise AttributeError(
                f"component '{object.__getattribute__(self, '_name')}' has no field '{fname}'")

    def __setattr__(self, fname, value):
        if not object.__getattribute__(self, "_writable"):
            raise AttributeError(
                f"component '{object.__getattribute__(self, '_name')}' is Read-only in this query")
        store = object.__getattribute__(self, "_store")
        if fname not in store["f"]:
            raise AttributeError(
                f"component '{object.__getattribute__(self, '_name')}' has no field '{fname}'")
        object.__getattribute__(self, "_staged")[fname] = value

    @property
    def has_mask(self):
        return object.__getattribute__(self, "_store")["has"]


class QueryView:
    """What a system receives for a Query param.

    Attributes: `.mask` (bool rows), `.entities` (row indices), and one
    `ComponentView` per queried component under its snake_case name.
    """

    def __init__(self, query: Query, state, mask):
        self.query = query
        self.mask = mask
        self._state = state  # whole-state view (alive masks, generations)
        self.entities = jnp.arange(mask.shape[0], dtype=jnp.int32)
        self._views: Dict[str, ComponentView] = {}
        for spec in query.comps:
            view = ComponentView(
                spec.name, state["comp"][spec.name],
                writable=spec.name not in query.read_only)
            self._views[spec.name] = view
            setattr(self, spec.name, view)
            # short alias (q.paddle) when the storage name was
            # module-qualified by a cross-module class-name collision;
            # first query component wins on an in-query alias clash
            if spec.attr != spec.name and not hasattr(self, spec.attr):
                setattr(self, spec.attr, view)

    def count(self):
        return jnp.sum(self.mask.astype(jnp.int32))

    def merge(self, state, tick):
        for name, view in self._views.items():
            staged = object.__getattribute__(view, "_staged")
            if not staged:
                continue
            store = state["comp"][name]
            new_fields = dict(store["f"])
            for fname, val in staged.items():
                old = store["f"][fname]
                bmask = self.mask.reshape(self.mask.shape + (1,) * (old.ndim - 1))
                val = jnp.broadcast_to(jnp.asarray(val, old.dtype), old.shape)
                new_fields[fname] = jnp.where(bmask, val, old)
            new_store = dict(store)
            new_store["f"] = new_fields
            new_store["changed"] = jnp.where(self.mask, tick, store["changed"])
            state = set_in(state, ("comp", name), new_store)
        return state


class Res:
    """Read-only resource access (ref: Res<T>)."""

    def __init__(self, res):
        self.name = res if isinstance(res, str) else get_spec(res).name

    def reads(self):
        return {f"res:{self.name}"}

    def writes(self):
        return set()

    def build(self, state, world, sysctx):
        store = state["res"][self.name]
        if isinstance(store, dict):
            return ResView(self.name, store, writable=False)
        return store


class ResMut(Res):
    """Mutable resource access (ref: ResMut<T>)."""

    def reads(self):
        return set()

    def writes(self):
        return {f"res:{self.name}"}

    def build(self, state, world, sysctx):
        store = state["res"][self.name]
        return ResView(self.name, store, writable=True)


class ResView:
    def __init__(self, name, store, writable):
        object.__setattr__(self, "_name", name)
        object.__setattr__(self, "_store", store)
        object.__setattr__(self, "_writable", writable)
        object.__setattr__(self, "_staged", {})

    def __getattr__(self, fname):
        staged = object.__getattribute__(self, "_staged")
        if fname in staged:
            return staged[fname]
        store = object.__getattribute__(self, "_store")
        if isinstance(store, dict) and fname in store:
            return store[fname]
        raise AttributeError(
            f"resource '{object.__getattribute__(self, '_name')}' has no field '{fname}'")

    def __setattr__(self, fname, value):
        if not object.__getattribute__(self, "_writable"):
            raise AttributeError(
                f"resource '{object.__getattribute__(self, '_name')}' is read-only (use ResMut)")
        object.__getattribute__(self, "_staged")[fname] = value

    def merge(self, state, tick):
        staged = object.__getattribute__(self, "_staged")
        if not staged:
            return state
        name = object.__getattribute__(self, "_name")
        store = dict(state["res"][name])
        for fname, val in staged.items():
            old = store.get(fname)
            if old is not None and hasattr(old, "dtype"):
                val = jnp.asarray(val, old.dtype)
                if hasattr(old, "shape"):
                    val = jnp.broadcast_to(val, old.shape)
            store[fname] = val
        return set_in(state, ("res", name), store)


class Local:
    """Per-system persistent state (ref: Local<T>). Stored in
    state['sys'][id]['local'][param_name]; must be a pytree of arrays."""

    def __init__(self, default):
        self.default = default
        self.param_name = None  # filled by @system

    def reads(self):
        return set()

    def writes(self):
        return set()

    def build(self, state, world, sysctx):
        return LocalView(sysctx["id"], self.param_name,
                         state["sys"][sysctx["id"]]["local"][self.param_name])


class LocalView:
    def __init__(self, sys_id, name, value):
        self._sys_id = sys_id
        self._name = name
        self._value = value
        self._dirty = False

    @property
    def value(self):
        return self._value

    @value.setter
    def value(self, v):
        self._value = v
        self._dirty = True

    def merge(self, state, tick):
        if not self._dirty:
            return state
        return set_in(state, ("sys", self._sys_id, "local", self._name), self._value)


def pair_combinations(mask):
    """All unordered entity pairs of a query (ref:
    Query::iter_combinations — examples/ecs/iter_combinations.rs).

    TPU form: the pair set is the static upper triangle of the
    capacity x capacity grid — returns (idx_i, idx_j, valid) flat arrays
    of length C*(C-1)/2 where valid = both rows matched. O(C^2) memory:
    meant for small pools (orbital bodies, constraint pairs), like the
    reference's O(N^2) iterator."""
    import numpy as _np

    c = mask.shape[0]
    iu = _np.triu_indices(c, k=1)
    idx_i = jnp.asarray(iu[0].astype(_np.int32))
    idx_j = jnp.asarray(iu[1].astype(_np.int32))
    return idx_i, idx_j, mask[idx_i] & mask[idx_j]


class Single(Query):
    """Query expecting (at most) one match (ref: bevy's Single<T> system
    param). Field reads give the matched row's scalars; field writes
    scatter back to that row only. `.exists` is a traced bool; when no
    row matches, reads return row 0's values gated by nothing — guard
    with `.exists` (the reference skips the system instead)."""

    def build(self, state, world, sysctx):
        view = super().build(state, world, sysctx)
        return SingleView(view)


class SingleView:
    def __init__(self, qview):
        object.__setattr__(self, "_q", qview)
        idx = jnp.argmax(qview.mask)
        object.__setattr__(self, "row", idx)
        object.__setattr__(self, "exists", jnp.any(qview.mask))
        for name, cview in qview._views.items():
            object.__setattr__(self, name, _SingleComponentView(
                cview, idx, self.exists))

    def merge(self, state, tick):
        return object.__getattribute__(self, "_q").merge(state, tick)


class _SingleComponentView:
    def __init__(self, cview, row, exists):
        object.__setattr__(self, "_c", cview)
        object.__setattr__(self, "_row", row)
        object.__setattr__(self, "_exists", exists)

    def __getattr__(self, fname):
        col = getattr(object.__getattribute__(self, "_c"), fname)
        return col[object.__getattribute__(self, "_row")]

    def __setattr__(self, fname, value):
        c = object.__getattribute__(self, "_c")
        row = object.__getattribute__(self, "_row")
        ok = object.__getattribute__(self, "_exists")
        col = getattr(c, fname)
        new = col.at[row].set(jnp.where(ok, value, col[row]))
        setattr(c, fname, new)
