"""Schedules (reference twin: bevy_ecs schedule/ — Schedule
`schedule/schedule.rs:391`, build_schedule topsort + ambiguity detection
`schedule.rs:1222,1357`, executors).

The reference's MultiThreadedExecutor extracts parallelism at runtime from
access-set conflicts. Here the whole ordered system list is traced into one
XLA program — XLA's scheduler overlaps independent ops, so the access
analysis is kept only for what it is in spirit: a determinism lint
(ambiguity detection) and a documentation of intent. Order is: explicit
`before`/`after` edges + chained tuples, topologically sorted with stable
insertion order (Kahn), cycle check included (ref: tarjan_scc).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

from bevy_tpu.ecs.system import System


@dataclass
class SystemEntry:
    system: System
    after: Tuple = ()
    before: Tuple = ()
    run_if: Optional[System] = None
    sets: Tuple[str, ...] = ()


@dataclass
class SetEntry:
    name: str
    after: Tuple = ()
    before: Tuple = ()


class ScheduleAmbiguity(Warning):
    pass


class Schedule:
    def __init__(self, label: str):
        self.label = label
        self.entries: List[SystemEntry] = []
        self.set_entries: Dict[str, SetEntry] = {}
        self._order: Optional[List[SystemEntry]] = None
        self.ambiguities: List[Tuple[str, str, set]] = []

    # ------------------------------------------------------------------

    def configure_set(self, name: str, after=(), before=()):
        self.set_entries[name] = SetEntry(name, _tup(after), _tup(before))
        self._order = None

    def add_systems(self, systems, after=(), before=(), chain=False,
                    run_if=None, in_set=None):
        sys_list = list(systems) if isinstance(systems, (list, tuple)) else [systems]
        for s in sys_list:
            if not isinstance(s, System):
                raise TypeError(f"{s!r} is not a System (forgot @system?)")
        sets = (in_set,) if in_set else ()
        # chained conditions AND together (ref: .run_if(a).run_if(b))
        if isinstance(run_if, (list, tuple)):
            run_if = tuple(run_if) or None
        prev = None
        for s in sys_list:
            entry_after = _tup(after)
            if chain and prev is not None:
                entry_after = entry_after + (prev,)
            self.entries.append(SystemEntry(s, entry_after, _tup(before), run_if, sets))
            prev = s
        self._order = None
        return self

    # ------------------------------------------------------------------

    def _resolve(self, target) -> List[int]:
        """Resolve a before/after target (System, name, or set name) to
        entry indices."""
        out = []
        for i, e in enumerate(self.entries):
            if target is e.system or target == e.system.name or target in e.sets:
                out.append(i)
        return out

    def build_order(self) -> List[SystemEntry]:
        if self._order is not None:
            return self._order
        n = len(self.entries)
        edges = [set() for _ in range(n)]  # edges[i] = js that must run after i
        indeg = [0] * n

        def add_edge(a, b):
            if b not in edges[a]:
                edges[a].add(b)
                indeg[b] += 1

        # set-level ordering: expand set before/after onto members
        set_after: Dict[str, Tuple] = {}
        set_before: Dict[str, Tuple] = {}
        for name, se in self.set_entries.items():
            set_after[name] = se.after
            set_before[name] = se.before

        for i, e in enumerate(self.entries):
            targets_after = list(e.after)
            targets_before = list(e.before)
            for sname in e.sets:
                targets_after += list(set_after.get(sname, ()))
                targets_before += list(set_before.get(sname, ()))
            for t in targets_after:
                for j in self._resolve(t):
                    if j != i:
                        add_edge(j, i)
            for t in targets_before:
                for j in self._resolve(t):
                    if j != i:
                        add_edge(i, j)

        # Kahn topsort, stable by insertion index
        ready = [i for i in range(n) if indeg[i] == 0]
        order = []
        while ready:
            i = min(ready)
            ready.remove(i)
            order.append(i)
            for j in edges[i]:
                indeg[j] -= 1
                if indeg[j] == 0:
                    ready.append(j)
        if len(order) != n:
            cyc = [self.entries[i].system.name for i in range(n) if i not in order]
            raise RuntimeError(
                f"schedule '{self.label}': dependency cycle among {cyc} "
                f"(ref: build_schedule cycle check)")

        self._order = [self.entries[i] for i in order]
        self._detect_ambiguities(edges, order)
        return self._order

    def _detect_ambiguities(self, edges, order):
        """Report unordered conflicting pairs (ref: schedule.rs:1357-1390)."""
        n = len(self.entries)
        # reachability closure over the DAG
        reach = [set() for _ in range(n)]
        for i in reversed(order):
            for j in edges[i]:
                reach[i].add(j)
                reach[i] |= reach[j]
        self.ambiguities = []
        for a in range(n):
            for b in range(a + 1, n):
                if b in reach[a] or a in reach[b]:
                    continue
                conflict = self.entries[a].system.conflicts_with(self.entries[b].system)
                if conflict:
                    self.ambiguities.append(
                        (self.entries[a].system.name, self.entries[b].system.name, conflict))

    # ------------------------------------------------------------------
    # execution

    def init_systems(self, world):
        for e in self.entries:
            e.system.init_state(world)
            for c in _conds(e.run_if):
                c.init_state(world)

    def has_host_systems(self) -> bool:
        return any(e.system.host for e in self.entries)

    def items(self):
        """Ordered (entry,) list for the App's segment builder."""
        return self.build_order()

    def run_traced(self, state, world):
        """Trace every device system in order into the caller's jit."""
        import jax

        for e in self.build_order():
            if e.system.host:
                raise RuntimeError(
                    f"host system '{e.system.name}' cannot run inside a jit "
                    f"segment — App segmentation should have split it out")
            state = _run_entry(e, state, world)
        return state

    def run_host_entry(self, entry: SystemEntry, world):
        run_host_entry(entry, world)


def run_host_entry(entry: SystemEntry, world):
    """Run one host system eagerly against world.state (ref: exclusive
    systems pinned to the main thread, multi_threaded.rs:701)."""
    import jax

    for cond in _conds(entry.run_if):
        if not bool(jax.device_get(_eval_condition(cond, world.state, world))):
            return
    sysctx = {"id": entry.system.id}
    views = {}
    for pname, p in entry.system.params.items():
        views[pname] = p.build(world.state, world, sysctx)
    try:
        result = entry.system.fn(world, **views) if entry.system.wants_world \
            else entry.system.fn(**views)
    except Exception as e:  # noqa: BLE001 — see System._run_inner
        if getattr(world, "error_handler", None) is None:
            raise
        world.error_handler(e, entry.system)
        return
    if isinstance(result, Exception):
        if getattr(world, "error_handler", None) is None:
            raise result
        world.error_handler(result, entry.system)
        return
    # Pick up structural edits the body may have made, then merge staged
    # writes (staged writes + capacity growth in one system unsupported).
    state = world.state
    tick = state["tick"]
    for view in views.values():
        if hasattr(view, "merge"):
            state = view.merge(state, tick)
    from bevy_tpu.ecs._state import set_in
    state = set_in(state, ("sys", entry.system.id, "last_run"), tick)
    state = set_in(state, ("tick",), tick + 1)
    world.state = state


def _conds(run_if):
    """Normalize a run_if spec (None | System | tuple) to a tuple."""
    if run_if is None:
        return ()
    return run_if if isinstance(run_if, tuple) else (run_if,)


def _eval_condition(cond: System, state, world):
    sysctx = {"id": cond.id}
    views = {pname: p.build(state, world, sysctx)
             for pname, p in cond.params.items()}
    return cond.fn(**views)


def _run_entry(entry: SystemEntry, state, world):
    import jax

    conds = _conds(entry.run_if)
    if not conds:
        return entry.system.run(state, world)
    pred = _eval_condition(conds[0], state, world)
    for c in conds[1:]:
        pred = pred & _eval_condition(c, state, world)
    return jax.lax.cond(
        pred,
        lambda s: entry.system.run(s, world),
        lambda s: s,
        state,
    )


def _tup(x):
    if isinstance(x, (list, tuple)):
        return tuple(x)
    return (x,)if x else ()
