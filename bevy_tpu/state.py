"""States (reference twin: bevy_state — States resources, the
StateTransition schedule running OnExit/OnEnter schedules
`src/state/freely_mutable_state.rs:29-62`, `StateScoped` cleanup,
`in_state` run conditions `src/condition.rs`).

TPU design: a state is an int32 resource {current, next}; the transition
system traces EVERY OnExit/OnEnter schedule under `lax.cond(changed &
(value == v))` — all branches compile once, the device picks at runtime
(the reference's dynamic schedule dispatch becomes predicated execution).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from bevy_tpu.app.main_schedule import ScheduleLabel, StateTransition
from bevy_tpu.ecs._state import set_in
from bevy_tpu.ecs.query import Res, ResMut
from bevy_tpu.ecs.system import System, system


from bevy_tpu.ecs.component import component, field

_STATE_IDS: dict = {}


@component
class StateScoped:
    """Entities despawned when their state value is exited (ref:
    StateScoped, bevy_state/src/state_scoped.rs). Use
    `state_scoped(name, value)` to construct."""
    state_id = field((), jnp.int32)
    value = field((), jnp.int32)


def state_scoped(state_name: str, value: int) -> StateScoped:
    return StateScoped(state_id=_STATE_IDS[state_name], value=int(value))


def OnEnter(state_name: str, value: int) -> ScheduleLabel:
    """Schedule label run when `state_name` enters `value` (ref: OnEnter)."""
    return ScheduleLabel(f"OnEnter({state_name},{int(value)})")


def OnExit(state_name: str, value: int) -> ScheduleLabel:
    return ScheduleLabel(f"OnExit({state_name},{int(value)})")


class _TransitionSystem(System):
    """Traces OnExit(current) then OnEnter(next) under lax.cond (ref:
    apply_state_transition)."""

    def __init__(self, app, state_name: str, values):
        super().__init__(lambda: None, name=f"apply_state_transition_{state_name}")
        self.app = app
        self.state_name = state_name
        self.values = list(values)
        # StateScoped cleanup despawns on every execution — the App must
        # invalidate the host liveness mirror after running us (the same
        # contract as Commands systems)
        self.has_commands = True

    def init_state(self, world):
        super().init_state(world)
        for v in self.values:
            for label in (OnEnter(self.state_name, v),
                          OnExit(self.state_name, v)):
                if label in self.app.schedules:
                    self.app.schedules[label].init_systems(world)

    def run(self, state, world):
        rname = f"state_{self.state_name}"
        cur = state["res"][rname]["current"]
        nxt = state["res"][rname]["next"]
        changed = (nxt >= 0) & (nxt != cur)
        # record the pre-transition value for sub-states (ref: the
        # transition event's `exited` field)
        state = set_in(state, ("res", rname, "prev"), cur)

        # StateScoped cleanup on exit (ref: clear_state_scoped_entities)
        if "state_scoped" in state["comp"]:
            from bevy_tpu.ecs.commands import _apply_despawn
            ss = state["comp"]["state_scoped"]
            sid = _STATE_IDS[self.state_name]
            doomed = changed & ss["has"] & (ss["f"]["state_id"] == sid) & \
                (ss["f"]["value"] == cur)
            state = _apply_despawn(state, doomed)
            world.mark_device_dirty()

        def run_label(label, state):
            sched = self.app.schedules.get(label)
            if sched is None or not sched.entries:
                return state
            return sched.run_traced(state, world)

        for v in self.values:
            exit_label = OnExit(self.state_name, v)
            if exit_label in self.app.schedules and \
                    self.app.schedules[exit_label].entries:
                state = jax.lax.cond(
                    changed & (cur == v),
                    lambda s, lbl=exit_label: run_label(lbl, s),
                    lambda s: s, state)
        for v in self.values:
            enter_label = OnEnter(self.state_name, v)
            if enter_label in self.app.schedules and \
                    self.app.schedules[enter_label].entries:
                state = jax.lax.cond(
                    changed & (nxt == v),
                    lambda s, lbl=enter_label: run_label(lbl, s),
                    lambda s: s, state)
        state = set_in(state, ("res", rname, "current"),
                       jnp.where(changed, nxt, cur))
        state = set_in(state, ("res", rname, "next"),
                       jnp.full_like(nxt, -1))
        return state


def add_state(app, state_name: str, initial: int, values):
    """Register a state machine (ref: App::init_state)."""
    if state_name not in _STATE_IDS:
        _STATE_IDS[state_name] = len(_STATE_IDS)
    app.world.register_component(StateScoped)
    app.insert_resource(f"state_{state_name}", {
        "current": jnp.asarray(int(initial), jnp.int32),
        "next": jnp.asarray(-1, jnp.int32),
        "prev": jnp.asarray(int(initial), jnp.int32),
        "exists": jnp.asarray(True),
    })
    from bevy_tpu.ecs.schedule import SystemEntry
    app.schedule(StateTransition).entries.append(
        SystemEntry(_TransitionSystem(app, state_name, values)))
    app._plan_cache.clear()
    return app


class _SubStateSystem(_TransitionSystem):
    """Child machine alive only while parent == parent_value (ref:
    SubStates, bevy_state/src/state/sub_states.rs): (re)initializes on
    parent entry (running OnEnter(initial)), tears down on parent exit
    (running OnExit(current)), and applies its own transitions while
    active."""

    def __init__(self, app, state_name, values, initial, parent, parent_value):
        super().__init__(app, state_name, values)
        self.initial = int(initial)
        self.parent = parent
        self.parent_value = int(parent_value)

    def run(self, state, world):
        rname = f"state_{self.state_name}"
        pname = f"state_{self.parent}"
        p_cur = state["res"][pname]["current"]
        p_prev = state["res"][pname]["prev"]
        active = p_cur == self.parent_value
        was = p_prev == self.parent_value
        entered = active & ~was
        exited = ~active & was

        cur = state["res"][rname]["current"]
        nxt = state["res"][rname]["next"]
        own = active & (nxt >= 0) & (nxt != cur)

        def run_label(label, state):
            sched = self.app.schedules.get(label)
            if sched is None or not sched.entries:
                return state
            return sched.run_traced(state, world)

        # parent exit: OnExit(current) + StateScoped cleanup
        if "state_scoped" in state["comp"]:
            from bevy_tpu.ecs.commands import _apply_despawn
            ss = state["comp"]["state_scoped"]
            sid = _STATE_IDS[self.state_name]
            doomed = (exited | own) & ss["has"] & \
                (ss["f"]["state_id"] == sid) & (ss["f"]["value"] == cur)
            state = _apply_despawn(state, doomed)
        for v in self.values:
            lbl = OnExit(self.state_name, v)
            if lbl in self.app.schedules and self.app.schedules[lbl].entries:
                state = jax.lax.cond(
                    (exited | own) & (cur == v),
                    lambda s, l=lbl: run_label(l, s), lambda s: s, state)
        # parent entry re-initializes; own transitions pick `next`
        target = jnp.where(entered, self.initial, nxt)
        fire_enter = entered | own
        for v in self.values:
            lbl = OnEnter(self.state_name, v)
            if lbl in self.app.schedules and self.app.schedules[lbl].entries:
                state = jax.lax.cond(
                    fire_enter & (target == v),
                    lambda s, l=lbl: run_label(l, s), lambda s: s, state)
        state = set_in(state, ("res", rname, "prev"), cur)
        state = set_in(state, ("res", rname, "current"),
                       jnp.where(fire_enter, target, cur))
        state = set_in(state, ("res", rname, "next"), jnp.full_like(nxt, -1))
        state = set_in(state, ("res", rname, "exists"), active)
        return state


def add_sub_state(app, state_name: str, initial: int, values,
                  parent: str, parent_value: int):
    """Register a sub-state machine (ref: App::add_sub_state). Must be
    called AFTER add_state(parent) so the parent's transition applies
    first each frame."""
    if state_name not in _STATE_IDS:
        _STATE_IDS[state_name] = len(_STATE_IDS)
    app.insert_resource(f"state_{state_name}", {
        "current": jnp.asarray(int(initial), jnp.int32),
        "next": jnp.asarray(-1, jnp.int32),
        "prev": jnp.asarray(int(initial), jnp.int32),
        "exists": jnp.asarray(False),
    })
    from bevy_tpu.ecs.schedule import SystemEntry
    app.schedule(StateTransition).entries.append(
        SystemEntry(_SubStateSystem(app, state_name, values, initial,
                                    parent, parent_value)))
    app._plan_cache.clear()
    return app


class NextState(ResMut):
    """ResMut param for requesting a transition (ref: NextState<S>):
        ns = NextState('app_state'); ns.set(GameState.PLAYING)"""

    def __init__(self, state_name: str):
        super().__init__(f"state_{state_name}")

    def build(self, state, world, sysctx):
        view = super().build(state, world, sysctx)

        def set_value(v):
            view.next = jnp.asarray(v, jnp.int32)
        object.__setattr__(view, "set", set_value)
        return view


class CurrentState(Res):
    """Read-only current state value (ref: State<S>)."""

    def __init__(self, state_name: str):
        super().__init__(f"state_{state_name}")


class _ComputedStateSystem(_TransitionSystem):
    """State derived from other states each frame (ref: ComputedStates,
    bevy_state/src/state/computed_states.rs): `compute(sources) -> value`
    re-evaluates after source transitions; OnEnter/OnExit fire on change.
    compute receives {name: current} traced values and must return a traced
    int32 (use jnp.where, not python if)."""

    def __init__(self, app, state_name, values, sources, compute):
        super().__init__(app, state_name, values)
        self.sources = list(sources)
        self.compute = compute

    def run(self, state, world):
        rname = f"state_{self.state_name}"
        cur = state["res"][rname]["current"]
        srcs = {s: state["res"][f"state_{s}"]["current"]
                for s in self.sources}
        new = jnp.asarray(self.compute(srcs), jnp.int32)
        changed = new != cur

        def run_label(label, state):
            sched = self.app.schedules.get(label)
            if sched is None or not sched.entries:
                return state
            return sched.run_traced(state, world)

        if "state_scoped" in state["comp"]:
            from bevy_tpu.ecs.commands import _apply_despawn
            ss = state["comp"]["state_scoped"]
            sid = _STATE_IDS[self.state_name]
            doomed = changed & ss["has"] & \
                (ss["f"]["state_id"] == sid) & (ss["f"]["value"] == cur)
            state = _apply_despawn(state, doomed)
        for v in self.values:
            lbl = OnExit(self.state_name, v)
            if lbl in self.app.schedules and self.app.schedules[lbl].entries:
                state = jax.lax.cond(changed & (cur == v),
                                     lambda s, l=lbl: run_label(l, s),
                                     lambda s: s, state)
        for v in self.values:
            lbl = OnEnter(self.state_name, v)
            if lbl in self.app.schedules and self.app.schedules[lbl].entries:
                state = jax.lax.cond(changed & (new == v),
                                     lambda s, l=lbl: run_label(l, s),
                                     lambda s: s, state)
        state = set_in(state, ("res", rname, "prev"), cur)
        state = set_in(state, ("res", rname, "current"), new)
        return state


def add_computed_state(app, state_name: str, values, sources, compute,
                       initial: int = 0):
    """Register a derived state (ref: App::add_computed_state). `sources`
    are existing state names whose transition systems run first (add order
    matters)."""
    if state_name not in _STATE_IDS:
        _STATE_IDS[state_name] = len(_STATE_IDS)
    app.insert_resource(f"state_{state_name}", {
        "current": jnp.asarray(int(initial), jnp.int32),
        "next": jnp.asarray(-1, jnp.int32),
        "prev": jnp.asarray(int(initial), jnp.int32),
        "exists": jnp.asarray(True),
    })
    from bevy_tpu.ecs.schedule import SystemEntry
    app.schedule(StateTransition).entries.append(
        SystemEntry(_ComputedStateSystem(app, state_name, values, sources,
                                         compute)))
    app._plan_cache.clear()
    return app


def in_state(state_name: str, value: int) -> System:
    """Run condition (ref: in_state) — false while a sub-state's parent
    value is inactive (`exists`)."""

    @system(name=f"in_state_{state_name}_{value}")
    def cond(s=Res(f"state_{state_name}")):
        return s.exists & (s.current == value)

    return cond
