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
    })
    from bevy_tpu.ecs.schedule import SystemEntry
    app.schedule(StateTransition).entries.append(
        SystemEntry(_TransitionSystem(app, state_name, values)))
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


def in_state(state_name: str, value: int) -> System:
    """Run condition (ref: in_state)."""

    @system(name=f"in_state_{state_name}_{value}")
    def cond(s=Res(f"state_{state_name}")):
        return s.current == value

    return cond
