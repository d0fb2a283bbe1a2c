"""Systems (reference twin: bevy_ecs system/ — function systems over
SystemParams, `system/function_system.rs`; access sets for conflict
analysis, `query/access.rs`).

A system is a plain function whose *default argument values* declare its
params (Query/Res/ResMut/Commands/Local/Message*), e.g.::

    @system
    def apply_velocity(q=Query(Transform, Read(Velocity)), time=Res(Time)):
        q.transform.translation += q.velocity.value * time.delta

Bodies run under trace; staged writes are merged functionally afterwards and
the system's tick advances (ref: system ticks driving Changed/Added).
`host=True` marks systems that must run eagerly on the host (asset IO,
Python-side structural edits) — they split the jit into segments.
"""

from __future__ import annotations

import inspect
from typing import Callable, Dict, Optional

import jax.numpy as jnp

from bevy_tpu.ecs._state import set_in
from bevy_tpu.ecs.commands import Commands
from bevy_tpu.ecs.query import Local, Query, Res, ResMut
from bevy_tpu.ecs.message import MessageReader, MessageWriter
from bevy_tpu.ecs.observer import LifecycleMask, On, Trigger

PARAM_TYPES = (Query, Res, ResMut, Commands, Local, MessageReader,
               MessageWriter, Trigger, On, LifecycleMask)


def register_param_type(cls):
    """Extend the accepted system-param set (used by e.g. render Gizmos)."""
    global PARAM_TYPES
    PARAM_TYPES = PARAM_TYPES + (cls,)


class System:
    _counter = 0

    def __init__(self, fn: Callable, host: bool = False, name: Optional[str] = None):
        self.fn = fn
        self.host = host
        self.name = name or fn.__name__
        System._counter += 1
        self.id = f"{self.name}#{System._counter}"
        self.params: Dict[str, object] = {}
        sig = inspect.signature(fn)
        self.wants_world = False
        for pname, p in sig.parameters.items():
            if pname == "world" and p.default is inspect.Parameter.empty:
                # Host systems may take the World itself (ref: exclusive
                # systems with &mut World, pinned to the main thread).
                if not host:
                    raise TypeError(
                        f"system {self.name}: 'world' param requires host=True")
                self.wants_world = True
            elif isinstance(p.default, PARAM_TYPES):
                self.params[pname] = p.default
                if isinstance(p.default, Local):
                    p.default.param_name = pname
            elif p.default is inspect.Parameter.empty:
                raise TypeError(
                    f"system {self.name}: parameter '{pname}' has no param "
                    f"declaration (use e.g. {pname}=Query(...))")
        self.reads = set()
        self.writes = set()
        for p in self.params.values():
            self.reads |= p.reads()
            self.writes |= p.writes()
        # structural mutation happens on every EXECUTION of the compiled
        # segment, not just at trace time — the App uses this to invalidate
        # the world's host liveness mirror after each run (CommandsView.merge
        # only runs while tracing)
        self.has_commands = any(isinstance(p, Commands)
                                for p in self.params.values())

    def conflicts_with(self, other: "System") -> set:
        """Access conflicts (ref: FilteredAccessSet::get_conflicts)."""
        return (self.writes & (other.reads | other.writes)) | (self.reads & other.writes)

    def init_state(self, world):
        """Ensure per-system state + queried storage exist before trace."""
        for p in self.params.values():
            if isinstance(p, Query):
                for spec in (*p.comps, *p.with_, *p.without, *p.changed, *p.added):
                    world.register_component(spec)
            elif isinstance(p, Commands):
                for spec in p.spawn_comps:
                    world.register_component(spec)
            elif isinstance(p, LifecycleMask):
                world.register_component(p.trigger.spec)
        if self.id not in world.state["sys"]:
            local = {
                pname: jnp.asarray(p.default) if not isinstance(p.default, dict)
                else {k: jnp.asarray(v) for k, v in p.default.items()}
                for pname, p in self.params.items() if isinstance(p, Local)
            }
            world.state["sys"][self.id] = {
                "last_run": jnp.asarray(0, jnp.int32),
                "local": local,
            }
            world.structure_version += 1

    def run(self, state, world):
        """Run the system against a state pytree (traced or concrete),
        returning the new state. Wrapped in a jax named scope so per-system
        cost shows up in profiler traces (ref: the per-system tracing spans,
        multi_threaded.rs:15)."""
        import jax

        with jax.named_scope(f"system:{self.name}"):
            return self._run_inner(state, world)

    def _run_inner(self, state, world):
        sysctx = {"id": self.id}
        views = {}
        for pname, p in self.params.items():
            views[pname] = p.build(state, world, sysctx)
        # fallible systems (ref: Result-returning systems routed to the
        # error handler, bevy_ecs/src/error/handler.rs): exceptions — and
        # returned Exception values — go to world.error_handler. The
        # default (None) re-raises (the reference's panic policy); a
        # handler skips this system's staged writes, leaving state intact.
        try:
            result = self.fn(world, **views) if self.wants_world \
                else self.fn(**views)
        except Exception as e:  # noqa: BLE001 — routed, not swallowed
            if getattr(world, "error_handler", None) is None:
                raise
            world.error_handler(e, self)
            return state
        if isinstance(result, Exception):
            if getattr(world, "error_handler", None) is None:
                raise result
            world.error_handler(result, self)
            return state
        tick = state["tick"]
        for view in views.values():
            if hasattr(view, "merge"):
                state = view.merge(state, tick)
        state = set_in(state, ("sys", self.id, "last_run"), tick)
        state = set_in(state, ("tick",), tick + 1)
        return state

    def __repr__(self):
        return f"System({self.name})"


def system(fn=None, *, host=False, name=None):
    """Decorator turning a function into a System."""

    def wrap(f):
        return System(f, host=host, name=name)

    if fn is not None:
        return wrap(fn)
    return wrap


def host_system(fn=None, **kw):
    return system(fn, host=True, **kw)
