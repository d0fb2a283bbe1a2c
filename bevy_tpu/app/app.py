"""App (reference twin: bevy_app app.rs:85 — App = SubApps + runner;
Main schedule order main_schedule.rs:57-200; headless ScheduleRunnerPlugin
loop schedule_runner.rs:50).

Execution model: the ordered system list of every schedule in Main order is
flattened into *run items*; maximal runs of device systems compile into one
jitted segment (state-donating). Host systems (asset IO, Python structural
edits) split segments, exactly where the reference pins exclusive systems to
the main thread. In the common case (no host systems after startup) the
whole frame — sim, fixed loop, extract, render — is ONE XLA program.
"""

from __future__ import annotations

import time as _pytime
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp

from bevy_tpu.app.main_schedule import (
    FIXED_MAIN_ORDER, MAIN_ORDER, STARTUP_ORDER, RunFixedMainLoop,
    ExtractSchedule, Render,
)
from bevy_tpu.app.plugin import Plugin, PluginGroup
from bevy_tpu.ecs._state import set_in
from bevy_tpu.ecs.component import ComponentInstance, get_spec
from bevy_tpu.ecs.message import message, swap_message_buffers
from bevy_tpu.ecs.component import field
from bevy_tpu.ecs.schedule import Schedule, _run_entry, run_host_entry
from bevy_tpu.ecs.world import World


@message
class AppExit:
    """Exit request (ref: AppExit message, bevy_app/src/app.rs)."""
    code = field((), jnp.int32)


class App:
    def __init__(self, capacity: int = World.DEFAULT_CAPACITY):
        self.world = World(capacity)
        self.world._app = self   # back-ref (asset resolution in templates)
        self.schedules: Dict[str, Schedule] = {}
        self.main_order = list(MAIN_ORDER)
        self.startup_order = list(STARTUP_ORDER)
        self.fixed_order = list(FIXED_MAIN_ORDER)
        self._plugins: List[Plugin] = []
        self._plugin_names = set()
        self._started = False
        self._plan_cache: Dict[int, list] = {}
        self._prepare_hooks: List = []   # (fn, last_version) host rebuilds
        self._prepare_versions: List[int] = []
        # host→device per-frame input channels: name -> fn() returning a
        # fixed-shape numpy array, passed as jit args (NEVER eager writes —
        # see _thunk) and written into the 'frame_input' resource in-jit
        self._input_channels: Dict[str, object] = {}
        self._observers: Dict[str, List] = {}
        self._lifecycle_observers: List = []  # spliced after Commands items
        self._frame_hooks: List = []    # host callbacks after each update
        self.max_fixed_steps_per_frame = 8  # safety clamp alongside max_delta
        self.time_strategy: Optional[float] = None  # None=wall clock, float=manual dt
        self._last_wall: Optional[float] = None
        self.world.add_message(AppExit, capacity=4)

    # ------------------------------------------------------------------
    # building

    def schedule(self, label) -> Schedule:
        if label not in self.schedules:
            self.schedules[label] = Schedule(label)
        return self.schedules[label]

    def add_systems(self, label, systems, *more, **cfg):
        """ref: App::add_systems — accepts one system, a list/tuple, or
        bevy-style varargs: add_systems(Update, a, b, c)."""
        if more:
            systems = [systems, *more]
        self.schedule(label).add_systems(systems, **cfg)
        self._plan_cache.clear()
        return self

    def configure_set(self, label, name, **cfg):
        self.schedule(label).configure_set(name, **cfg)
        return self

    def add_plugins(self, *plugins):
        for p in plugins:
            if isinstance(p, (list, tuple)):
                self.add_plugins(*p)
                continue
            if isinstance(p, type):
                p = p()
            if isinstance(p, PluginGroup):
                p.build(self)
                continue
            if isinstance(p, Plugin):
                if p.name in self._plugin_names:
                    continue
                self._plugin_names.add(p.name)
                self._plugins.append(p)
                p.build(self)
            elif callable(p):
                p(self)
            else:
                raise TypeError(f"not a plugin: {p!r}")
        return self

    def is_plugin_added(self, name: str) -> bool:
        return name in self._plugin_names

    def set_error_handler(self, handler):
        """Route system errors (ref: App::set_error_handler,
        bevy_ecs/src/error/handler.rs — the panic/warn/ignore policies).
        `handler(exc, system)` is called for exceptions raised — or
        Exception values returned — by system bodies at trace/host time;
        the failing system's staged writes are skipped. `None` restores
        the default panic (re-raise). Shorthands: "warn" logs and
        continues; "ignore" continues silently.

        Trace semantics: a device system that fails AT TRACE TIME is
        compiled out of that segment — the handler fires once per trace,
        not per frame, and the system stays skipped until a retrace.
        Host systems run eagerly, so their failures route every frame."""
        if handler == "warn":
            import logging

            def handler(e, sys_):  # noqa: F811
                logging.getLogger("bevy_tpu").warning(
                    "system %s failed: %s", sys_.name, e)
        elif handler == "ignore":
            def handler(e, sys_):  # noqa: F811
                pass
        self.world.error_handler = handler
        return self

    def insert_resource(self, res, value=None):
        """Insert/overwrite a resource (ref: App::insert_resource)."""
        self.world.insert_resource(res, value)
        self._plan_cache.clear()
        return self

    def init_resource(self, res_or_instance):
        """Insert only if absent (ref: App::init_resource) — what plugins
        use so user-provided settings win."""
        if isinstance(res_or_instance, ComponentInstance):
            spec = res_or_instance.spec
            if spec.name not in self.world.state["res"]:
                self.world.insert_resource(res_or_instance)
        else:
            spec = get_spec(res_or_instance)
            if spec.name not in self.world.state["res"]:
                self.world.insert_resource(res_or_instance())
        return self

    def add_message(self, msg, capacity: int = 1024):
        self.world.add_message(msg, capacity)
        self._plan_cache.clear()
        return self

    def add_observer(self, ev, observer_system, capacity: int = 64):
        """Register a push-reaction to an event (ref: App::add_observer).
        The observer system runs in every schedule that contains a system
        with a Trigger(ev) param, immediately after that schedule's systems
        (trace-time splicing; see ecs/observer.py).

        `ev` may also be a lifecycle trigger — OnAdd(C)/OnInsert(C)/
        OnRemove(C) (ref: lifecycle observers, bevy_ecs/src/lifecycle.rs).
        Lifecycle observers splice after frame start (host-tier spawns
        between frames) and after every Commands-bearing system (device-tier
        structural changes), reading fresh events via a LifecycleMask
        param's tick window."""
        from bevy_tpu.ecs.observer import (LifecycleTrigger,
                                           register_event_storage)
        from bevy_tpu.ecs.schedule import SystemEntry

        if isinstance(ev, LifecycleTrigger):
            observer_system.init_state(self.world)
            # start the tick window NOW: rows that existed before
            # registration don't fire (ref: observers see only subsequent
            # lifecycle events), but spawns after this call do. int() forces
            # a fresh buffer — aliasing state["tick"] would donate the same
            # buffer twice in the jitted segment.
            self.world.state["sys"][observer_system.id]["last_run"] = \
                jnp.asarray(int(self.world.state["tick"]), jnp.int32)
            self._lifecycle_observers.append(SystemEntry(observer_system))
            self._plan_cache.clear()
            return self
        spec = register_event_storage(self.world, ev, capacity)
        self._observers.setdefault(spec.name, []).append(
            SystemEntry(observer_system))
        self._plan_cache.clear()
        return self

    # ------------------------------------------------------------------
    # plan building: flatten schedules into host/jit segments

    def _items(self, labels, include_frame_end):
        items = []
        if include_frame_end:
            items.append(("frame_begin",))
        from bevy_tpu.ecs.observer import Trigger

        stepping = getattr(self, "_stepping", None)
        stepped = set(stepping.labels) if stepping is not None and \
            stepping.enabled else set()
        for label in labels:
            if label in stepped:
                continue  # pulled out of the frame; run via Stepping.step()
            sched = self.schedules.get(label)
            if sched is not None:
                sched.init_systems(self.world)
                items += [("sys", e) for e in sched.items()]
                # splice observers after schedules that trigger their event
                if self._observers:
                    fired = set()
                    for e in sched.items():
                        for p in e.system.params.values():
                            if isinstance(p, Trigger):
                                fired.add(p.spec.name)
                    for name in fired:
                        for obs in self._observers.get(name, ()):
                            obs.system.init_state(self.world)
                            items.append(("sys", obs))
            if label == RunFixedMainLoop:
                for fl in self.fixed_order:
                    if fl in self.schedules:
                        self.schedules[fl].init_systems(self.world)
                items.append(("fixed",))
        if include_frame_end:
            items.append(("frame_end",))
        if self._lifecycle_observers:
            items = self._splice_lifecycle(items)
        return items

    def _splice_lifecycle(self, items):
        """Insert lifecycle observers after frame start (host-tier
        structural changes land between frames) and after every
        Commands-bearing item, so each splice point observes the fresh
        add/insert/remove tick window (see App.add_observer)."""
        for obs in self._lifecycle_observers:
            obs.system.init_state(self.world)  # last_run set at add_observer
        out = []
        for it in items:
            out.append(it)
            if it[0] == "frame_begin" or self._item_has_commands(it):
                out += [("sys", obs) for obs in self._lifecycle_observers]
        return out

    def register_frame_input(self, name: str, initial, fn):
        """Add a host→device per-frame input channel (ref: the winit→bevy
        message conversion position, bevy_winit/src/converters.rs — here
        values enter the jitted frame as traced arguments). `initial` sets
        shape/dtype in the frame_input resource; `fn()` supplies the value
        each frame."""
        store = dict(self.world.state["res"].get("frame_input", {}))
        store.setdefault("dt", jnp.zeros((), jnp.float32))
        store[name] = jnp.asarray(initial)
        self.world.state["res"]["frame_input"] = store
        self.world.structure_version += 1
        self._input_channels[name] = fn
        self._plan_cache.clear()
        return self

    def _gather_frame_inputs(self, dt):
        import numpy as _np

        fin = {"dt": _np.float32(dt)}
        for name, fn in self._input_channels.items():
            fin[name] = fn()
        return fin

    def _thunk(self, item):
        """Thunks are (state, fin) -> state; fin (dt + input channels) is a
        traced per-frame input so the steady-state loop contains ZERO eager
        device ops (eager dispatches can cost seconds over tunneled TPU
        backends)."""
        world = self.world
        if item[0] == "sys":
            entry = item[1]
            return lambda state, fin: _run_entry(entry, state, world)
        if item[0] == "fixed":
            return lambda state, fin: self._fixed_loop(state)
        if item[0] == "frame_begin":
            def frame_begin(state, fin):
                if "frame_input" not in state["res"]:
                    return state
                store = dict(state["res"]["frame_input"])
                store["dt"] = jnp.asarray(fin["dt"], jnp.float32)
                for name, val in fin.items():
                    if name != "dt" and name in store:
                        store[name] = jnp.asarray(val, store[name].dtype)
                return set_in(state, ("res", "frame_input"), store)
            return frame_begin
        if item[0] == "frame_end":
            from bevy_tpu.ecs.observer import clear_observer_buffers

            def frame_end(state, fin):
                state = swap_message_buffers(state)
                state = clear_observer_buffers(state)
                return set_in(state, ("frame",), state["frame"] + 1)
            return frame_end
        raise ValueError(item)

    def _segment(self, key, items):
        """Compile (and cache) one maximal run of device items as a jitted,
        state-donating function."""
        seg = self._plan_cache.get(key)
        if seg is None:
            thunks = [self._thunk(it) for it in items]

            def run_seg(state, fin):
                for t in thunks:
                    state = t(state, fin)
                return state

            seg = jax.jit(run_seg, donate_argnums=0)
            self._plan_cache[key] = seg
        return seg

    def _run_labels(self, labels, include_frame_end=False, dt=0.0):
        """Run a label sequence. Maximal runs of device systems execute as
        one jitted segment; host systems run eagerly in between and may
        change world structure (we rebuild the item list when they do)."""
        fin = self._gather_frame_inputs(dt)
        items = self._items(labels, include_frame_end)
        version = self.world.structure_version
        i = 0
        while i < len(items):
            it = items[i]
            if it[0] == "sys" and it[1].system.host:
                run_host_entry(it[1], self.world)
                i += 1
                if self.world.structure_version != version:
                    version = self.world.structure_version
                    items = self._items(labels, include_frame_end)
            else:
                j = i
                while j < len(items) and not (
                        items[j][0] == "sys" and items[j][1].system.host):
                    j += 1
                key = (tuple(labels), include_frame_end, i, j, version)
                seg = self._segment(key, items[i:j])
                self.world.state = seg(self.world.state, fin)
                if any(self._item_has_commands(it) for it in items[i:j]):
                    self.world.mark_device_dirty()
                i = j

    def _item_has_commands(self, it):
        if it[0] == "sys":
            return it[1].system.has_commands
        if it[0] == "fixed":
            return any(e.system.has_commands
                       for fl in self.fixed_order if fl in self.schedules
                       for e in self.schedules[fl].entries)
        return False

    # ------------------------------------------------------------------
    # fixed main loop (ref: run_fixed_main_schedule, bevy_time fixed.rs:243)

    def _fixed_loop(self, state):
        if "time_fixed" not in state["res"]:
            return state
        world = self.world
        fixed_scheds = [self.schedules[l] for l in self.fixed_order
                        if l in self.schedules]
        max_steps = self.max_fixed_steps_per_frame

        def cond(carry):
            state, steps = carry
            tf = state["res"]["time_fixed"]
            return (tf["overstep"] >= tf["timestep"]) & (steps < max_steps)

        def body(carry):
            state, steps = carry
            tf = state["res"]["time_fixed"]
            ts = tf["timestep"]
            state = set_in(state, ("res", "time_fixed"), {
                "timestep": ts,
                "overstep": tf["overstep"] - ts,
                "elapsed": tf["elapsed"] + ts,
            })
            # generic Time becomes the fixed clock inside FixedMain
            if "time" in state["res"]:
                t = dict(state["res"]["time"])
                t["delta"] = ts
                t["elapsed"] = state["res"]["time_fixed"]["elapsed"]
                state = set_in(state, ("res", "time"), t)
            for sched in fixed_scheds:
                state = sched.run_traced(state, world)
            return (state, steps + 1)

        state, _ = jax.lax.while_loop(cond, body, (state, jnp.asarray(0, jnp.int32)))
        # restore the generic clock to virtual time
        if "time" in state["res"] and "time_virtual" in state["res"]:
            tv = state["res"]["time_virtual"]
            t = dict(state["res"]["time"])
            t["delta"] = tv["delta"]
            t["elapsed"] = tv["elapsed"]
            state = set_in(state, ("res", "time"), t)
        return state

    # ------------------------------------------------------------------
    # running

    def startup(self):
        if self._started:
            return
        self._started = True
        for p in self._plugins:
            p.finish(self)
        for label in self.startup_order:
            if label in self.schedules:
                self.schedules[label].init_systems(self.world)
        self._run_labels(self.startup_order, include_frame_end=False)

    def _frame_dt(self) -> float:
        if self.time_strategy is not None:
            return float(self.time_strategy)
        now = _pytime.perf_counter()
        if self._last_wall is None:
            self._last_wall = now
            return 1.0 / 60.0
        dt = now - self._last_wall
        self._last_wall = now
        return dt

    def add_prepare_hook(self, fn):
        """Host callback run before a frame whenever world structure changed
        since its last run (ref position: PrepareAssets/PrepareMeshes,
        bevy_render lib.rs:158 — host-side table rebuilds, e.g. the mesh
        instance→triangle expansion)."""
        self._prepare_hooks.append(fn)
        self._prepare_versions.append(-1)
        return self

    def _run_prepare_hooks(self):
        for k, fn in enumerate(self._prepare_hooks):
            if self._prepare_versions[k] != self.world.structure_version:
                fn(self.world)
                self._prepare_versions[k] = self.world.structure_version

    def add_frame_hook(self, fn):
        """Host callback after each update (diagnostics, recorders …)."""
        self._frame_hooks.append(fn)
        return self

    def update(self, dt: Optional[float] = None):
        """One frame (ref: SubApps::update, sub_app.rs:575)."""
        self.startup()
        self._run_prepare_hooks()
        dt = self._frame_dt() if dt is None else float(dt)
        self.last_dt = dt          # host frame hooks (audio drain) read this
        order = list(self.main_order)
        for label in (ExtractSchedule, Render):
            if label in self.schedules and label not in order:
                order.append(label)
        self._run_labels(order, include_frame_end=True, dt=dt)
        for hook in self._frame_hooks:
            hook(self)

    def frame_fn(self):
        """The whole frame as one pure function `step(state) -> state`
        (requires no host systems — the common post-startup case; see module
        docstring). This is what bench/driver entry points compile."""
        self.startup()
        self._run_prepare_hooks()
        order = list(self.main_order)
        for label in (ExtractSchedule, Render):
            if label in self.schedules and label not in order:
                order.append(label)
        items = self._items(order, include_frame_end=True)
        host = [it[1].system.name for it in items
                if it[0] == "sys" and it[1].system.host]
        if host:
            raise RuntimeError(f"frame_fn requires a host-free frame; host systems: {host}")
        thunks = [self._thunk(it) for it in items]
        default_fin = self._gather_frame_inputs(1.0 / 60.0)

        def step(state, fin=None):
            fin2 = default_fin if fin is None else fin
            for t in thunks:
                state = t(state, fin2)
            return state

        return step

    _exit_check = None

    def should_exit(self) -> bool:
        store = self.world.state["msg"].get("app_exit")
        if store is None:
            return False
        # jitted + cached: eager ops can cost seconds/dispatch on tunneled
        # TPU backends; the frame loop must stay compiled end to end
        if App._exit_check is None:
            App._exit_check = jax.jit(lambda c: jnp.sum(c) > 0)
        return bool(jax.device_get(App._exit_check(store["count"])))

    def run(self, max_frames: Optional[int] = None, dt: Optional[float] = None):
        """Headless loop (ref: ScheduleRunnerPlugin::run_loop)."""
        frames = 0
        while True:
            self.update(dt)
            frames += 1
            if max_frames is not None and frames >= max_frames:
                break
            if getattr(self, "_ci_exit", False):
                break
            if self.should_exit():
                break
        return self

    @property
    def frame(self) -> int:
        return int(jax.device_get(self.world.state["frame"]))

    # -- one-shot systems (ref: SystemRegistry, system/system_registry.rs:
    # register once, run on demand outside any schedule) ----------------
    def register_system(self, sys) -> int:
        """Returns an id for `run_system` (ref: World::register_system)."""
        if not hasattr(self, "_one_shot"):
            self._one_shot = []
        self._one_shot.append(sys)
        return len(self._one_shot) - 1

    def run_system(self, sys_or_id):
        """Run one system immediately, outside the schedules (ref:
        World::run_system / Commands::run_system). Host systems run
        eagerly; device systems execute their ops eagerly against the
        current world state."""
        from bevy_tpu.ecs.schedule import SystemEntry, run_host_entry

        sys = self._one_shot[sys_or_id] \
            if isinstance(sys_or_id, int) else sys_or_id
        sys.init_state(self.world)
        if getattr(sys, "host", False):
            run_host_entry(SystemEntry(sys), self.world)
        else:
            self.world.state = sys.run(self.world.state, self.world)
