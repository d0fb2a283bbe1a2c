"""Stepping debugger (reference twin: bevy_ecs Stepping —
`bevy_ecs/src/schedule/stepping.rs`: pause marked schedules and execute
their systems one at a time for inspection).

TPU twin: enabled stepping pulls the marked schedules OUT of the fused
jitted frame (they contribute nothing while paused) and runs their systems
eagerly one per `.step()` call — each system becomes its own jitted
mini-segment, so world state between steps is real and inspectable from
the host. A debug tool: per-system dispatch is the cost the fused frame
exists to avoid, so use on CPU or accept tunnel latency.
"""

from __future__ import annotations

import jax


class Stepping:
    """ref: the Stepping resource. Usage::

        st = Stepping(app).add_schedule(Update)
        st.enable()
        app.update()        # Update's systems are skipped this frame
        name = st.step()    # run exactly one system, returns its name
        st.continue_()      # run the rest of the schedule's systems
        st.disable()        # Update fuses back into the jitted frame
    """

    def __init__(self, app):
        self.app = app
        self.labels = []
        self.enabled = False
        self._cursor = 0
        app._stepping = self

    def add_schedule(self, label):
        """Mark a schedule for stepping (ref: Stepping::add_schedule)."""
        if label not in self.labels:
            self.labels.append(label)
        return self

    # -- control (ref: Stepping::enable/disable/step_frame/continue_frame) --

    def enable(self):
        self.enabled = True
        self._cursor = 0
        self.app._plan_cache.clear()
        self.app.world.structure_version += 1
        return self

    def disable(self):
        self.enabled = False
        self.app._plan_cache.clear()
        self.app.world.structure_version += 1
        return self

    def _entries(self):
        out = []
        for label in self.labels:
            sched = self.app.schedules.get(label)
            if sched is not None:
                sched.init_systems(self.app.world)
                out += sched.items()
        return out

    def step(self):
        """Run the next stepped system eagerly; returns its name (None when
        the cursor wrapped — the 'frame' of stepped systems completed)."""
        if not self.enabled:
            raise RuntimeError("Stepping.step() requires enable() first")
        entries = self._entries()
        if not entries:
            return None
        if self._cursor >= len(entries):
            self._cursor = 0
            return None
        entry = entries[self._cursor]
        self._cursor += 1
        self._run(entry)
        return entry.system.name

    def continue_(self):
        """Run the remaining stepped systems, wrap the cursor (ref:
        Stepping::continue_frame). Returns the names run."""
        if not self.enabled:
            raise RuntimeError("Stepping.continue_() requires enable() first")
        entries = self._entries()
        names = []
        while self._cursor < len(entries):
            entry = entries[self._cursor]
            self._cursor += 1
            self._run(entry)
            names.append(entry.system.name)
        self._cursor = 0
        return names

    def _run(self, entry):
        from bevy_tpu.ecs.schedule import _run_entry, run_host_entry

        world = self.app.world
        if entry.system.host:
            run_host_entry(entry, world)
            return
        world.state = jax.jit(
            lambda s: _run_entry(entry, s, world))(world.state)
        if entry.system.has_commands:
            world.mark_device_dirty()
