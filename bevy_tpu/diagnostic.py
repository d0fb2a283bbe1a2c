"""Diagnostics (reference twin: bevy_diagnostic — Diagnostic ring buffer
with smoothed average `src/diagnostic.rs:125`, DiagnosticsStore `:305`,
FrameTimeDiagnosticsPlugin fps/frame_time/frame_count
`src/frame_time_diagnostics_plugin.rs`, EntityCountDiagnosticsPlugin,
LogDiagnosticsPlugin printer).

Host-side by design: frame time is wall-clock around the jitted step (the
device-side cost breakdown comes from the jax profiler — see
docs in ARCHITECTURE.md §profiling).
"""

from __future__ import annotations

import time
from collections import deque
from typing import Dict, Optional

from bevy_tpu.app.plugin import Plugin

DEFAULT_MAX_HISTORY = 120  # ref: DEFAULT_MAX_HISTORY_LENGTH


class Diagnostic:
    """Ring-buffer measurement with EMA smoothing (ref: Diagnostic)."""

    def __init__(self, name: str, max_history: int = DEFAULT_MAX_HISTORY,
                 smoothing_factor: Optional[float] = None, suffix: str = ""):
        self.name = name
        self.history = deque(maxlen=max_history)
        self.suffix = suffix
        self.ema = None
        # ref default: 2 / (history + 1)
        self.alpha = smoothing_factor or 2.0 / (max_history + 1)

    def add_measurement(self, value: float):
        self.history.append(float(value))
        self.ema = value if self.ema is None else \
            self.ema + self.alpha * (value - self.ema)

    @property
    def value(self):
        return self.history[-1] if self.history else None

    @property
    def average(self):
        return sum(self.history) / len(self.history) if self.history else None

    @property
    def smoothed(self):
        return self.ema


class DiagnosticsStore:
    """ref: DiagnosticsStore resource (host-side registry here)."""

    def __init__(self):
        self.diagnostics: Dict[str, Diagnostic] = {}

    def register(self, diag: Diagnostic):
        self.diagnostics[diag.name] = diag
        return diag

    def get(self, name: str) -> Optional[Diagnostic]:
        return self.diagnostics.get(name)

    def add_measurement(self, name: str, value: float):
        if name in self.diagnostics:
            self.diagnostics[name].add_measurement(value)


class FrameTimeDiagnosticsPlugin(Plugin):
    """fps / frame_time / frame_count (ref: frame_time_diagnostics_plugin).
    Measures wall time between App.update calls via frame hooks."""

    FRAME_TIME = "frame_time"
    FPS = "fps"
    FRAME_COUNT = "frame_count"

    def build(self, app):
        store = getattr(app, "diagnostics", None)
        if store is None:
            store = DiagnosticsStore()
            app.diagnostics = store
        store.register(Diagnostic(self.FRAME_TIME, suffix="ms"))
        store.register(Diagnostic(self.FPS))
        store.register(Diagnostic(self.FRAME_COUNT))
        last = {"t": None, "n": 0}

        def tick(_app):
            now = time.perf_counter()
            if last["t"] is not None:
                dt = now - last["t"]
                store.add_measurement(self.FRAME_TIME, dt * 1000.0)
                if dt > 0:
                    store.add_measurement(self.FPS, 1.0 / dt)
            last["t"] = now
            last["n"] += 1
            store.add_measurement(self.FRAME_COUNT, last["n"])

        app.add_frame_hook(tick)


class EntityCountDiagnosticsPlugin(Plugin):
    """ref: EntityCountDiagnosticsPlugin. `every` throttles the host sync."""

    ENTITY_COUNT = "entity_count"

    def __init__(self, every: int = 30):
        self.every = every

    def build(self, app):
        store = getattr(app, "diagnostics", None)
        if store is None:
            store = DiagnosticsStore()
            app.diagnostics = store
        store.register(Diagnostic(self.ENTITY_COUNT))
        counter = {"n": 0}
        every = self.every

        def tick(app_):
            counter["n"] += 1
            if counter["n"] % every == 0:
                app_.world.mark_device_dirty()
                store.add_measurement(self.ENTITY_COUNT,
                                      app_.world.num_alive)

        app.add_frame_hook(tick)


class LogDiagnosticsPlugin(Plugin):
    """Periodic printer (ref: LogDiagnosticsPlugin)."""

    def __init__(self, interval: float = 1.0):
        self.interval = interval

    def build(self, app):
        last = {"t": time.perf_counter()}
        interval = self.interval

        def tick(app_):
            now = time.perf_counter()
            if now - last["t"] < interval:
                return
            last["t"] = now
            store = getattr(app_, "diagnostics", None)
            if not store:
                return
            parts = []
            for d in store.diagnostics.values():
                if d.value is None:
                    continue
                parts.append(f"{d.name}: {d.value:.2f}{d.suffix}"
                             f" (avg {d.average:.2f})")
            if parts:
                print(" | ".join(parts))

        app.add_frame_hook(tick)


class SystemInfoDiagnosticsPlugin(Plugin):
    """ref: SystemInformationDiagnosticsPlugin (sysinfo CPU/mem) — reads
    /proc on Linux hosts each `every` frames."""

    CPU_USAGE = "system/cpu_usage"
    MEM_USAGE = "system/mem_usage"

    def __init__(self, every: int = 30):
        self.every = every
        self._prev = None

    def build(self, app):
        store = getattr(app, "diagnostics", None)
        if store is None:
            store = DiagnosticsStore()
            app.diagnostics = store
        store.register(Diagnostic(self.CPU_USAGE))
        store.register(Diagnostic(self.MEM_USAGE))
        state = {"n": 0}
        plugin = self

        def tick(app_):
            state["n"] += 1
            if state["n"] % plugin.every:
                return
            try:
                with open("/proc/stat") as f:
                    parts = f.readline().split()[1:8]
                vals = list(map(int, parts))
                idle = vals[3] + vals[4]
                total = sum(vals)
                if plugin._prev is not None:
                    didle = idle - plugin._prev[0]
                    dtotal = max(total - plugin._prev[1], 1)
                    store.add_measurement(
                        plugin.CPU_USAGE, 100.0 * (1.0 - didle / dtotal))
                plugin._prev = (idle, total)
                info = {}
                with open("/proc/meminfo") as f:
                    for line in f:
                        k, v = line.split(":", 1)
                        info[k] = int(v.split()[0])
                used = info["MemTotal"] - info.get(
                    "MemAvailable", info.get("MemFree", 0))
                store.add_measurement(
                    plugin.MEM_USAGE, 100.0 * used / info["MemTotal"])
            except (OSError, KeyError, ValueError):
                pass

        app.add_frame_hook(tick)
