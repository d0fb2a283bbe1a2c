"""Profiling (reference model: the tracing/Tracy pipeline —
per-system spans `multi_threaded.rs:15`, frame marks
`renderer/mod.rs:131`, and docs/profiling.md's workflow).

TPU form: every system already runs inside `jax.named_scope("system:…")`
(ecs/system.py), so a jax profiler trace carries the full schedule
structure. This module wraps capture + the XPlane readback that replaces
Tracy/chrome-tracing:

    from bevy_tpu.profiling import trace_frames, summarize_trace
    path = trace_frames(app, frames=3)          # .../plugins/profile/...
    for name, ms in summarize_trace(path, frames=3)[:20]:
        print(f"{ms:8.3f} ms  {name}")

Durations come from the device plane of the XPlane proto (TensorBoard's
format), so they are real device-op times, not host wall-clock.
"""

from __future__ import annotations

import glob
import os
from collections import defaultdict


def trace_frames(app, frames: int = 3, logdir: str = "/tmp/bevy_tpu_trace",
                 warmup: int = 1):
    """Capture `frames` app updates under the jax profiler. Returns the
    directory holding the .xplane.pb (newest run)."""
    import jax

    for _ in range(warmup):                 # compile outside the trace
        app.update(dt=1 / 60)
    jax.profiler.start_trace(logdir)
    for _ in range(frames):
        app.update(dt=1 / 60)
    jax.profiler.stop_trace()
    runs = sorted(glob.glob(os.path.join(logdir, "plugins/profile/*")))
    return runs[-1] if runs else logdir


def _load_xplanes(run_dir: str):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    spaces = []
    for path in glob.glob(os.path.join(run_dir, "*.xplane.pb")):
        xs = xplane_pb2.XSpace()
        with open(path, "rb") as f:
            xs.ParseFromString(f.read())
        spaces.append(xs)
    return spaces


def summarize_trace(run_dir: str, frames: int = 1, device_only: bool = True):
    """Aggregate XPlane event durations by name → list of
    (name, ms_per_frame) sorted descending. `device_only` keeps the
    device planes (TPU/accelerator ops); pass False for host spans
    (the named_scope system spans live there on CPU backends)."""
    totals = defaultdict(float)              # picoseconds
    for xs in _load_xplanes(run_dir):
        for plane in xs.planes:
            is_dev = "/device:" in plane.name or "TPU" in plane.name or \
                "Device" in plane.name
            if device_only and not is_dev:
                continue
            names = {eid: em.name for eid, em in
                     plane.event_metadata.items()}
            for line in plane.lines:
                for ev in line.events:
                    totals[names.get(ev.metadata_id, "?")] += \
                        ev.duration_ps
    out = [(name, ps / 1e9 / max(frames, 1))    # ps → ms, per frame
           for name, ps in totals.items()]
    out.sort(key=lambda kv: -kv[1])
    return out


def frame_time_ms(run_dir: str, frames: int = 1):
    """Total device-op time per frame (the 'jit_step' span when present,
    else the sum of top-level module events)."""
    rows = summarize_trace(run_dir, frames)
    for name, ms in rows:
        if "jit_step" in name or "jit__step" in name:
            return ms
    return sum(ms for _, ms in rows)
