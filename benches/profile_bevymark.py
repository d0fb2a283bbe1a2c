"""Profile the bevymark steady-state frame on the real TPU.

Builds the app, spins to steady state (~30k live birds), then captures a
3-frame xplane trace and prints the top device ops. Round-4 annex source
for BASELINE.md (VERDICT r3 weak #1: no profile exists for the splat
path).
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import time as pytime

import jax
import numpy as np


def main():
    print("build...", flush=True)
    from examples.bevymark import build_app

    app = build_app()
    print("app built", flush=True)
    step = jax.jit(app.frame_fn(), donate_argnums=0)
    state = app.world.state
    for _ in range(3):
        state = step(state)
    jax.device_get(state["frame"])
    for _ in range(150):
        state = step(state)
    jax.device_get(state["frame"])
    print("steady", flush=True)

    # timed steady state
    t0 = pytime.perf_counter()
    n = 30
    for _ in range(n):
        state = step(state)
    jax.device_get(state["frame"])
    ms = (pytime.perf_counter() - t0) / n * 1000.0
    alive = int(np.asarray(jax.device_get(state["ent"]["alive"])).sum())
    print(f"bevymark {alive} birds: {ms:.3f} ms/frame")

    # trace 3 frames
    jax.profiler.start_trace("/tmp/bevymark_trace")
    for _ in range(3):
        state = step(state)
    jax.device_get(state["frame"])
    jax.profiler.stop_trace()
    print("traced", flush=True)

    import glob
    from bevy_tpu.profiling import summarize_trace
    runs = sorted(glob.glob("/tmp/bevymark_trace/plugins/profile/*"))
    for name, ms_op in summarize_trace(runs[-1], frames=3)[:40]:
        print(f"{ms_op:9.3f} ms  {name[:110]}")


if __name__ == "__main__":
    main()
