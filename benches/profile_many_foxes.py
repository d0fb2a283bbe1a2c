"""Profile the many_foxes frame on the real TPU (round-4 annex source;
VERDICT r3 weak #4: many_foxes passes by 0.3% and has never had a
profiling annex)."""

from __future__ import annotations

import os
import sys
import time as pytime
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax


def main():
    from examples.many_foxes import build_app

    print("build...", flush=True)
    app = build_app()
    print("app built", flush=True)
    step = jax.jit(app.frame_fn(), donate_argnums=0)
    state = app.world.state
    for _ in range(3):
        state = step(state)
    jax.device_get(state["frame"])
    print("compiled", flush=True)
    t0 = pytime.perf_counter()
    n = 30
    for _ in range(n):
        state = step(state)
    jax.device_get(state["frame"])
    ms = (pytime.perf_counter() - t0) / n * 1000.0
    print(f"many_foxes: {ms:.3f} ms/frame", flush=True)

    if os.environ.get("BEVY_TPU_PROFILE", "1") == "1":
        jax.profiler.start_trace("/tmp/many_foxes_trace")
        for _ in range(3):
            state = step(state)
        jax.device_get(state["frame"])
        jax.profiler.stop_trace()
        print("traced", flush=True)
        import glob
        from bevy_tpu.profiling import summarize_trace
        runs = sorted(glob.glob("/tmp/many_foxes_trace/plugins/profile/*"))
        for name, ms_op in summarize_trace(runs[-1], frames=3)[:35]:
            print(f"{ms_op:9.3f} ms  {name[:110]}")


if __name__ == "__main__":
    main()
