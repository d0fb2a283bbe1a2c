"""Profile the many_cubes frame on the real TPU (round-4 annex source).

Optional env: BEVY_TPU_EVAL_TRIS overrides the example's eval_tris
(default 8 → 4 quad slots; a convex cube shows at most 3 front faces =
3 quads, so 6 is the tight cap to A/B).
"""

from __future__ import annotations

import os
import sys
import time as pytime
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax


def main():
    from examples.many_cubes import build_app

    kw = {}
    if os.environ.get("BEVY_TPU_EVAL_TRIS"):
        kw["eval_tris"] = int(os.environ["BEVY_TPU_EVAL_TRIS"])
    print("build...", flush=True)
    app = build_app(**kw)
    print("app built", flush=True)
    step = jax.jit(app.frame_fn(), donate_argnums=0)
    state = app.world.state
    for _ in range(3):
        state = step(state)
    jax.device_get(state["frame"])
    print("compiled", flush=True)
    t0 = pytime.perf_counter()
    n = 20
    for _ in range(n):
        state = step(state)
    jax.device_get(state["frame"])
    ms = (pytime.perf_counter() - t0) / n * 1000.0
    print(f"many_cubes: {ms:.3f} ms/frame", flush=True)

    if os.environ.get("BEVY_TPU_PROFILE", "1") == "1":
        jax.profiler.start_trace("/tmp/many_cubes_trace")
        for _ in range(3):
            state = step(state)
        jax.device_get(state["frame"])
        jax.profiler.stop_trace()
        print("traced", flush=True)
        import glob
        from bevy_tpu.profiling import summarize_trace
        runs = sorted(glob.glob("/tmp/many_cubes_trace/plugins/profile/*"))
        for name, ms_op in summarize_trace(runs[-1], frames=3)[:40]:
            print(f"{ms_op:9.3f} ms  {name[:110]}")


if __name__ == "__main__":
    main()
