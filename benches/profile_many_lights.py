"""Profile the many_lights deferred-shade frame on the real TPU.

Round-5 annex source for BASELINE.md (VERDICT r4 weak #5: many_lights
flat at ~29 ms for two rounds with no profile since the round-3
row-gather work)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import time as pytime

import jax


def main():
    print("build...", flush=True)
    from examples.many_lights import build_app

    app = build_app()
    print("app built", flush=True)
    step = jax.jit(app.frame_fn(), donate_argnums=0)
    state = app.world.state
    for _ in range(3):
        state = step(state)
    jax.device_get(state["frame"])
    t0 = pytime.perf_counter()
    n = 20
    for _ in range(n):
        state = step(state)
    jax.device_get(state["frame"])
    print(f"many_lights: {(pytime.perf_counter() - t0) / n * 1000:.3f} "
          "ms/frame", flush=True)

    jax.profiler.start_trace("/tmp/many_lights_trace")
    for _ in range(3):
        state = step(state)
    jax.device_get(state["frame"])
    jax.profiler.stop_trace()

    import glob
    from collections import defaultdict

    from bevy_tpu.profiling import _load_xplanes
    runs = sorted(glob.glob("/tmp/many_lights_trace/plugins/profile/*"))
    for xs in _load_xplanes(runs[-1]):
        for plane in xs.planes:
            if plane.name != "/device:TPU:0":
                continue
            meta = {eid: em.name for eid, em in
                    plane.event_metadata.items()}
            for line in plane.lines:
                if line.name != "XLA Ops":
                    continue
                tot = defaultdict(float)
                for e in line.events:
                    tot[meta.get(e.metadata_id, "?")] += e.duration_ps
                rows = sorted(tot.items(), key=lambda kv: -kv[1])
                print("serialized XLA Ops line, ms/frame over 3:")
                for k, v in rows[:30]:
                    print(f"  {v / 1e9 / 3:8.3f}  {k[:120]}")


if __name__ == "__main__":
    main()
