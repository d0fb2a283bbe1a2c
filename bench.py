"""Driver benchmark entry point. Prints ONE JSON line:
{"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Current flagship workload: many_sprites (100k sprites, full frame =
sim + transform + extract + bin + raster @1280x720) — BASELINE.md target
16.67 ms/frame (60 FPS). vs_baseline = target_ms / measured_ms (>1 beats
the target). Upgraded to many_cubes once the 3D pipeline lands.
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent / "examples"))

TARGET_MS = 16.67  # 60 FPS (BASELINE.md bevymark/many_sprites target)


def main():
    import jax
    from many_sprites import build_app

    app = build_app(n_sprites=100_000)
    step = jax.jit(app.frame_fn(), donate_argnums=0)
    state = app.world.state
    for _ in range(3):
        state = step(state)
    # device_get forces real completion (block_until_ready does not truly
    # sync on tunneled TPU backends)
    jax.device_get(state["frame"])
    n = 30
    t0 = time.perf_counter()
    for _ in range(n):
        state = step(state)
    jax.device_get(state["frame"])
    ms = (time.perf_counter() - t0) / n * 1000.0
    print(json.dumps({
        "metric": "many_sprites_100k_frame_time",
        "value": round(ms, 3),
        "unit": "ms",
        "vs_baseline": round(TARGET_MS / ms, 3),
    }))


if __name__ == "__main__":
    main()
