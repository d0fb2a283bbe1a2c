"""Driver benchmark entry point. Prints ONE JSON line:
{"metric": ..., "value": N, "unit": ..., "vs_baseline": N, "extra": {...}}

Flagship workload: many_cubes (160k cube instances, full frame = sim +
transform + instance cull + cluster raster + shade @1280x720) — the one
BASELINE.md config with a hard ms target (16 ms on v5e-8; this measures
ONE chip, no scaling extrapolation applied). vs_baseline = target_ms /
measured_ms (>1 beats the target).

"extra" carries the other stress workloads (measured the same way) so
the driver sees every tracked number, not just the flagship: all five
BASELINE.json configs — many_sprites 100k, bevymark (steady-state ~30k
live birds, in-jit spawning), many_lights 100k, many_foxes 1k skinned.
Sprite workloads are scored against the 16.67 ms (60 FPS) target.
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent / "examples"))


def _measure(build, n_frames=20, warm_frames=3, settle=0):
    import jax

    app = build()
    step = jax.jit(app.frame_fn(), donate_argnums=0)
    state = app.world.state
    for _ in range(warm_frames):
        state = step(state)
    # device_get forces real completion (block_until_ready does not truly
    # sync on tunneled TPU backends)
    jax.device_get(state["frame"])
    for _ in range(settle):
        state = step(state)
    if settle:
        jax.device_get(state["frame"])
    t0 = time.perf_counter()
    for _ in range(n_frames):
        state = step(state)
    jax.device_get(state["frame"])
    return (time.perf_counter() - t0) / n_frames * 1000.0


def main():
    from bevymark import build_app as build_bevymark
    from many_cubes import build_app as build_cubes
    from many_foxes import build_app as build_foxes
    from many_lights import build_app as build_lights
    from many_sprites import build_app as build_sprites

    cubes_ms = _measure(lambda: build_cubes())
    sprites_ms = _measure(lambda: build_sprites(n_sprites=100_000))
    # 150 settle frames ≈ 25k-38k live birds at 10k/s spawn (steady climb;
    # matches the reference's continuous-spawn shape, bevymark.rs:23)
    bevymark_ms = _measure(lambda: build_bevymark(), settle=150)
    lights_ms = _measure(lambda: build_lights())
    foxes_ms = _measure(lambda: build_foxes())

    print(json.dumps({
        "metric": "many_cubes_160k_frame_time",
        "value": round(cubes_ms, 3),
        "unit": "ms",
        "vs_baseline": round(16.0 / cubes_ms, 3),
        "extra": {
            "many_sprites_100k_frame_time_ms": round(sprites_ms, 3),
            "many_sprites_vs_60fps": round(16.67 / sprites_ms, 3),
            "bevymark_30k_frame_time_ms": round(bevymark_ms, 3),
            "bevymark_vs_60fps": round(16.67 / bevymark_ms, 3),
            "many_lights_100k_frame_time_ms": round(lights_ms, 3),
            "many_foxes_1k_frame_time_ms": round(foxes_ms, 3),
        },
    }))


if __name__ == "__main__":
    main()
