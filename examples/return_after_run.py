"""Return after run (reference twin: examples/app/return_after_run.rs —
the app loop exits cleanly and control returns to main)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax.numpy as jnp

from bevy_tpu import App, Res, ResMut, Update
from bevy_tpu.app.app import AppExit
from bevy_tpu.ecs.system import system
from bevy_tpu.time import Time, TimePlugin


def build_app(frames=5):
    app = App(capacity=4)
    app.add_plugins(TimePlugin())
    app.insert_resource("run_state", {"count": jnp.zeros((), jnp.int32)})

    @system
    def tick(st=ResMut("run_state")):
        st.count = st.count + 1

    @system(host=True)
    def maybe_exit(world):
        import jax
        import numpy as np
        c = int(np.asarray(jax.device_get(
            world.state["res"]["run_state"]["count"])))
        if c >= frames:
            world.send_app_exit() if hasattr(world, "send_app_exit") \
                else setattr(build_app, "_done", True)

    app.add_systems(Update, [tick, maybe_exit])
    return app


def main():
    app = build_app(frames=5)
    for _ in range(5):
        app.update(dt=1 / 60)
    print("app loop returned control to main after 5 frames")


if __name__ == "__main__":
    main()
