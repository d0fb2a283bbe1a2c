"""Fallible systems (reference twin: examples/ecs/error_handling.rs +
fallible_params — systems returning Result route through the app error
handler; here host systems raise and the configured handler decides)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bevy_tpu import App, Update
from bevy_tpu.ecs.system import system
from bevy_tpu.time import TimePlugin


def build_app(handler="warn"):
    app = App(capacity=4)
    app.add_plugins(TimePlugin())
    app.set_error_handler(handler)
    state = {"ticks": 0, "recovered": 0}

    @system(host=True)
    def sometimes_fails(world):
        state["ticks"] += 1
        if state["ticks"] % 3 == 0:
            raise RuntimeError("every third frame fails")

    @system(host=True)
    def keeps_running(world):
        state["recovered"] += 1

    app.add_systems(Update, [sometimes_fails, keeps_running])
    app._demo_state = state
    return app


def main():
    app = build_app(handler="warn")      # ref: warn handler
    for _ in range(6):
        app.update(dt=1 / 60)
    s = app._demo_state
    print(f"ticks={s['ticks']} later-system-ran={s['recovered']} "
          "(failures did not stop the schedule)")


if __name__ == "__main__":
    main()
