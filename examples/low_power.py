"""Low-power update modes (reference twin:
examples/window/low_power.rs — Continuous vs Reactive update: the app
only steps when something changed, saving battery/cycles)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bevy_tpu import App, Update
from bevy_tpu.ecs.system import system
from bevy_tpu.time import TimePlugin


def build_app():
    app = App(capacity=4)
    app.add_plugins(TimePlugin())
    ticks = {"n": 0}

    @system(host=True)
    def count(world):
        ticks["n"] += 1

    app.add_systems(Update, count)
    app._ticks = ticks
    return app


def main():
    app = build_app()
    # the reactive runner: only update when events arrive (ref:
    # UpdateMode::Reactive { wait })
    events = [True, False, False, True, False, True, False, False]
    for has_event in events:
        if has_event:                 # skip idle frames entirely
            app.update(dt=1 / 30)
    print(f"reactive mode ran {app._ticks['n']} updates for "
          f"{len(events)} wakeups (continuous would run all "
          f"{len(events)})")


if __name__ == "__main__":
    main()
