"""Custom runner loop (reference twin: examples/app/custom_loop.rs —
replace the runner: the host drives app.update() itself, reading
'input' lines from a script)."""

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
    log = []

    @system(host=True)
    def echo(world):
        line = world.state_host.get("line", "") if hasattr(
            world, "state_host") else app._line
        log.append(line)

    app.add_systems(Update, echo)
    app._log = log
    app._line = ""
    return app


def main():
    app = build_app()
    # the custom loop: each 'input' drives exactly one update
    for line in ["hello", "from", "a", "custom", "runner"]:
        app._line = line
        app.update(dt=1 / 60)
    print("processed:", " ".join(app._log))


if __name__ == "__main__":
    main()
