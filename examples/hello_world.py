"""Hello world (reference twin: examples/hello_world.rs — the minimal
app: one system, one update)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bevy_tpu import App, Update
from bevy_tpu.ecs.system import system


def build_app():
    app = App(capacity=1)

    @system(host=True)
    def hello():
        print("hello world!")

    app.add_systems(Update, hello)
    return app


if __name__ == "__main__":
    build_app().update(dt=1 / 60)
