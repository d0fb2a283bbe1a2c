"""Logging (reference twins: examples/app/logs.rs + log_layers.rs — the
LogPlugin with EnvFilter directives, per-module levels, and `once`
variants that fire a single time from a hot loop)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bevy_tpu import App, Update
from bevy_tpu.ecs.system import system
from bevy_tpu.log import LogPlugin
from bevy_tpu.time import TimePlugin


def build_app():
    app = App(capacity=4)
    # directive string: default info, but one chatty module capped to warn
    app.add_plugins(TimePlugin(),
                    LogPlugin(filter="info,physics=warn", timestamps=False))
    log = app.logger

    @system(host=True)
    def chatty():
        log.info("game", "frame tick")                 # passes (info)
        log.debug("game", "debug detail")              # filtered out
        log.info("physics", "solver chatter")          # filtered (warn cap)
        log.warn("physics", "solver diverged")         # passes
        log.info_once("game", "printed exactly once")  # once! semantics

    app.add_systems(Update, chatty)
    return app


if __name__ == "__main__":
    app = build_app()
    for _ in range(3):
        app.update(dt=1 / 60)
