"""Virtual time control (reference twin: examples/time/virtual_time.rs
— pausing and speeding up Time<Virtual> while real time keeps flowing)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

from bevy_tpu import App
from bevy_tpu.time import TimePlugin


def build_app():
    app = App(capacity=8)
    app.add_plugins(TimePlugin())
    return app


def demo():
    app = build_app()
    res = app.world.state["res"]

    def virt_elapsed():
        return float(jax.device_get(
            app.world.state["res"]["time_virtual"]["elapsed"]))

    def real_elapsed():
        return float(jax.device_get(
            app.world.state["res"]["time_real"]["elapsed"]))

    for _ in range(30):
        app.update(dt=1 / 30)
    print("1x     real %.2f virtual %.2f" % (real_elapsed(),
                                             virt_elapsed()))
    # 4x speed (ref: Time<Virtual>::set_relative_speed)
    app.world.set_resource_field("time_virtual", "relative_speed", 4.0)
    for _ in range(30):
        app.update(dt=1 / 30)
    print("4x     real %.2f virtual %.2f" % (real_elapsed(),
                                             virt_elapsed()))
    # paused (ref: Time<Virtual>::pause)
    app.world.set_resource_field("time_virtual", "relative_speed", 1.0)
    app.world.set_resource_field("time_virtual", "paused", True)
    for _ in range(30):
        app.update(dt=1 / 30)
    print("paused real %.2f virtual %.2f" % (real_elapsed(),
                                             virt_elapsed()))
    return real_elapsed(), virt_elapsed()


if __name__ == "__main__":
    demo()
