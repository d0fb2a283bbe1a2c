"""Input tour (reference twins: examples/input/keyboard_input.rs,
mouse_input.rs, gamepad_input.rs, touch_input.rs — a paddle driven by
keyboard, mouse wheel, gamepad stick and touch in one Update system,
with just_pressed edge detection)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from bevy_tpu import App, Query, Res, ResMut, Update, With
from bevy_tpu.ecs.component import component, field, resource
from bevy_tpu.ecs.system import system
from bevy_tpu.input import InputPlugin, KeyCode, MouseButton
from bevy_tpu.time import TimePlugin
from bevy_tpu.transform import Transform, TransformPlugin, transform_bundle


@component
class Paddle:
    pass


@resource
class Counters:
    jumps = field((), jnp.int32)        # space just_pressed edges
    clicks = field((), jnp.int32)


def build_app():
    app = App(capacity=16)
    app.add_plugins(TimePlugin(), TransformPlugin(), InputPlugin())
    app.insert_resource(Counters())
    app.world.spawn(Paddle(), *transform_bundle())

    @system
    def drive(q=Query(Transform, With(Paddle)), kb=Res("keyboard"),
              mouse=Res("mouse"), pad=Res("gamepad"), time=Res("time"),
              c=ResMut(Counters)):
        dt = time.delta
        dx = (kb.pressed[KeyCode.ArrowRight].astype(jnp.float32) -
              kb.pressed[KeyCode.ArrowLeft].astype(jnp.float32))
        dx = dx + pad.axes[0]                      # left stick x
        dy = mouse.scroll[1]                       # wheel scrubs vertically
        t = q.transform.translation
        q.transform.translation = t.at[:, 0].add(300.0 * dx * dt) \
                                   .at[:, 1].add(40.0 * dy * dt)
        c.jumps = c.jumps + kb.just_pressed[KeyCode.Space].astype(jnp.int32)
        c.clicks = c.clicks + \
            mouse.just_pressed[MouseButton.Left].astype(jnp.int32)

    app.add_systems(Update, drive)
    return app



def demo():
    app = build_app()
    # hold right arrow for 30 frames
    app.input.press(KeyCode.ArrowRight)
    for _ in range(30):
        app.update(dt=1 / 60)
    app.input.release(KeyCode.ArrowRight)
    # tap space twice (edges must count exactly 2)
    for _ in range(2):
        app.input.press(KeyCode.Space)
        app.update(dt=1 / 60)
        app.input.release(KeyCode.Space)
        app.update(dt=1 / 60)
    # gamepad stick left for 30 frames
    app.input.set_axis(0, -1.0)
    for _ in range(30):
        app.update(dt=1 / 60)
    app.input.set_axis(0, 0.0)
    # one click
    app.input.press_mouse(MouseButton.Left)
    app.update(dt=1 / 60)
    app.input.release_mouse(MouseButton.Left)
    app.update(dt=1 / 60)

    x = float(jax.device_get(
        app.world.column(Transform, "translation")[0, 0]))
    c = app.world.state["res"]["counters"]
    jumps = int(jax.device_get(c["jumps"]))
    clicks = int(jax.device_get(c["clicks"]))
    print(f"paddle x {x:.1f} (right then stick-left ≈ 0), "
          f"jumps {jumps}, clicks {clicks}")
    return x, jumps, clicks


if __name__ == "__main__":
    demo()
