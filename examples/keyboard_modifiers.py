"""Keyboard modifiers (reference twin:
examples/input/keyboard_modifiers.rs — detect Ctrl+Shift+A style chords
from the ButtonInput pressed set, with just_pressed edge detection)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax.numpy as jnp

from bevy_tpu import App, Res, ResMut, Update
from bevy_tpu.ecs.component import field, resource
from bevy_tpu.ecs.system import system
from bevy_tpu.input import InputPlugin, KeyCode
from bevy_tpu.time import TimePlugin


@resource
class Chords:
    saves = field((), jnp.int32)         # Ctrl+S edges
    shouts = field((), jnp.int32)        # Shift+A edges


def build_app():
    app = App(capacity=4)
    app.add_plugins(TimePlugin(), InputPlugin())
    app.insert_resource(Chords())

    @system
    def chords(kb=Res("keyboard"), c=ResMut(Chords)):
        ctrl = kb.pressed[KeyCode.ControlLeft] | \
            kb.pressed[KeyCode.ControlRight]
        shift = kb.pressed[KeyCode.ShiftLeft] | \
            kb.pressed[KeyCode.ShiftRight]
        c.saves = c.saves + (ctrl & kb.just_pressed[KeyCode.KeyS]
                             ).astype(jnp.int32)
        c.shouts = c.shouts + (shift & kb.just_pressed[KeyCode.KeyA]
                               ).astype(jnp.int32)

    app.add_systems(Update, chords)
    return app


if __name__ == "__main__":
    app = build_app()
    # scripted input: hold ctrl, tap S twice; then shift+A once
    app.input.press(KeyCode.ControlLeft)
    for _ in range(2):
        app.input.press(KeyCode.KeyS)
        app.update(dt=1 / 60)
        app.input.release(KeyCode.KeyS)
        app.update(dt=1 / 60)
    app.input.release(KeyCode.ControlLeft)
    app.input.press(KeyCode.ShiftLeft)
    app.input.press(KeyCode.KeyA)
    app.update(dt=1 / 60)
    c = app.world.resource(Chords)
    print(f"ctrl+s saves: {int(c.saves)}  shift+a shouts: {int(c.shouts)}")
