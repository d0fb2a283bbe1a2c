"""Text input widget (reference twin: examples/ui/text_input.rs — a
focused input field driven by keystrokes, with editing, submit callback
and a second field reachable by Tab focus navigation)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bevy_tpu import App
from bevy_tpu.input import InputPlugin, KeyCode, MouseButton
from bevy_tpu.render import Camera2d, RenderPlugin, SpritePlugin
from bevy_tpu.render.text import FontAtlas
from bevy_tpu.render.texture import AtlasBuilder, TextureAtlas
from bevy_tpu.time import TimePlugin
from bevy_tpu.transform import TransformPlugin, transform_bundle
from bevy_tpu.ui import Style, UiPlugin


def build_app(width=320, height=160):
    app = App(capacity=128)
    builder = AtlasBuilder(512, 512)
    font = FontAtlas(builder)
    app.add_plugins(TimePlugin(), TransformPlugin(), InputPlugin(),
                    RenderPlugin(width=width, height=height), SpritePlugin(),
                    UiPlugin(width=width, height=height,
                             atlas_builder=builder))
    app.insert_resource(TextureAtlas.RESOURCE, {"data": builder.build()})
    app.world.spawn(Camera2d(), *transform_bundle())
    submitted = []
    app.ui.text_input(app.world, Style(
        width=200, height=22, left=20, top=20,
        background=(0.12, 0.12, 0.14, 1.0)), font,
        text="name", on_submit=submitted.append)
    app.ui.text_input(app.world, Style(
        width=200, height=22, left=20, top=60,
        background=(0.12, 0.12, 0.14, 1.0)), font,
        on_submit=submitted.append)
    app._submitted = submitted
    app._font = font
    return app


def demo():
    app = build_app()
    app.update(dt=1 / 60)

    def press(key):
        app.input.press(key)
        app.update(dt=1 / 60)
        app.input.release(key)
        app.update(dt=1 / 60)

    # click the first field, select-all-backspace, type "tpu", submit
    app.input.move_to(60.0, 30.0)
    app.input.press_mouse(MouseButton.Left)
    app.update(dt=1 / 60)
    app.input.release_mouse(MouseButton.Left)
    app.update(dt=1 / 60)
    for k in (KeyCode.KeyT, KeyCode.KeyP, KeyCode.KeyU, KeyCode.Enter):
        press(k)
    # Tab moves focus to the second field (ref: bevy_input_focus tab nav)
    press(KeyCode.Tab)
    press(KeyCode.KeyO)
    press(KeyCode.KeyK)
    v0 = app.ui._text_inputs[0]["value"]
    v1 = app.ui._text_inputs[1]["value"]
    print(f"field0={v0!r} field1={v1!r} submitted={app._submitted}")
    return v0, v1, app._submitted


if __name__ == "__main__":
    demo()
