"""Text input widget + focus (ref models: bevy_input_focus — click/tab
focus; bevy_ui_widgets text input — keystroke editing, submit)."""

import numpy as np

from bevy_tpu import App
from bevy_tpu.input import InputPlugin, KeyCode, MouseButton
from bevy_tpu.render import Camera2d, RenderPlugin, SpritePlugin
from bevy_tpu.render.plugin import frame_image
from bevy_tpu.render.text import FontAtlas
from bevy_tpu.render.texture import AtlasBuilder, TextureAtlas
from bevy_tpu.time import TimePlugin
from bevy_tpu.transform import TransformPlugin, transform_bundle
from bevy_tpu.ui import Style, UiPlugin


def _app():
    app = App(capacity=128)
    builder = AtlasBuilder(512, 512)
    font = FontAtlas(builder)
    app.add_plugins(TimePlugin(), TransformPlugin(), InputPlugin(),
                    RenderPlugin(width=256, height=128), SpritePlugin(),
                    UiPlugin(width=256, height=128))
    app.insert_resource(TextureAtlas.RESOURCE, {"data": builder.build()})
    app.world.spawn(Camera2d(), *transform_bundle())
    return app, font


def _press(app, key):
    app.input.press(key)
    app.update(dt=1 / 60)
    app.input.release(key)
    app.update(dt=1 / 60)


def test_typing_updates_value_and_submit():
    app, font = _app()
    got = []
    ti = app.ui.text_input(app.world, Style(width=180, height=20, left=10,
                                            top=10,
                                            background=(0.1, 0.1, 0.1, 1)),
                           font, on_submit=got.append)
    app.update(dt=1 / 60)
    # click to focus
    app.input.move_to(50.0, 20.0)
    app.input.press_mouse(MouseButton.Left)
    app.update(dt=1 / 60)
    app.input.release_mouse(MouseButton.Left)
    app.update(dt=1 / 60)
    assert app.ui.focus == 0
    _press(app, KeyCode.KeyH)
    _press(app, KeyCode.KeyI)
    assert app.ui._text_inputs[0]["value"] == "hi"
    _press(app, KeyCode.Backspace)
    _press(app, KeyCode.ShiftLeft)  # held shift alone types nothing
    app.input.press(KeyCode.ShiftLeft)
    app.input.press(KeyCode.KeyA)
    app.update(dt=1 / 60)
    app.input.release(KeyCode.KeyA)
    app.input.release(KeyCode.ShiftLeft)
    app.update(dt=1 / 60)
    assert app.ui._text_inputs[0]["value"] == "hA"
    _press(app, KeyCode.Enter)
    assert got == ["hA"]


def test_glyphs_render_and_tab_focus():
    app, font = _app()
    app.ui.text_input(app.world, Style(width=180, height=20, left=10,
                                       top=10,
                                       background=(0.05, 0.05, 0.05, 1)),
                      font, text="abc")
    app.ui.text_input(app.world, Style(width=180, height=20, left=10,
                                       top=40,
                                       background=(0.05, 0.05, 0.05, 1)),
                      font, text="")
    app.update(dt=1 / 60)
    img0 = frame_image(app).astype(int)
    # glyph pixels present inside the first input rect
    band = img0[10:30, 10:190]
    assert (band.max(-1) > 60).sum() > 20
    # tab cycles focus 0 → 1
    _press(app, KeyCode.Tab)
    assert app.ui.focus == 0
    _press(app, KeyCode.Tab)
    assert app.ui.focus == 1
