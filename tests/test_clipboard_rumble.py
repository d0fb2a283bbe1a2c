"""Clipboard + gamepad rumble (ref models: bevy_clipboard resource,
bevy_gilrs GamepadRumbleRequest)."""

from bevy_tpu.clipboard import Clipboard


def test_clipboard_roundtrip():
    cb = Clipboard(use_system=False)
    cb.set_text("hello")
    assert cb.get_text() == "hello"


def test_text_input_paste():
    from bevy_tpu import App
    from bevy_tpu.clipboard import ClipboardPlugin
    from bevy_tpu.input import InputPlugin, KeyCode, MouseButton
    from bevy_tpu.render import Camera2d, RenderPlugin, SpritePlugin
    from bevy_tpu.render.text import FontAtlas
    from bevy_tpu.render.texture import AtlasBuilder, TextureAtlas
    from bevy_tpu.time import TimePlugin
    from bevy_tpu.transform import TransformPlugin, transform_bundle
    from bevy_tpu.ui import Style, UiPlugin

    app = App(capacity=128)
    builder = AtlasBuilder(512, 512)
    font = FontAtlas(builder)
    app.add_plugins(TimePlugin(), TransformPlugin(), InputPlugin(),
                    RenderPlugin(width=256, height=128), SpritePlugin(),
                    UiPlugin(width=256, height=128),
                    ClipboardPlugin(use_system=False))
    app.insert_resource(TextureAtlas.RESOURCE, {"data": builder.build()})
    app.world.spawn(Camera2d(), *transform_bundle())
    app.ui.text_input(app.world, Style(width=180, height=20, left=10,
                                       top=10), font)
    app.update(dt=1 / 60)
    app.clipboard.set_text("pasted")
    # click to focus, then Ctrl+V
    app.input.move_to(50.0, 20.0)
    app.input.press_mouse(MouseButton.Left)
    app.update(dt=1 / 60)
    app.input.release_mouse(MouseButton.Left)
    app.update(dt=1 / 60)
    app.input.press(KeyCode.ControlLeft)
    app.input.press(KeyCode.KeyV)
    app.update(dt=1 / 60)
    app.input.release(KeyCode.KeyV)
    app.input.release(KeyCode.ControlLeft)
    app.update(dt=1 / 60)
    assert app.ui._text_inputs[0]["value"] == "pasted"


def test_rumble_queued():
    from bevy_tpu.input import InputState
    s = InputState()
    s.rumble(0.8, 0.5)
    assert s.pending_rumble == [
        {"gamepad": 0, "strength": 0.8, "duration": 0.5}]
