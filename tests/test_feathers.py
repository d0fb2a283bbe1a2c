"""Feathers-depth theme system (VERDICT r2 #9; ref:
bevy_feathers/src/controls/*, tokens.rs, cursor.rs, focus.rs): compound
themed controls — toggle switch knob, slider fill, scrollbar thumb —
plus focus ring, cursor feedback and light/dark switching."""

import numpy as np

from bevy_tpu import App
from bevy_tpu.input import InputPlugin, KeyCode, MouseButton
from bevy_tpu.render import Camera2d, RenderPlugin, SpritePlugin
from bevy_tpu.render.sprite import Sprite
from bevy_tpu.time import TimePlugin
from bevy_tpu.transform import Transform, TransformPlugin, transform_bundle
from bevy_tpu.ui import Checked, SliderValue, Style, UiPlugin
from bevy_tpu.ui_theme import LIGHT_THEME, Theme, ThemePlugin


def _app(theme=None):
    app = App(capacity=256)
    tp = ThemePlugin(theme)
    app.add_plugins(TimePlugin(), TransformPlugin(), InputPlugin(),
                    RenderPlugin(width=320, height=240), SpritePlugin(),
                    UiPlugin(width=320, height=240), tp)
    app.world.spawn(Camera2d(), *transform_bundle())
    return app, tp


def test_toggle_switch_knob_slides():
    app, tp = _app()
    th = app.theme
    sw = th.toggle_switch(app.ui, app.world, parent=None)
    app.update(dt=1 / 60)
    knob_row = app.ui._chrome_knobs[0][0]
    x_off = float(np.asarray(
        app.world.get(knob_row, Transform).translation)[0])
    # click the switch (it lays out at the root's top-left)
    r = app.ui._rects[sw]
    app.input.move_to(r[0] + 4, r[1] + 4)
    app.update(dt=1 / 60)                     # hover frame
    app.input.press_mouse(MouseButton.Left)
    app.update(dt=1 / 60)
    app.input.release_mouse(MouseButton.Left)
    app.update(dt=1 / 60)
    assert int(app.world.get(sw, Checked).value) == 1
    app.update(dt=1 / 60)
    x_on = float(np.asarray(
        app.world.get(knob_row, Transform).translation)[0])
    assert x_on > x_off + 8.0, (x_off, x_on)


def test_slider_fill_tracks_value():
    app, tp = _app()
    th = app.theme
    sl = th.slider(app.ui, app.world, width=120.0, value=0.25)
    app.update(dt=1 / 60)
    fill_row = app.ui._chrome_fills[0][0]
    w_quarter = float(np.asarray(
        app.world.get(fill_row, Sprite).size)[0])
    app.world.set_field(sl, SliderValue, "value", 0.75)
    app.update(dt=1 / 60)
    w_three = float(np.asarray(
        app.world.get(fill_row, Sprite).size)[0])
    assert abs(w_quarter - 30.0) < 2.0 and abs(w_three - 90.0) < 2.0


def test_focus_ring_and_cursor_feedback():
    app, tp = _app()
    th = app.theme
    b = th.button(app.ui, app.world)
    app.update(dt=1 / 60)
    ring = app.ui._focus_ring
    assert float(np.asarray(
        app.world.get(ring, Sprite).color)[3]) == 0.0  # nothing focused
    # directional nav focuses the button → ring lights up around it
    # (ref: auto_directional_navigation; Tab cycles text inputs)
    app.input.press(KeyCode.ArrowDown)
    app.update(dt=1 / 60)
    app.input.release(KeyCode.ArrowDown)
    app.update(dt=1 / 60)
    assert float(np.asarray(
        app.world.get(ring, Sprite).color)[3]) > 0.5
    # cursor feedback: hovering the button reports "pointer"
    r = app.ui._rects[b]
    app.input.move_to(r[0] + 2, r[1] + 2)
    app.update(dt=1 / 60)
    assert app.cursor_icon == "pointer"
    app.input.move_to(310.0, 230.0)
    app.update(dt=1 / 60)
    assert app.cursor_icon == "default"


def test_theme_switch_recolors():
    app, tp = _app()
    th = app.theme
    b = th.button(app.ui, app.world)
    app.update(dt=1 / 60)
    import jax
    dark = np.asarray(jax.device_get(
        app.world.get(b, Sprite).color))
    tp.set_theme(LIGHT_THEME)
    app.update(dt=1 / 60)
    light = np.asarray(jax.device_get(
        app.world.get(b, Sprite).color))
    assert light[:3].sum() > dark[:3].sum() + 0.5
