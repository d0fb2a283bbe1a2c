"""Feathers-style theme chrome (ref model: bevy_feathers tokens +
controls + the Interaction-driven restyle pass)."""

import numpy as np

from bevy_tpu import App
from bevy_tpu.input import InputPlugin, MouseButton
from bevy_tpu.render import Camera2d, RenderPlugin, SpritePlugin
from bevy_tpu.render.sprite import Sprite
from bevy_tpu.time import TimePlugin
from bevy_tpu.transform import TransformPlugin, transform_bundle
from bevy_tpu.ui import Style, UiPlugin
from bevy_tpu.ui_theme import LIGHT_THEME, ThemedControl, ThemePlugin


def _app(w=256, h=128):
    app = App(capacity=64)
    tp = ThemePlugin()
    app.add_plugins(TimePlugin(), TransformPlugin(), InputPlugin(),
                    RenderPlugin(width=w, height=h), SpritePlugin(),
                    UiPlugin(width=w, height=h), tp)
    app.world.spawn(Camera2d(), *transform_bundle())
    return app, tp


def test_themed_button_hover_press_recolor():
    app, tp = _app()
    th = tp.theme
    btn = th.button(app.ui, app.world, width=40.0)
    app.input.move_to(200.0, 120.0)      # away from the root-laid button
    app.update(dt=1 / 60)
    base = np.asarray(app.world.get(btn, Sprite).color)
    np.testing.assert_allclose(base, th.color("button.bg"), atol=1e-5)
    r = app.ui._rects[btn]
    cx, cy = r[0] + r[2] / 2, r[1] + r[3] / 2
    app.input.move_to(cx, cy)
    app.update(dt=1 / 60)
    hov = np.asarray(app.world.get(btn, Sprite).color)
    np.testing.assert_allclose(hov, th.color("button.bg.hover"), atol=1e-5)
    app.input.press_mouse(MouseButton.Left)
    app.update(dt=1 / 60)
    prs = np.asarray(app.world.get(btn, Sprite).color)
    np.testing.assert_allclose(prs, th.color("button.bg.pressed"),
                               atol=1e-5)


def test_disabled_control_dims():
    app, tp = _app()
    btn = tp.theme.button(app.ui, app.world, enabled=False)
    app.input.move_to(200.0, 120.0)
    app.update(dt=1 / 60)
    col = np.asarray(app.world.get(btn, Sprite).color)
    want = np.asarray(app.world.get(btn, ThemedControl).disabled)
    np.testing.assert_allclose(col, want, atol=1e-5)


def test_runtime_theme_switch():
    app, tp = _app()
    btn = tp.theme.button(app.ui, app.world)
    app.input.move_to(200.0, 120.0)
    app.update(dt=1 / 60)
    tp.set_theme(LIGHT_THEME)
    app.update(dt=1 / 60)
    col = np.asarray(app.world.get(btn, Sprite).color)
    np.testing.assert_allclose(col, LIGHT_THEME["button.bg"], atol=1e-5)
