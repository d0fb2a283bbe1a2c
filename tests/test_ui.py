"""UI tests (ref models: bevy_ui layout + focus/Interaction tests)."""

import numpy as np

from bevy_tpu import App
from bevy_tpu.input import InputPlugin, MouseButton
from bevy_tpu.render import Camera2d, RenderPlugin, SpritePlugin
from bevy_tpu.render.plugin import frame_image
from bevy_tpu.time import TimePlugin
from bevy_tpu.transform import TransformPlugin, transform_bundle
from bevy_tpu.ui import Interaction, Style, UiNode, UiPlugin


def _app(w=256, h=128):
    app = App(capacity=64)
    app.add_plugins(TimePlugin(), TransformPlugin(), InputPlugin(),
                    RenderPlugin(width=w, height=h), SpritePlugin(),
                    UiPlugin(width=w, height=h))
    app.world.spawn(Camera2d(), *transform_bundle())
    return app


def test_column_layout_and_render():
    app = _app()
    ui = app.ui
    panel = ui.spawn_node(app.world, Style(
        width=80, height=100, left=10, top=10, padding=6, gap=4,
        flex_direction="column", background=(0.2, 0.2, 0.25, 1.0)))
    ui.spawn_node(app.world, Style(width=60, height=20,
                                   background=(1.0, 0.1, 0.1, 1.0)), panel)
    ui.spawn_node(app.world, Style(width=60, height=20,
                                   background=(0.1, 1.0, 0.1, 1.0)), panel)
    app.update(dt=1 / 60)
    img = frame_image(app)
    # first child occupies (16..76, 16..36) screen px — sample its center
    px1 = img[26, 46]
    assert px1[0] > px1[1] + 40, f"first child not red: {px1}"
    # second child 4px gap below: (16..76, 40..60)
    px2 = img[50, 46]
    assert px2[1] > px2[0] + 40, f"second child not green: {px2}"
    # panel background visible in padding area
    pxp = img[12, 46]
    assert abs(int(pxp[0]) - int(pxp[1])) < 20, f"panel bg wrong: {pxp}"


def test_interaction_hover_and_press():
    app = _app()
    ui = app.ui
    btn = ui.button(app.world, Style(width=40, height=20, left=100, top=50,
                                     background=(0.3, 0.3, 0.8, 1.0)))
    app.update(dt=1 / 60)
    assert int(app.world.get(btn, Interaction).state) == 0

    app.input.move_to(120.0, 60.0)  # inside the button
    app.update(dt=1 / 60)
    assert int(app.world.get(btn, Interaction).state) == 1  # hovered

    app.input.press_mouse(MouseButton.Left)
    app.update(dt=1 / 60)
    assert int(app.world.get(btn, Interaction).state) == 2  # pressed

    app.input.release_mouse(MouseButton.Left)
    app.input.move_to(5.0, 5.0)     # away
    app.update(dt=1 / 60)
    assert int(app.world.get(btn, Interaction).state) == 0
