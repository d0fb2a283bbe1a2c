"""AccessKit protocol (ref model: accesskit 0.24 TreeUpdate/Node/
ActionRequest shapes + the bidirectional winit adapter loop the
reference's bevy_a11y feeds)."""

import json

import numpy as np

from bevy_tpu import App
from bevy_tpu.a11y import accesskit_update, perform_action, set_access
from bevy_tpu.input import InputPlugin
from bevy_tpu.render import Camera2d, RenderPlugin, SpritePlugin
from bevy_tpu.time import TimePlugin
from bevy_tpu.transform import TransformPlugin, transform_bundle
from bevy_tpu.ui import Checked, SliderValue, Style, UiPlugin


def _ui_app():
    app = App(capacity=64)
    app.add_plugins(TimePlugin(), TransformPlugin(), InputPlugin(),
                    RenderPlugin(width=256, height=128), SpritePlugin(),
                    UiPlugin(width=256, height=128))
    app.world.spawn(Camera2d(), *transform_bundle())
    ui = app.ui
    root = ui.spawn_node(app.world, Style(width=200, height=100,
                                          padding=6, gap=4))
    return app, ui, root


def test_treeupdate_shape_and_focus():
    app, ui, root = _ui_app()
    b = ui.button(app.world, Style(width=80, height=24), parent=root)
    set_access(ui, b, label="Play")
    ui.focused_row = b
    app.update(dt=1 / 60)
    upd = accesskit_update(app)
    # serializable + protocol fields present
    json.dumps(upd)
    assert upd["tree"]["root"] == 0
    assert upd["focus"] == b + 1
    by_id = dict((i, n) for i, n in upd["nodes"])
    win = by_id[0]
    assert win["role"] == "window" and len(win["children"]) == 1
    bn = by_id[b + 1]
    assert bn["role"] == "button" and bn["name"] == "Play"
    assert "click" in bn["actions"] and "bounds" in bn
    assert bn["bounds"]["x1"] > bn["bounds"]["x0"]


def test_inbound_click_toggles_checkbox():
    app, ui, root = _ui_app()
    c = ui.checkbox(app.world, Style(width=20, height=20), parent=root,
                    checked=False)
    app.update(dt=1 / 60)
    assert perform_action(app, c + 1, "click")
    assert int(np.asarray(app.world.get(c, Checked).value)) == 1
    upd = accesskit_update(app)
    by_id = dict((i, n) for i, n in upd["nodes"])
    assert by_id[c + 1]["checked"] == "true"


def test_inbound_setvalue_slider_and_text():
    app, ui, root = _ui_app()
    s = ui.slider(app.world, Style(width=100, height=16), parent=root,
                  value=0.25)
    app.update(dt=1 / 60)
    assert perform_action(app, s + 1, "setValue", 0.75)
    assert abs(float(np.asarray(
        app.world.get(s, SliderValue).value)) - 0.75) < 1e-5
    upd = accesskit_update(app)
    by_id = dict((i, n) for i, n in upd["nodes"])
    assert abs(by_id[s + 1]["numericValue"] - 0.75) < 1e-5
