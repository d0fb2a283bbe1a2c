"""Dialog / modal / popover / menu overlays + UI event bubbling
(ref models: bevy_ui_widgets src/{dialog,modal,popover,menu}.rs and the
bubbled Pointer events of bevy_picking/src/events.rs)."""

import jax.numpy as jnp
import numpy as np

from bevy_tpu import App, Update
from bevy_tpu.ecs.observer import On
from bevy_tpu.ecs.query import ResMut
from bevy_tpu.ecs.system import system
from bevy_tpu.input import InputPlugin, MouseButton
from bevy_tpu.render import Camera2d, RenderPlugin, SpritePlugin
from bevy_tpu.render.sprite import Sprite
from bevy_tpu.time import TimePlugin
from bevy_tpu.transform import TransformPlugin, transform_bundle
from bevy_tpu.ui import (
    Checked, Style, UiParent, UiPlugin, UiPointerClick,
)

W, H = 320, 240


def _app():
    app = App(capacity=128)
    app.add_plugins(TimePlugin(), TransformPlugin(), InputPlugin(),
                    RenderPlugin(width=W, height=H), SpritePlugin(),
                    UiPlugin(width=W, height=H))
    app.world.spawn(Camera2d(), *transform_bundle())
    return app


def _sprite_color(app, row):
    return np.asarray(app.world.get(row, Sprite).color)


def test_dialog_hidden_until_opened_and_modal_blocks():
    app = _app()
    ui = app.ui
    # a background checkbox the modal must block
    cb = ui.checkbox(app.world, Style(width=20, height=20,
                                      background=(0.5, 0.5, 0.5, 1.0)),
                     checked=False)
    dlg = ui.dialog(app.world, Style(width=100, height=60,
                                     background=(0.2, 0.2, 0.25, 1.0)),
                    modal=True)
    app.update(dt=1 / 60)
    # closed: the panel sprite is fully transparent and inactive
    assert _sprite_color(app, dlg.panel)[3] == 0.0
    # checkbox toggles while the dialog is closed
    r = app.ui._rects[cb]
    app.input.move_to(r[0] + 2, r[1] + 2)
    app.input.press_mouse(MouseButton.Left)
    app.update(dt=1 / 60)
    app.input.release_mouse(MouseButton.Left)
    app.update(dt=1 / 60)
    assert int(np.asarray(app.world.get(cb, Checked).value)) == 1

    dlg.open()
    app.update(dt=1 / 60)
    assert _sprite_color(app, dlg.panel)[3] > 0.0      # visible
    # modal: the same click sequence must NOT toggle the checkbox
    app.input.press_mouse(MouseButton.Left)
    app.update(dt=1 / 60)
    app.input.release_mouse(MouseButton.Left)
    app.update(dt=1 / 60)
    assert int(np.asarray(app.world.get(cb, Checked).value)) == 1

    dlg.close()
    app.update(dt=1 / 60)
    assert _sprite_color(app, dlg.panel)[3] == 0.0
    # unblocked again
    app.input.press_mouse(MouseButton.Left)
    app.update(dt=1 / 60)
    app.input.release_mouse(MouseButton.Left)
    app.update(dt=1 / 60)
    assert int(np.asarray(app.world.get(cb, Checked).value)) == 0


def test_menu_opens_on_anchor_fires_item_closes_outside():
    app = _app()
    ui = app.ui
    fired = []
    anchor = ui.button(app.world, Style(width=80, height=24,
                                        background=(0.3, 0.3, 0.35, 1.0)))
    menu = ui.menu(app.world, anchor,
                   [("new", lambda row: fired.append("new")),
                    ("quit", lambda row: fired.append("quit"))])
    app.update(dt=1 / 60)
    assert not menu.is_open
    # click the anchor → menu opens
    r = app.ui._rects[anchor]
    app.input.move_to(r[0] + 4, r[1] + 4)
    app.input.press_mouse(MouseButton.Left)
    app.update(dt=1 / 60)
    app.input.release_mouse(MouseButton.Left)
    assert menu.is_open
    app.update(dt=1 / 60)
    # click the second item → callback fires, menu closes
    r1 = app.ui._rects[menu.item_rows[1]]
    app.input.move_to(r1[0] + 3, r1[1] + 3)
    app.input.press_mouse(MouseButton.Left)
    app.update(dt=1 / 60)
    app.input.release_mouse(MouseButton.Left)
    assert fired == ["quit"]
    assert not menu.is_open
    app.update(dt=1 / 60)
    # reopen, then click far outside → closes without firing
    app.input.move_to(r[0] + 4, r[1] + 4)
    app.input.press_mouse(MouseButton.Left)
    app.update(dt=1 / 60)
    app.input.release_mouse(MouseButton.Left)
    assert menu.is_open
    app.update(dt=1 / 60)
    app.input.move_to(W - 5, H - 5)
    app.input.press_mouse(MouseButton.Left)
    app.update(dt=1 / 60)
    app.input.release_mouse(MouseButton.Left)
    assert not menu.is_open and fired == ["quit"]


def test_ui_click_bubbles_to_ancestor_observer():
    app = _app()
    ui = app.ui
    panel = ui.spawn_node(app.world, Style(
        width=200, height=120, left=20, top=20, padding=10,
        background=(0.1, 0.1, 0.12, 1.0)))
    inner = ui.spawn_node(app.world, Style(
        width=100, height=60, padding=6,
        background=(0.2, 0.2, 0.22, 1.0)), parent=panel)
    btn = ui.button(app.world, Style(width=60, height=24,
                                     background=(0.4, 0.4, 0.45, 1.0)),
                    parent=inner)
    app.insert_resource("bublog", {"panel": jnp.zeros((), jnp.int32),
                                   "target": jnp.full((), -1, jnp.int32)})

    @system(name="panel_observer")
    def panel_observer(r=ResMut("bublog"),
                       ev=On(UiPointerClick, bubble=True, via=UiParent)):
        fields, mask = ev.read()
        r.panel = r.panel + ev.bubble_mask()[panel].astype(jnp.int32)
        r.target = jnp.where(jnp.any(mask),
                             fields["row"][jnp.argmax(mask)], r.target)

    app.add_systems(Update, panel_observer)
    app.update(dt=1 / 60)
    # click the innermost button: the event targets the button but the
    # observer on the PANEL sees it through UiParent bubbling
    r = app.ui._rects[btn]
    app.input.move_to(r[0] + 2, r[1] + 2)
    app.input.press_mouse(MouseButton.Left)
    app.update(dt=1 / 60)
    log = app.world.resource("bublog")
    assert int(log.target) == btn
    assert int(log.panel) == 1
