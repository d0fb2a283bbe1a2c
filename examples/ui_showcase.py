"""UI widget showcase (reference twins: examples/ui/* + the feathers
widget gallery — themed panel with buttons, checkbox, radio group,
slider, scroll area and a text input over the native flexbox solver)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bevy_tpu import App
from bevy_tpu.input import InputPlugin
from bevy_tpu.render import Camera2d, RenderPlugin, SpritePlugin
from bevy_tpu.render.plugin import frame_image
from bevy_tpu.render.text import FontAtlas
from bevy_tpu.render.texture import AtlasBuilder, TextureAtlas
from bevy_tpu.time import TimePlugin
from bevy_tpu.transform import TransformPlugin, transform_bundle
from bevy_tpu.ui import Style, UiPlugin
from bevy_tpu.ui_theme import Theme


def build_app(width=480, height=320) -> App:
    app = App(capacity=256)
    builder = AtlasBuilder(512, 512)
    font = FontAtlas(builder)
    app.add_plugins(TimePlugin(), TransformPlugin(), InputPlugin(),
                    RenderPlugin(width=width, height=height), SpritePlugin(),
                    UiPlugin(width=width, height=height,
                             atlas_builder=builder))
    app.insert_resource(TextureAtlas.RESOURCE, {"data": builder.build()})
    app.world.spawn(Camera2d(), *transform_bundle())
    ui, th = app.ui, Theme()
    panel = ui.spawn_node(app.world, Style(
        width=220, height=290, left=12, top=12, padding=10, gap=8,
        background=th.color("panel.bg")))
    th.button(ui, app.world, parent=panel, primary=True)
    th.button(ui, app.world, parent=panel)
    row = ui.spawn_node(app.world, Style(
        width=190, height=20, flex_direction="row", gap=8), parent=panel)
    th.checkbox(ui, app.world, parent=row, checked=True)
    for k in range(3):
        ui.radio(app.world, Style(width=16, height=16,
                                  background=th.color("checkbox.bg")),
                 group=1, parent=row, checked=(k == 0))
    th.slider(ui, app.world, parent=panel, value=0.66)
    th.text_input(ui, app.world, font, parent=panel, text="hello tpu")
    area = ui.scroll_area(app.world, Style(
        width=190, height=90, background=th.color("input.bg")),
        parent=panel)
    for i in range(7):
        ui.spawn_node(app.world, Style(
            width=170, height=22, flex_shrink=0.0,
            background=(0.2 + 0.08 * i, 0.35, 0.55, 1.0)), parent=area)
    # grid demo on the right (fr tracks + span)
    grid = ui.spawn_node(app.world, Style(
        width=210, height=150, left=250, top=12, display="grid",
        grid_cols=[(60, 1), (1.0, 3), (1.0, 3)],
        grid_rows=[(46, 1), (46, 1), (46, 1)], gap=4, padding=4,
        background=th.color("panel.bg")))
    for i in range(8):
        ui.spawn_node(app.world, Style(
            background=(0.3 + 0.07 * i, 0.5, 0.4, 1.0),
            grid_col_span=2 if i == 3 else 1), parent=grid)

    # menu + modal dialog (ref: ui_widgets menu.rs/dialog.rs): "File"
    # button opens a menu; "about…" opens a modal that blocks the rest
    # of the UI until dismissed
    dlg = th.dialog(ui, app.world, modal=True)
    ui.spawn_node(app.world, Style(width=180, height=24,
                                   background=th.color("button.primary.bg")),
                  parent=dlg.panel)
    close_btn = ui.button(app.world, Style(
        width=70, height=22, background=th.color("button.bg")),
        parent=dlg.panel)
    ui.on_activate[close_btn] = lambda row: dlg.close()
    menu_btn = th.button(ui, app.world, parent=panel)
    th.menu(ui, app.world, menu_btn,
            [("about", lambda row: dlg.open()),
             ("noop", None)])

    # observer on an ANCESTOR: any click inside the left panel (buttons,
    # checkbox, menu anchor…) bubbles up the UiParent chain to `panel`
    # (ref: bubbled Pointer events + observer Traversal)
    import jax.numpy as jnp

    from bevy_tpu.ecs.observer import On
    from bevy_tpu.ecs.query import ResMut
    from bevy_tpu.ecs.system import system
    from bevy_tpu.ui import UiParent, UiPointerClick

    app.insert_resource("panel_clicks", {"count": jnp.zeros((), jnp.int32)})

    @system(name="panel_click_counter")
    def panel_click_counter(r=ResMut("panel_clicks"),
                            ev=On(UiPointerClick, bubble=True,
                                  via=UiParent)):
        r.count = r.count + ev.bubble_mask()[panel].astype(jnp.int32)

    from bevy_tpu import Update
    app.add_systems(Update, panel_click_counter)
    app._showcase = {"dialog": dlg, "panel": panel, "menu_btn": menu_btn}
    return app


def main():
    import numpy as np
    from PIL import Image

    app = build_app()
    app.update(dt=1 / 60)
    Image.fromarray(np.asarray(frame_image(app))).save("/tmp/ui_showcase.png")
    # drive the menu → modal flow headlessly
    from bevy_tpu.input import MouseButton
    r = app.ui._rects[app._showcase["menu_btn"]]
    app.input.move_to(r[0] + 4, r[1] + 4)
    app.input.press_mouse(MouseButton.Left)
    app.update(dt=1 / 60)
    app.input.release_mouse(MouseButton.Left)
    app.update(dt=1 / 60)
    Image.fromarray(np.asarray(frame_image(app))).save(
        "/tmp/ui_showcase_menu.png")
    dlg = app._showcase["dialog"]
    dlg.open()
    app.update(dt=1 / 60)
    Image.fromarray(np.asarray(frame_image(app))).save(
        "/tmp/ui_showcase_modal.png")
    clicks = int(app.world.resource("panel_clicks").count)
    print(f"ui_showcase: rendered → /tmp/ui_showcase*.png; "
          f"panel saw {clicks} bubbled click(s)")


if __name__ == "__main__":
    main()
