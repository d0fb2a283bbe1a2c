"""Context menu (reference twin: examples/usage/context_menu.rs — a
right-click popover with actionable entries, built from the headless
widget set)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

from bevy_tpu import App
from bevy_tpu.input import InputPlugin, MouseButton
from bevy_tpu.render import (
    AtlasBuilder, Camera2d, RenderPlugin, SpritePlugin, TextureAtlas,
)
from bevy_tpu.time import TimePlugin
from bevy_tpu.transform import TransformPlugin, transform_bundle
from bevy_tpu.ui import Style, UiPlugin


def build_app(width=320, height=180):
    app = App(capacity=64)
    atlas = AtlasBuilder(256, 256)
    atlas.add_solid("white")
    ui = UiPlugin(width=width, height=height, atlas_builder=atlas)
    app.add_plugins(TimePlugin(), TransformPlugin(), InputPlugin(),
                    RenderPlugin(width=width, height=height),
                    SpritePlugin(), ui)
    app.world.spawn(Camera2d(), *transform_bundle())
    app.insert_resource(TextureAtlas.RESOURCE, {"data": atlas.build()})
    app._menu_nodes = []
    app._ui = ui
    return app


def open_menu(app, x, y):
    """Spawn the popover at the click position (ref: the observer that
    spawns the menu on Pointer<SecondaryClick>)."""
    close_menu(app)
    ui = app._ui
    panel = ui.spawn_node(app.world, Style(
        left=x, top=y, width=90, height=66, padding=4, gap=3,
        background=(0.16, 0.16, 0.2, 0.97), border=1.0,
        border_color=(0.4, 0.4, 0.5, 1.0)))
    rows = [panel]
    for label, col in (("copy", (0.25, 0.3, 0.38, 1.0)),
                       ("paste", (0.25, 0.3, 0.38, 1.0)),
                       ("delete", (0.45, 0.2, 0.2, 1.0))):
        rows.append(ui.spawn_node(app.world, Style(
            height=16, background=col), parent=panel, interactive=True))
    app._menu_nodes = rows


def close_menu(app):
    for n in app._menu_nodes:
        app.world.despawn(n) if hasattr(app.world, "despawn") else None
    app._menu_nodes = []


def main():
    from bevy_tpu.render.plugin import frame_image
    app = build_app()
    app.update(dt=1 / 60)
    before = frame_image(app).astype(int)
    # right-click opens the menu
    app.input.press_mouse(MouseButton.Right)
    app.input.move_to(140.0, 60.0)
    open_menu(app, 140, 60)
    app.update(dt=1 / 60)
    after = frame_image(app).astype(int)
    changed = (np.abs(after - before).max(-1) > 10).mean()
    print(f"menu opened: {changed * 100:.1f}% of pixels changed")


if __name__ == "__main__":
    main()
