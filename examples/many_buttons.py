"""many_buttons stress test (reference twin:
examples/stress_tests/many_buttons.rs — a grid of UI buttons exercises
layout + batching)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import time as pytime

from bevy_tpu import App
from bevy_tpu.input import InputPlugin
from bevy_tpu.render import (
    AtlasBuilder, Camera2d, RenderPlugin, SpritePlugin, TextureAtlas,
)
from bevy_tpu.time import TimePlugin
from bevy_tpu.transform import TransformPlugin, transform_bundle
from bevy_tpu.ui import Style, UiPlugin


def build_app(width=640, height=360, grid=10):
    app = App(capacity=1024)
    atlas = AtlasBuilder(512, 512)
    atlas.add_solid("white")
    ui = UiPlugin(width=width, height=height, atlas_builder=atlas)
    app.add_plugins(TimePlugin(), TransformPlugin(), InputPlugin(),
                    RenderPlugin(width=width, height=height),
                    SpritePlugin(), ui)
    app.world.spawn(Camera2d(), *transform_bundle())
    app.insert_resource(TextureAtlas.RESOURCE, {"data": atlas.build()})
    cell_w, cell_h = width / grid, height / grid
    root = ui.spawn_node(app.world, Style(
        width=width, height=height, flex_direction="row", flex_wrap=True))
    for i in range(grid * grid):
        hue = i / (grid * grid)
        ui.spawn_node(app.world, Style(
            width=cell_w * 0.88, height=cell_h * 0.88,
            margin=cell_w * 0.06, border_radius=4.0,
            background=(0.2 + 0.7 * hue, 0.8 - 0.6 * hue, 0.4, 1.0)),
            parent=root, interactive=True)
    return app


def main():
    app = build_app()
    app.update(dt=1 / 60)          # first frame compiles
    t0 = pytime.perf_counter()
    for _ in range(10):
        app.update(dt=1 / 60)
    print(f"many_buttons: {(pytime.perf_counter() - t0) / 10 * 1000:.1f} "
          "ms/frame (100 interactive nodes)")


if __name__ == "__main__":
    main()
