"""Overflow clipping + scrolling (reference twin: examples/ui/overflow.rs
+ ui/scroll.rs — children larger than their container are clipped, and a
scroll area pans its content with the wheel)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bevy_tpu import App
from bevy_tpu.input import InputPlugin
from bevy_tpu.render import Camera2d, RenderPlugin, SpritePlugin
from bevy_tpu.time import TimePlugin
from bevy_tpu.transform import TransformPlugin, transform_bundle
from bevy_tpu.ui import Style, UiPlugin


def build_app(width=480, height=320) -> App:
    app = App(capacity=256)
    app.add_plugins(TimePlugin(), TransformPlugin(), InputPlugin(),
                    RenderPlugin(width=width, height=height), SpritePlugin(),
                    UiPlugin(width=width, height=height))
    app.world.spawn(Camera2d(), *transform_bundle())
    ui = app.ui

    # left: an oversized child clipped by its container (overflow.rs)
    clip_box = ui.spawn_node(app.world, Style(
        width=120, height=120, left=20, top=30, padding=6,
        background=(0.15, 0.16, 0.2, 1.0), overflow="clip"))
    ui.spawn_node(app.world, Style(
        width=220, height=220, flex_shrink=0.0,
        background=(0.85, 0.35, 0.2, 1.0)), parent=clip_box)

    # middle: same child, no clipping — it spills out
    spill_box = ui.spawn_node(app.world, Style(
        width=120, height=120, left=180, top=30, padding=6,
        background=(0.15, 0.16, 0.2, 1.0)))
    ui.spawn_node(app.world, Style(
        width=160, height=160, flex_shrink=0.0,
        background=(0.2, 0.55, 0.85, 1.0)), parent=spill_box)

    # right: a scroll area with a tall stack of rows (scroll.rs)
    area = ui.scroll_area(app.world, Style(
        width=120, height=200, left=340, top=30,
        background=(0.1, 0.1, 0.12, 1.0)))
    for i in range(12):
        ui.spawn_node(app.world, Style(
            width=104, height=26, flex_shrink=0.0,
            background=(0.25 + 0.05 * i, 0.6 - 0.03 * i, 0.4, 1.0)),
            parent=area)
    app._area = area
    return app


def main():
    import numpy as np
    from PIL import Image

    from bevy_tpu.render.plugin import frame_image
    app = build_app()
    app.update(dt=1 / 60)
    # wheel-scroll over the area, then render again
    app.input.move_to(400.0, 120.0)
    app.input.wheel(0.0, -3.0)
    app.update(dt=1 / 60)
    img = np.asarray(frame_image(app))
    Image.fromarray(img).save("/tmp/ui_overflow_scroll.png")
    print("saved /tmp/ui_overflow_scroll.png")


if __name__ == "__main__":
    main()
