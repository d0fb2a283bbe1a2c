"""Flexbox layout gallery (reference twin: examples/ui/flex_layout.rs —
justify-content x align-items combinations laid out by the native
flexbox solver)."""

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

JUSTIFY = ["start", "center", "end", "space_between"]
ALIGN = ["start", "center", "end"]


def build_app(width=480, height=320) -> App:
    app = App(capacity=256)
    app.add_plugins(TimePlugin(), TransformPlugin(), InputPlugin(),
                    RenderPlugin(width=width, height=height), SpritePlugin(),
                    UiPlugin(width=width, height=height))
    app.world.spawn(Camera2d(), *transform_bundle())
    ui = app.ui
    cw, ch = width // len(JUSTIFY), height // len(ALIGN)
    for gy, align in enumerate(ALIGN):
        for gx, justify in enumerate(JUSTIFY):
            cell = ui.spawn_node(app.world, Style(
                width=cw - 6, height=ch - 6, left=gx * cw + 3,
                top=gy * ch + 3, flex_direction="row",
                justify_content=justify, align_items=align, gap=3,
                padding=3, background=(0.12, 0.13, 0.17, 1.0)))
            for k in range(3):
                ui.spawn_node(app.world, Style(
                    width=14 + 6 * k, height=14 + 6 * k, flex_shrink=0.0,
                    background=(0.9, 0.45 + 0.15 * k, 0.2, 1.0)),
                    parent=cell)
    return app


def main():
    import numpy as np
    from PIL import Image

    from bevy_tpu.render.plugin import frame_image
    app = build_app()
    app.update(dt=1 / 60)
    img = np.asarray(frame_image(app))
    Image.fromarray(img).save("/tmp/ui_flex_layout.png")
    print("saved /tmp/ui_flex_layout.png")


if __name__ == "__main__":
    main()
