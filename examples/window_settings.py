"""Window settings (reference twin: examples/window/window_settings.rs
— runtime window/present configuration; headless form: render size,
supersampling and frame pacing are the configurable surface)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

from bevy_tpu import App
from bevy_tpu.render import Camera2d, RenderPlugin, SpritePlugin
from bevy_tpu.render.plugin import ClearColor
from bevy_tpu.time import TimePlugin
from bevy_tpu.transform import TransformPlugin, transform_bundle


def build_app(width=256, height=144, ssaa=1):
    app = App(capacity=4)
    app.add_plugins(TimePlugin(), TransformPlugin(),
                    RenderPlugin(width=width, height=height, ssaa=ssaa),
                    SpritePlugin())
    app.insert_resource(ClearColor(color=(0.2, 0.1, 0.3, 1.0)))
    app.world.spawn(Camera2d(), *transform_bundle())
    return app


def main():
    from bevy_tpu.render.plugin import frame_image
    # "resize" = rebuild with a new size (static framebuffer shape is
    # the one retrace trigger; ref: WindowResized)
    for w, h, ss in ((256, 144, 1), (192, 108, 1), (128, 72, 2)):
        app = build_app(w, h, ss)
        app.update(dt=1 / 60)
        img = frame_image(app)
        print(f"window {w}x{h} ssaa={ss}: frame {img.shape}")


if __name__ == "__main__":
    main()
