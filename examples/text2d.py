"""2D text (reference twin: examples/2d/text2d.rs — bitmap glyph
sprites, wrapping box, justify modes)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

from bevy_tpu import App
from bevy_tpu.render import RenderPlugin
from bevy_tpu.render.camera import Camera2d
from bevy_tpu.render.sprite import SpritePlugin
from bevy_tpu.render.text import FontAtlas, spawn_text
from bevy_tpu.render.texture import AtlasBuilder, TextureAtlas
from bevy_tpu.time import TimePlugin
from bevy_tpu.transform import TransformPlugin, transform_bundle


def build_app(width=480, height=270):
    app = App(capacity=512)
    app.add_plugins(TimePlugin(), TransformPlugin(),
                    RenderPlugin(width=width, height=height),
                    SpritePlugin())
    app.world.spawn(Camera2d(), *transform_bundle())
    builder = AtlasBuilder(512, 256)
    font = FontAtlas(builder)
    spawn_text(app.world, font, "bevy_tpu text2d",
               pos=(-110.0, 110.0), color=(1.0, 0.9, 0.3, 1.0), size=12)
    spawn_text(app.world, font,
               "wrapped paragraph: the quick brown fox jumps over the "
               "lazy dog, again and again and again",
               pos=(-200.0, 60.0), max_width=180.0,
               color=(0.8, 0.9, 1.0, 1.0))
    spawn_text(app.world, font, "right justified\nacross lines",
               pos=(40.0, 60.0), max_width=160.0, justify="right",
               color=(0.6, 1.0, 0.6, 1.0))
    spawn_text(app.world, font, "centered\ntitle block",
               pos=(-80.0, -40.0), max_width=160.0, justify="center",
               color=(1.0, 0.6, 0.6, 1.0))
    app.insert_resource(TextureAtlas.RESOURCE, {"data": builder.build()})
    return app


if __name__ == "__main__":
    from bevy_tpu.render.plugin import frame_image

    app = build_app()
    app.update(dt=1 / 60)
    np.save("/tmp/text2d_frame.npy", frame_image(app))
    print("saved /tmp/text2d_frame.npy")
