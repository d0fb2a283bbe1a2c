"""Screenshot (reference twin: examples/window/screenshot.rs — save the
frame to disk on demand; frame_image is the screenshot position of
bevy_render/src/view/window/screenshot.rs:83)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

from bevy_tpu import App
from bevy_tpu.render import (
    AtlasBuilder, Camera2d, RenderPlugin, SpritePlugin, TextureAtlas,
)
from bevy_tpu.render.sprite import sprite_from_handle
from bevy_tpu.time import TimePlugin
from bevy_tpu.transform import TransformPlugin, transform_bundle


def build_app(width=256, height=144):
    app = App(capacity=8)
    app.add_plugins(TimePlugin(), TransformPlugin(),
                    RenderPlugin(width=width, height=height),
                    SpritePlugin())
    app.world.spawn(Camera2d(), *transform_bundle())
    atlas = AtlasBuilder(32, 32)
    img = np.ones((32, 32, 4), np.float32)
    img[..., :3] = (0.9, 0.5, 0.1)
    h = atlas.add(img, "subject", srgb=False)
    app.insert_resource(TextureAtlas.RESOURCE, {"data": atlas.build()})
    app.world.spawn(sprite_from_handle(h, size=(64.0, 64.0)),
                    *transform_bundle())
    return app


def take_screenshot(app, path="/tmp/screenshot.png"):
    from bevy_tpu.render.plugin import frame_image
    img = frame_image(app)
    try:
        from PIL import Image
        Image.fromarray(np.asarray(img[..., :3], np.uint8)).save(path)
    except ImportError:
        path = path.replace(".png", ".npy")
        np.save(path, img)
    return path


if __name__ == "__main__":
    app = build_app()
    app.update(dt=1 / 60)
    out = take_screenshot(app)
    print("saved", out)
