"""Repeated texture fill (reference twins:
examples/asset/repeated_texture.rs + 2d/sprite_tile.rs — a small image
tiles at its natural size to fill a larger rect, edge tiles cropped)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

from bevy_tpu import App
from bevy_tpu.render import (
    AtlasBuilder, Camera2d, RenderPlugin, SpritePlugin, TextureAtlas,
)
from bevy_tpu.render.sprite import spawn_tiled
from bevy_tpu.time import TimePlugin
from bevy_tpu.transform import TransformPlugin, transform_bundle


def build_app(width=320, height=180):
    app = App(capacity=256)
    app.add_plugins(TimePlugin(), TransformPlugin(),
                    RenderPlugin(width=width, height=height), SpritePlugin())
    app.world.spawn(Camera2d(), *transform_bundle())
    atlas = AtlasBuilder(32, 32)
    # a 16x16 checker tile
    img = np.zeros((16, 16, 4), np.float32)
    img[:8, :8] = img[8:, 8:] = (0.9, 0.7, 0.2, 1.0)
    img[:8, 8:] = img[8:, :8] = (0.3, 0.2, 0.6, 1.0)
    h = atlas.add(img, "checker", srgb=False)
    app.insert_resource(TextureAtlas.RESOURCE, {"data": atlas.build()})
    rows = spawn_tiled(app.world, h, size=(200.0, 120.0))
    print(f"tiled fill spawned {len(rows)} tile sprites")
    return app


if __name__ == "__main__":
    from bevy_tpu.render.plugin import frame_image

    app = build_app()
    app.update(dt=1 / 60)
    img = np.asarray(frame_image(app))
    print("frame", img.shape)
