"""Texture atlas (reference twin: examples/2d/texture_atlas.rs — many
images packed into one atlas, each drawn from its sub-rect; the packer
is the TextureAtlasBuilder twin in render/texture.py)."""

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


def build_app(width=480, height=270):
    app = App(capacity=64)
    app.add_plugins(TimePlugin(), TransformPlugin(),
                    RenderPlugin(width=width, height=height),
                    SpritePlugin())
    app.world.spawn(Camera2d(), *transform_bundle())
    atlas = AtlasBuilder(256, 256)
    rng = np.random.default_rng(3)
    handles = []
    for i in range(24):                  # varied sizes exercise shelves
        s = int(rng.integers(12, 40))
        img = np.ones((s, s, 4), np.float32)
        img[..., :3] = rng.random(3)
        yy, xx = np.mgrid[0:s, 0:s]
        img[..., 3] = (np.hypot(xx - s / 2, yy - s / 2) <= s / 2
                       ).astype(np.float32)
        handles.append(atlas.add(img, f"chip{i}", srgb=False))
    app.insert_resource(TextureAtlas.RESOURCE, {"data": atlas.build()})
    for i, h in enumerate(handles):
        x = (i % 6 - 2.5) * 70.0
        y = (i // 6 - 1.5) * 60.0
        app.world.spawn(sprite_from_handle(h),
                        *transform_bundle(translation=(x, y, 0.0)))
    return app


if __name__ == "__main__":
    import numpy as _np

    from bevy_tpu.render.plugin import frame_image
    app = build_app()
    app.update(dt=1 / 60)
    _np.save("/tmp/texture_atlas.npy", frame_image(app))
    print("saved /tmp/texture_atlas.npy")
