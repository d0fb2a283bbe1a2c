"""Sprite flipping + scaling + atlas cells in one scene (reference
twins: examples/2d/sprite_flipping.rs, sprite_scale.rs,
texture_atlas.rs — flip booleans swap the uv rect; scale comes from
Transform.scale; cells address one atlas region each)."""

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


def _arrow(fs=24):
    """An asymmetric glyph so flips are visible."""
    img = np.zeros((fs, fs, 4), np.float32)
    for r in range(fs):
        img[r, : max(1, r // 2), :] = (0.2, 0.8, 1.0, 1.0)
    return img


def build_app(width=320, height=180):
    app = App(capacity=16)
    app.add_plugins(TimePlugin(), TransformPlugin(),
                    RenderPlugin(width=width, height=height), SpritePlugin())
    app.world.spawn(Camera2d(), *transform_bundle())
    atlas = AtlasBuilder(64, 32)
    a = atlas.add(_arrow(), "arrow", srgb=False)
    b = atlas.add(np.full((16, 16, 4), (1.0, 0.8, 0.2, 1.0), np.float32),
                  "chip", srgb=False)
    app.insert_resource(TextureAtlas.RESOURCE, {"data": atlas.build()})

    # plain / flip_x / flip_y (ref: sprite_flipping.rs)
    for i, (fx, fy) in enumerate([(False, False), (True, False),
                                  (False, True)]):
        app.world.spawn(
            sprite_from_handle(a, size=(40.0, 40.0), flip_x=fx, flip_y=fy),
            *transform_bundle(translation=(-100.0 + 70.0 * i, 45.0, 0.0)))
    # scaled by Transform.scale (ref: sprite_scale.rs)
    for i, s in enumerate([0.5, 1.0, 2.0]):
        app.world.spawn(
            sprite_from_handle(b),
            *transform_bundle(translation=(-100.0 + 70.0 * i, -45.0, 0.0),
                              scale=(s, s, 1.0)))
    return app


if __name__ == "__main__":
    from bevy_tpu.render.plugin import frame_image

    app = build_app()
    app.update(dt=1 / 60)
    img = frame_image(app)
    print("rendered", img.shape, "nonzero px:",
          int((np.asarray(img)[..., :3].sum(-1) > 10).sum()))
