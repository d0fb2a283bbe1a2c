"""Alter sprite (reference twin: examples/asset/alter_sprite.rs — swap
a sprite's texture region at runtime)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax

from bevy_tpu import App
from bevy_tpu.render import (
    AtlasBuilder, Camera2d, RenderPlugin, SpritePlugin, TextureAtlas,
)
from bevy_tpu.render.sprite import Sprite, sprite_from_handle
from bevy_tpu.time import TimePlugin
from bevy_tpu.transform import TransformPlugin, transform_bundle


def build_app(width=256, height=144):
    app = App(capacity=8)
    app.add_plugins(TimePlugin(), TransformPlugin(),
                    RenderPlugin(width=width, height=height),
                    SpritePlugin())
    app.world.spawn(Camera2d(), *transform_bundle())
    atlas = AtlasBuilder(64, 32)
    a = np.ones((32, 32, 4), np.float32)
    a[..., :3] = (0.9, 0.3, 0.2)
    b = np.ones((32, 32, 4), np.float32)
    b[..., :3] = (0.2, 0.5, 0.9)
    ha = atlas.add(a, "red", srgb=False)
    hb = atlas.add(b, "blue", srgb=False)
    app.insert_resource(TextureAtlas.RESOURCE, {"data": atlas.build()})
    e = app.world.spawn(sprite_from_handle(ha, size=(60.0, 60.0)),
                        *transform_bundle())
    app._sprite = e
    app._handles = (ha, hb)
    return app


def swap_texture(app, which):
    h = app._handles[which]
    app.world.set_field(app._sprite, Sprite, "uv_min",
                        np.asarray(h["uv_min"], np.float32))
    app.world.set_field(app._sprite, Sprite, "uv_max",
                        np.asarray(h["uv_max"], np.float32))


def main():
    from bevy_tpu.render.plugin import frame_image
    app = build_app()
    app.update(dt=1 / 60)
    before = frame_image(app)[72, 128].tolist()
    swap_texture(app, 1)
    app.update(dt=1 / 60)
    after = frame_image(app)[72, 128].tolist()
    print(f"center pixel before={before} after={after} (red -> blue)")


if __name__ == "__main__":
    main()
