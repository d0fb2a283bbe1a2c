"""Sprite-sheet animation (reference twin: examples/2d/sprite_sheet.rs —
a grid atlas cycled by a timer via AtlasAnimation)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

from bevy_tpu import App, Update
from bevy_tpu.render import RenderPlugin
from bevy_tpu.render.camera import Camera2d
from bevy_tpu.render.sprite import (
    AtlasAnimation, Sprite, SpritePlugin, make_atlas_animation_system,
    sprite_from_handle,
)
from bevy_tpu.time import TimePlugin
from bevy_tpu.transform import TransformPlugin, transform_bundle


def _make_sheet(frames=6, fs=16):
    """A procedural walk-cycle sheet: a dot bouncing across each cell."""
    img = np.zeros((fs, fs * frames, 4), np.uint8)
    for f in range(frames):
        cx = fs * f + 3 + (fs - 6) * f // max(frames - 1, 1)
        cy = fs // 2 + int(4 * np.sin(f / frames * 2 * np.pi))
        img[max(cy - 2, 0):cy + 3, max(cx - 2, 0):cx + 3] = \
            (255, 200, 60, 255)
    return img


def build_app(width=320, height=180):
    app = App(capacity=32)
    plugin = SpritePlugin()
    app.add_plugins(TimePlugin(), TransformPlugin(),
                    RenderPlugin(width=width, height=height), plugin)
    app.world.spawn(Camera2d(), *transform_bundle())
    from bevy_tpu.render.texture import AtlasBuilder, TextureAtlas
    builder = AtlasBuilder(128, 16)
    sheet = _make_sheet()
    handle = builder.add(sheet)
    frames = [builder.grid(handle, cols=6, rows=1, index=i)
              for i in range(6)]
    app.insert_resource(TextureAtlas.RESOURCE, {"data": builder.build()})
    app.world.spawn(sprite_from_handle(frames[0], size=(64.0, 64.0)),
                    AtlasAnimation(fps=12.0, first=0, count=6),
                    *transform_bundle())
    app.add_systems(Update, make_atlas_animation_system(frames))
    return app


if __name__ == "__main__":
    from bevy_tpu.render.plugin import frame_image

    app = build_app()
    for _ in range(10):
        app.update(dt=1 / 60)
    np.save("/tmp/sprite_sheet_frame.npy", frame_image(app))
    print("saved /tmp/sprite_sheet_frame.npy")
