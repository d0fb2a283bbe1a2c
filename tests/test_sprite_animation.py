"""Sprite-sheet animation test (ref model: bevy sprite_sheet example)."""

import numpy as np

from bevy_tpu import App, Update
from bevy_tpu.render import (
    AtlasBuilder, Camera2d, RenderPlugin, Sprite, SpritePlugin, TextureAtlas,
)
from bevy_tpu.render.plugin import frame_image
from bevy_tpu.render.sprite import AtlasAnimation, make_atlas_animation_system
from bevy_tpu.time import TimePlugin
from bevy_tpu.transform import TransformPlugin, transform_bundle


def test_atlas_animation_cycles_frames():
    builder = AtlasBuilder(64, 32)
    sheet = np.zeros((16, 32, 4), np.float32)
    sheet[:, :16] = [1.0, 0.0, 0.0, 1.0]    # frame 0: red
    sheet[:, 16:] = [0.0, 1.0, 0.0, 1.0]    # frame 1: green
    handle = builder.add(sheet, "sheet", srgb=False)
    frames = [builder.grid(handle, 2, 1, i) for i in range(2)]

    app = App(capacity=16)
    app.add_plugins(TimePlugin(), TransformPlugin(),
                    RenderPlugin(width=64, height=32), SpritePlugin())
    app.insert_resource(TextureAtlas.RESOURCE, {"data": builder.build()})
    app.add_systems(Update, make_atlas_animation_system(frames))
    app.world.spawn(Camera2d(), *transform_bundle())
    app.world.spawn(Sprite(size=(16.0, 16.0)),
                    AtlasAnimation(fps=10.0, first=0, count=2),
                    *transform_bundle())

    app.update(dt=1 / 60)
    c0 = frame_image(app)[16, 32]
    assert c0[0] > c0[1] + 40, f"frame 0 not red: {c0}"
    # advance past one frame period (0.1 s at 10 fps)
    for _ in range(8):
        app.update(dt=1 / 60)
    c1 = frame_image(app)[16, 32]
    assert c1[1] > c1[0] + 40, f"frame 1 not green: {c1}"
    # wraps back to frame 0
    for _ in range(6):
        app.update(dt=1 / 60)
    c2 = frame_image(app)[16, 32]
    assert c2[0] > c2[1] + 40, f"did not wrap: {c2}"
