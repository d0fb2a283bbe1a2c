"""CPU-side drawing into a live texture (reference twin:
examples/2d/cpu_draw.rs — paint pixels on the CPU each frame and
upload; here the host paints a numpy canvas and swaps it into the
sprite atlas resource between frames)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax.numpy as jnp

from bevy_tpu import App
from bevy_tpu.render import (
    AtlasBuilder, Camera2d, RenderPlugin, SpritePlugin, TextureAtlas,
)
from bevy_tpu.render.sprite import sprite_from_handle
from bevy_tpu.time import TimePlugin
from bevy_tpu.transform import TransformPlugin, transform_bundle

SIZE = 64


def paint(canvas, t):
    """Host-side painting (the cpu_draw random-walk painter, made
    deterministic): a rose curve traced point by point."""
    k = 5
    ang = t * 2.0
    r = (SIZE / 2 - 2) * np.cos(k * ang)
    x = int(SIZE / 2 + r * np.cos(ang))
    y = int(SIZE / 2 + r * np.sin(ang))
    canvas[max(y - 1, 0):y + 1, max(x - 1, 0):x + 1] = \
        (0.9, 0.6 + 0.4 * np.sin(t), 0.2, 1.0)
    return canvas


def build_app(width=256, height=144):
    app = App(capacity=8)
    app.add_plugins(TimePlugin(), TransformPlugin(),
                    RenderPlugin(width=width, height=height),
                    SpritePlugin())
    app.world.spawn(Camera2d(), *transform_bundle())
    atlas = AtlasBuilder(SIZE, SIZE)
    canvas = np.zeros((SIZE, SIZE, 4), np.float32)
    canvas[..., 3] = 1.0
    handle = atlas.add(canvas, "canvas", srgb=False)
    app.insert_resource(TextureAtlas.RESOURCE, {"data": atlas.build()})
    app.world.spawn(sprite_from_handle(handle, size=(120.0, 120.0)),
                    *transform_bundle())
    app._cpu_canvas = canvas
    app._cpu_handle = handle
    app._cpu_atlas = atlas
    return app


def tick(app, t):
    """One frame: paint on the host, re-upload the atlas, update (the
    reference's Image asset mutation -> GPU re-upload)."""
    paint(app._cpu_canvas, t)
    a = app._cpu_atlas
    a.data[0:SIZE, 0:SIZE] = app._cpu_canvas   # canvas packed at (0, 0)
    app.world.state["res"][TextureAtlas.RESOURCE]["data"] = \
        jnp.asarray(a.build())
    app.update(dt=1 / 60)


if __name__ == "__main__":
    app = build_app()
    for f in range(30):
        tick(app, f / 30 * np.pi)
    from bevy_tpu.render.plugin import frame_image
    np.save("/tmp/cpu_draw.npy", frame_image(app))
    print("saved /tmp/cpu_draw.npy")
