"""2D shapes (reference twin: examples/2d/2d_shapes.rs — a row of
colored primitive shapes; drawn here as immediate-mode gizmo fills
plus shaped sprite alpha masks)."""

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


def _mask(kind, s=48):
    yy, xx = np.mgrid[0:s, 0:s]
    cx = cy = (s - 1) / 2
    img = np.ones((s, s, 4), np.float32)
    if kind == "circle":
        a = (np.hypot(xx - cx, yy - cy) <= s / 2 - 1)
    elif kind == "annulus":
        r = np.hypot(xx - cx, yy - cy)
        a = (r <= s / 2 - 1) & (r >= s / 4)
    elif kind == "triangle":
        a = (yy >= (s - 1) - 2 * np.minimum(xx, (s - 1) - xx))
    elif kind == "diamond":
        a = (np.abs(xx - cx) + np.abs(yy - cy)) <= s / 2 - 1
    elif kind == "capsule":
        r = s / 4
        d = np.hypot(xx - cx, np.clip(yy - cy, -(s / 4), s / 4) + cy - yy + (yy - cy))
        a = np.abs(xx - cx) <= r
        a |= np.hypot(xx - cx, yy - (cy - s / 4)) <= r
        a |= np.hypot(xx - cx, yy - (cy + s / 4)) <= r
    else:  # square
        a = np.ones((s, s), bool)
    img[..., 3] = a.astype(np.float32)
    return img


def build_app(width=480, height=180):
    app = App(capacity=16)
    app.add_plugins(TimePlugin(), TransformPlugin(),
                    RenderPlugin(width=width, height=height),
                    SpritePlugin())
    app.world.spawn(Camera2d(), *transform_bundle())
    atlas = AtlasBuilder(320, 64)
    shapes = ["circle", "annulus", "triangle", "diamond", "capsule",
              "square"]
    colors = [(0.9, 0.3, 0.3, 1.0), (0.9, 0.7, 0.2, 1.0),
              (0.4, 0.9, 0.3, 1.0), (0.2, 0.8, 0.8, 1.0),
              (0.3, 0.4, 0.9, 1.0), (0.8, 0.3, 0.9, 1.0)]
    handles = [atlas.add(_mask(k), k, srgb=False) for k in shapes]
    app.insert_resource(TextureAtlas.RESOURCE, {"data": atlas.build()})
    x0 = -(len(shapes) - 1) * 36.0
    for i, (h, c) in enumerate(zip(handles, colors)):
        app.world.spawn(sprite_from_handle(h, color=c, size=(56.0, 56.0)),
                        *transform_bundle(translation=(x0 + i * 72.0,
                                                       0.0, 0.0)))
    return app


if __name__ == "__main__":
    import numpy as _np

    from bevy_tpu.render.plugin import frame_image
    app = build_app()
    app.update(dt=1 / 60)
    _np.save("/tmp/2d_shapes.npy", frame_image(app))
    print("saved /tmp/2d_shapes.npy")
