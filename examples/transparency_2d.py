"""2D transparency (reference twin: examples/2d/transparency_2d.rs —
overlapping semi-transparent sprites blend back-to-front by z)."""

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


def build_app(width=320, height=180):
    app = App(capacity=8)
    app.add_plugins(TimePlugin(), TransformPlugin(),
                    RenderPlugin(width=width, height=height),
                    SpritePlugin())
    app.world.spawn(Camera2d(), *transform_bundle())
    atlas = AtlasBuilder(48, 48)
    yy, xx = np.mgrid[0:48, 0:48]
    disc = np.ones((48, 48, 4), np.float32)
    disc[..., 3] = (np.hypot(xx - 23.5, yy - 23.5) <= 23).astype(np.float32)
    h = atlas.add(disc, "disc", srgb=False)
    app.insert_resource(TextureAtlas.RESOURCE, {"data": atlas.build()})
    # three overlapping discs at alpha 1.0 / 0.7 / 0.3, z stacked
    for i, (x, a) in enumerate([(-40.0, 1.0), (0.0, 0.7), (40.0, 0.3)]):
        col = [(0.9, 0.2, 0.2), (0.2, 0.9, 0.2), (0.2, 0.4, 0.9)][i]
        app.world.spawn(
            sprite_from_handle(h, color=(*col, a), size=(90.0, 90.0)),
            *transform_bundle(translation=(x, 0.0, float(i))))
    return app


if __name__ == "__main__":
    import numpy as _np

    from bevy_tpu.render.plugin import frame_image
    app = build_app()
    app.update(dt=1 / 60)
    _np.save("/tmp/transparency_2d.npy", frame_image(app))
    print("saved /tmp/transparency_2d.npy")
