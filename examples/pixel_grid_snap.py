"""Pixel-perfect grid snap (reference twin:
examples/2d/pixel_grid_snap.rs — render low-res pixel art to an
off-screen target and upscale; here the low-res camera scale + a
nearest-upscale in the viewer do the same, with positions snapped to
whole texels in Update)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax.numpy as jnp

from bevy_tpu import App, Query, Res, Update, With
from bevy_tpu.ecs.component import component
from bevy_tpu.ecs.system import system
from bevy_tpu.render import (
    AtlasBuilder, Camera2d, RenderPlugin, SpritePlugin, TextureAtlas,
)
from bevy_tpu.render.sprite import sprite_from_handle
from bevy_tpu.time import Time, TimePlugin
from bevy_tpu.transform import Transform, TransformPlugin, transform_bundle


@component
class Bouncer:
    pass


def build_app(width=160, height=90):
    # low-res target: every world unit is exactly one texel
    app = App(capacity=8)
    app.add_plugins(TimePlugin(), TransformPlugin(),
                    RenderPlugin(width=width, height=height),
                    SpritePlugin(bilinear=False)
                    if "bilinear" in SpritePlugin.__init__.__code__.co_varnames
                    else SpritePlugin())
    app.world.spawn(Camera2d(), *transform_bundle())
    atlas = AtlasBuilder(16, 16)
    img = np.zeros((16, 16, 4), np.float32)
    img[2:14, 2:14] = (0.95, 0.6, 0.2, 1.0)
    img[5:8, 5:8] = (0.1, 0.1, 0.2, 1.0)
    h = atlas.add(img, "pix", srgb=False)
    app.insert_resource(TextureAtlas.RESOURCE, {"data": atlas.build()})
    app.world.spawn(sprite_from_handle(h), Bouncer(), *transform_bundle())

    @system
    def snap_move(q=Query(Transform, With(Bouncer)), time=Res(Time)):
        t = time.elapsed
        x = 40.0 * jnp.sin(t * 1.7)
        y = 20.0 * jnp.cos(t * 2.3)
        # SNAP to whole texels — the pixel-grid rule
        q.transform.translation = q.transform.translation.at[:, :2].set(
            jnp.stack([jnp.round(x)[None], jnp.round(y)[None]], -1))

    app.add_systems(Update, snap_move)
    return app


if __name__ == "__main__":
    from bevy_tpu.render.plugin import frame_image
    app = build_app()
    for _ in range(10):
        app.update(dt=1 / 60)
    img = frame_image(app)
    # nearest-upscale x4 for display (the upscaling pass of the ref)
    up = np.repeat(np.repeat(img, 4, 0), 4, 1)
    np.save("/tmp/pixel_grid_snap.npy", up)
    print("saved /tmp/pixel_grid_snap.npy", up.shape)
