"""Tilemap chunk (reference twin: examples/2d/tilemap_chunk.rs — a grid
of tiles drawn as one chunk, with tile indices edited at runtime inside
the jitted frame)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax.numpy as jnp

from bevy_tpu import App, Res, ResMut, Update
from bevy_tpu.ecs.system import system
from bevy_tpu.render import Camera2d, RenderPlugin, SpritePlugin
from bevy_tpu.render.texture import AtlasBuilder, TextureAtlas
from bevy_tpu.render.tilemap import TilemapChunk, TilemapPlugin
from bevy_tpu.time import Time, TimePlugin
from bevy_tpu.transform import TransformPlugin, transform_bundle


def build_app(width=320, height=180):
    app = App(capacity=16)
    builder = AtlasBuilder(64, 64)
    # 4x1 sheet: grass, water, sand, rock
    img = np.zeros((16, 64, 4), np.float32)
    for i, c in enumerate([(0.2, 0.7, 0.2), (0.2, 0.4, 0.9),
                           (0.9, 0.8, 0.4), (0.5, 0.5, 0.5)]):
        img[:, 16 * i:16 * (i + 1)] = (*c, 1.0)
    sheet = builder.add(img, srgb=False)

    rng = np.random.RandomState(0)
    tiles = rng.randint(0, 4, (10, 18)).tolist()
    tm = TilemapPlugin()
    tm.add_chunk(TilemapChunk(tiles, sheet, sheet_cols=4, sheet_rows=1,
                              tile_size=16.0, origin=(-144.0, -80.0)))
    app.add_plugins(TimePlugin(), TransformPlugin(),
                    RenderPlugin(width=width, height=height),
                    SpritePlugin(), tm)
    app.insert_resource(TextureAtlas.RESOURCE, {"data": builder.build()})
    app.world.spawn(Camera2d(), *transform_bundle())
    original = jnp.asarray(tiles)

    @system
    def tide(chunk=ResMut("tilemap0"), time=Res(Time)):
        # water floods the sand tiles and recedes — runtime tile edits
        flood = (time.elapsed % 2.0) < 1.0
        chunk.tiles = jnp.where((original == 2) & flood, 1, original)

    app.add_systems(Update, tide)
    return app


if __name__ == "__main__":
    from bevy_tpu.render.plugin import frame_image

    app = build_app()
    for _ in range(10):
        app.update(dt=1 / 60)
    img = np.asarray(frame_image(app))
    print("tilemap frame", img.shape, "distinct colors:",
          len(np.unique(img.reshape(-1, 4), axis=0)))
