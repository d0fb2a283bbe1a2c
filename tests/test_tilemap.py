"""Tilemap chunks (ref model: bevy_sprite_render tilemap_chunk — grid
of tile indices drawn as one chunk; editable in-jit)."""

import numpy as np

from bevy_tpu import App, Update
from bevy_tpu.ecs.system import system
from bevy_tpu.render import Camera2d, RenderPlugin, SpritePlugin
from bevy_tpu.render.plugin import frame_image
from bevy_tpu.render.texture import AtlasBuilder, TextureAtlas
from bevy_tpu.render.tilemap import TilemapChunk, TilemapPlugin
from bevy_tpu.time import TimePlugin
from bevy_tpu.transform import TransformPlugin, transform_bundle


def _sheet(builder):
    # 2x1 sheet: tile 0 red, tile 1 green
    img = np.zeros((16, 32, 4), np.float32)
    img[:, :16] = (1.0, 0.0, 0.0, 1.0)
    img[:, 16:] = (0.0, 1.0, 0.0, 1.0)
    return builder.add(img, srgb=False)


def _app(tiles):
    app = App(capacity=32)
    builder = AtlasBuilder(128, 128)
    sheet = _sheet(builder)
    tm = TilemapPlugin()
    tm.add_chunk(TilemapChunk(tiles, sheet, sheet_cols=2, sheet_rows=1,
                              tile_size=20.0, origin=(-40.0, -20.0)))
    app.add_plugins(TimePlugin(), TransformPlugin(),
                    RenderPlugin(width=160, height=96), SpritePlugin(), tm)
    app.insert_resource(TextureAtlas.RESOURCE, {"data": builder.build()})
    app.world.spawn(Camera2d(), *transform_bundle())
    return app


def test_tilemap_renders_grid():
    tiles = [[0, 1, 0, 1],
             [1, -1, 1, 0]]          # row 0 = top; -1 = hole
    app = _app(tiles)
    app.update(dt=1 / 60)
    img = frame_image(app).astype(int)

    def world_px(wx, wy):
        return img[int(96 / 2 - wy), int(wx + 160 / 2)]

    # top-left cell (tile 0 = red) centered at (-30, 10)
    c = world_px(-30, 10)
    assert c[0] > c[1] + 60, c
    # its right neighbor green
    c = world_px(-10, 10)
    assert c[1] > c[0] + 60, c
    # the hole shows the clear color (equal-ish channels)
    c = world_px(-10, -10)
    assert abs(int(c[0]) - int(c[1])) < 30, c


def test_tilemap_edits_in_jit():
    tiles = [[0, 0], [0, 0]]
    app = _app(tiles)

    from bevy_tpu.ecs.query import ResMut

    @system(name="flip2")
    def flip2(tm=ResMut("tilemap0")):
        import jax.numpy as jnp
        tm.tiles = jnp.ones_like(tm.tiles)

    app.add_systems(Update, flip2)
    app.update(dt=1 / 60)
    app.update(dt=1 / 60)
    img = frame_image(app).astype(int)
    c = img[int(96 / 2 - 10), int(-30 + 80)]
    assert c[1] > c[0] + 60, c                 # became green
