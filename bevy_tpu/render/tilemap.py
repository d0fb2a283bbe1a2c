"""Tilemap chunk renderer (reference twin: bevy_sprite_render's
`tilemap_chunk/` — a grid of tile indices rendered as one chunk draw
instead of per-tile sprites).

TPU form: the whole chunk is ONE XLA image pass — each framebuffer
pixel inside the chunk's rect derives its cell from the camera-relative
position, looks up the tile index from the (rows, cols) grid, and
samples the tile atlas. Cost is O(screen), independent of tile count —
the chunk-draw property the reference gets from instanced quads.
Tile indices live in a device array, so animating/editing tiles is a
plain in-jit resource write (no structural change)."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from bevy_tpu.app.main_schedule import Render
from bevy_tpu.app.plugin import Plugin
from bevy_tpu.ecs.query import Query, Read, Res, ResMut
from bevy_tpu.ecs.system import system
from bevy_tpu.render.camera import Camera2d, pick_camera
from bevy_tpu.render.plugin import OVERLAY_SET, RenderTarget
from bevy_tpu.render.texture import TextureAtlas
from bevy_tpu.transform import GlobalTransform


class TilemapChunk:
    """Host descriptor: a (rows, cols) int grid of tile ids (-1 = empty)
    into a `sheet` atlas handle laid out `sheet_cols` x `sheet_rows`."""

    def __init__(self, tiles, sheet, sheet_cols, sheet_rows,
                 tile_size=16.0, origin=(0.0, 0.0), z=5.0):
        self.tiles = np.asarray(tiles, np.int32)
        self.sheet = sheet
        self.sheet_cols = int(sheet_cols)
        self.sheet_rows = int(sheet_rows)
        self.tile_size = float(tile_size)
        self.origin = origin          # world position of the chunk's
        self.z = z                    # bottom-left corner


class TilemapPlugin(Plugin):
    """ref: TilemapChunkPlugin. Chunks register at build; their tile
    grids become resources editable in-jit ("tilemap<i>")."""

    def __init__(self, chunks=None):
        self.chunks = list(chunks or [])

    def add_chunk(self, chunk: TilemapChunk):
        self.chunks.append(chunk)
        return len(self.chunks) - 1

    def build(self, app):
        for i, ch in enumerate(self.chunks):
            app.insert_resource(f"tilemap{i}",
                                {"tiles": jnp.asarray(ch.tiles)})
        from bevy_tpu.render.plugin import RenderPlugin
        rp = next(p for p in app._plugins
                  if type(p).__name__ == "RenderPlugin")
        width, height = rp.width, rp.height
        chunks = self.chunks

        def make_pass(idx, ch):
            u0, v0 = ch.sheet["uv_min"]
            u1, v1 = ch.sheet["uv_max"]
            du = (u1 - u0) / ch.sheet_cols
            dv = (v1 - v0) / ch.sheet_rows
            rows_n, cols_n = ch.tiles.shape
            sheet_cols = ch.sheet_cols
            ts = ch.tile_size
            ox, oy = ch.origin
            zc = ch.z

            @system(name=f"tilemap_pass_{idx}")
            def tilemap_chunk_pass(target=ResMut(RenderTarget.RESOURCE),
                                   cam=Query(Read(Camera2d),
                                             Read(GlobalTransform)),
                                   atlas=Res(TextureAtlas.RESOURCE),
                                   tm=Res(f"tilemap{idx}")):
                from bevy_tpu.ops.raster3d_visbuf import sample_atlas

                c = target.color
                _, h, w = c.shape
                ci, has_cam = pick_camera(cam.mask)
                cpos = cam.global_transform.translation[ci]
                # world x/y per pixel (1 unit = 1 px, centered camera)
                wx = (jnp.arange(w, dtype=jnp.float32)[None, :] - w / 2 +
                      0.5 + cpos[0])
                wy = (h / 2 - jnp.arange(h, dtype=jnp.float32)[:, None] -
                      0.5 + cpos[1])
                gx = (wx - ox) / ts
                gy = (wy - oy) / ts
                cxi = jnp.floor(gx).astype(jnp.int32)
                cyi = jnp.floor(gy).astype(jnp.int32)
                inside = (cxi >= 0) & (cxi < cols_n) & \
                    (cyi >= 0) & (cyi < rows_n)
                cxi_c = jnp.clip(cxi, 0, cols_n - 1)
                cyi_c = jnp.clip(cyi, 0, rows_n - 1)
                # row 0 = TOP row of the grid (authoring order)
                tile = tm.tiles[rows_n - 1 - cyi_c, cxi_c]
                has_tile = inside & (tile >= 0) & has_cam
                tcol = tile % sheet_cols
                trow = tile // sheet_cols
                fu = gx - jnp.floor(gx)
                fv = 1.0 - (gy - jnp.floor(gy))
                au = u0 + (tcol + fu) * du
                av = v0 + (trow + fv) * dv
                texel = sample_atlas(atlas.data,
                                     jnp.stack([au, av], -1))
                a = texel[..., 3] * has_tile.astype(jnp.float32)
                rgb = c[:3] * (1 - a[None]) + \
                    jnp.moveaxis(texel[..., :3], -1, 0) * a[None]
                target.color = jnp.concatenate([rgb, c[3:4]], 0)

            return tilemap_chunk_pass

        for i, ch in enumerate(chunks):
            app.add_systems(Render, make_pass(i, ch), in_set=OVERLAY_SET,
                            before="sprite_pass")
