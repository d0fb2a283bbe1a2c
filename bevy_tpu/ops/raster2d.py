"""Tile-binned 2D sprite rasterizer (reference twin: the sprite render
backend — instanced quads queued into the `Transparent2d` sorted phase,
`bevy_sprite_render/src/render/mod.rs:360,442,499` — re-designed as a
TPU raster pipeline: bin → sort → per-tile blend loop).

Pipeline (all static shapes, one XLA program):
  1. screen-space AABB per sprite → covered tile ranges
  2. run expansion (ops/binning.expand_runs) → (sprite, tile) pairs
  3. one sort by (tile major, back-to-front z-rank minor)
  4. per-tile segments; vmapped tile loop scans its segment, computing
     rotated-quad coverage + atlas sample + straight-alpha OVER blend on a
     (tile_h, tile_w) pixel block — the lane-friendly VPU shape.

Alpha blending order matches the reference's back-to-front transparent
phase sort (`render_phase/mod.rs:1894`).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from bevy_tpu.ops.binning import draw_order_ranks, expand_runs


def _pad_to(x, m):
    return (x + m - 1) // m * m


def pack_sprite_instances(center, half, rot, color, uv_min, uv_max, tex, z, active):
    """Pack per-sprite data into one (N, 17) f32 row for single-gather access
    in the tile loop (ref: SpriteInstance vertex layout, render/mod.rs:442).
    Layout: [0:2]=center [2:4]=half [4]=cos [5]=sin [6:10]=color
    [10:12]=uv_min [12:14]=uv_max [14]=tex [15]=z [16]=active."""
    cs, sn = jnp.cos(rot), jnp.sin(rot)
    return jnp.concatenate([
        center, half, cs[:, None], sn[:, None], color, uv_min, uv_max,
        tex.astype(jnp.float32)[:, None], z[:, None],
        active.astype(jnp.float32)[:, None],
    ], axis=1)


@partial(jax.jit, static_argnames=(
    "tile_h", "tile_w", "pairs_per_sprite", "max_per_tile", "bilinear",
    "chunk"))
def raster_sprites(fb, packed, atlas, *, tile_h=32, tile_w=128,
                   pairs_per_sprite=8, max_per_tile=256, bilinear=False,
                   chunk=8):
    """Rasterize packed sprite instances over fb (H, W, 4) linear RGBA.

    packed: (N, 16) from pack_sprite_instances — center/half in *pixels*
      (y down), rot in screen space, color linear RGBA, uv rect in [0,1]
      over `atlas` (AH, AW, 4); tex < 0 ⇒ solid color.
    Returns (fb, stats) with overflow diagnostics (dropped work is counted,
    never silently wrong-shaped — ref: render phases can't overflow, our
    static caps can).
    """
    H, W, _ = fb.shape
    n = packed.shape[0]
    hp, wp = _pad_to(H, tile_h), _pad_to(W, tile_w)
    nty, ntx = hp // tile_h, wp // tile_w
    num_tiles = nty * ntx
    pair_cap = n * pairs_per_sprite + num_tiles

    center = packed[:, 0:2]
    half = packed[:, 2:4]
    cs, sn = packed[:, 4], packed[:, 5]
    z = packed[:, 15]
    active = packed[:, 16] > 0.5

    # 1. conservative screen AABB of the rotated quad
    rx = jnp.abs(cs) * half[:, 0] + jnp.abs(sn) * half[:, 1]
    ry = jnp.abs(sn) * half[:, 0] + jnp.abs(cs) * half[:, 1]
    x0 = jnp.floor((center[:, 0] - rx) / tile_w).astype(jnp.int32)
    x1 = jnp.floor((center[:, 0] + rx) / tile_w).astype(jnp.int32)
    y0 = jnp.floor((center[:, 1] - ry) / tile_h).astype(jnp.int32)
    y1 = jnp.floor((center[:, 1] + ry) / tile_h).astype(jnp.int32)
    onscreen = (x1 >= 0) & (x0 < ntx) & (y1 >= 0) & (y0 < nty) & \
        (half[:, 0] > 0) & (half[:, 1] > 0)
    x0, x1 = jnp.clip(x0, 0, ntx - 1), jnp.clip(x1, 0, ntx - 1)
    y0, y1 = jnp.clip(y0, 0, nty - 1), jnp.clip(y1, 0, nty - 1)
    kx = x1 - x0 + 1
    ky = y1 - y0 + 1
    counts = jnp.where(active & onscreen, kx * ky, 0)

    # 2. expand to (sprite, tile) pairs
    owner, rank, valid, total = expand_runs(counts, pair_cap)
    tx = x0[owner] + rank % kx[owner]
    ty = y0[owner] + rank // kx[owner]
    tile_id = ty * ntx + tx

    # 3. sort by (tile, draw order) — back-to-front within each tile
    zrank = draw_order_ranks(z, active)
    pair_key = tile_id * n + zrank[owner]  # < num_tiles*n, fits int32 for our scales
    pair_key = jnp.where(valid, pair_key, num_tiles * n)
    perm = jnp.argsort(pair_key, stable=True)
    # tile t spans sorted keys [t*n, (t+1)*n)
    sorted_key = pair_key[perm]
    tile_starts = jnp.searchsorted(
        sorted_key, jnp.arange(num_tiles, dtype=jnp.int32) * n, side="left"
    ).astype(jnp.int32)
    tile_ends = jnp.searchsorted(
        sorted_key, (jnp.arange(num_tiles, dtype=jnp.int32) + 1) * n, side="left"
    ).astype(jnp.int32)
    pair_sprite = owner[perm]

    # 4. per-tile raster
    fbp = jnp.pad(fb, ((0, hp - H), (0, wp - W), (0, 0)))
    tiles = fbp.reshape(nty, tile_h, ntx, tile_w, 4).transpose(0, 2, 1, 3, 4)
    tiles = tiles.reshape(num_tiles, tile_h, tile_w, 4)

    ah, aw = atlas.shape[0], atlas.shape[1]
    px_local = jax.lax.broadcasted_iota(jnp.float32, (tile_h, tile_w), 1) + 0.5
    py_local = jax.lax.broadcasted_iota(jnp.float32, (tile_h, tile_w), 0) + 0.5

    def sample_atlas(u, v):
        """u, v in [0,1] over the atlas; clamp addressing."""
        if bilinear:
            fx = u * aw - 0.5
            fy = v * ah - 0.5
            ix0 = jnp.clip(jnp.floor(fx).astype(jnp.int32), 0, aw - 1)
            iy0 = jnp.clip(jnp.floor(fy).astype(jnp.int32), 0, ah - 1)
            ix1 = jnp.minimum(ix0 + 1, aw - 1)
            iy1 = jnp.minimum(iy0 + 1, ah - 1)
            wx = jnp.clip(fx - ix0, 0.0, 1.0)[..., None]
            wy = jnp.clip(fy - iy0, 0.0, 1.0)[..., None]
            c00, c10 = atlas[iy0, ix0], atlas[iy0, ix1]
            c01, c11 = atlas[iy1, ix0], atlas[iy1, ix1]
            return (c00 * (1 - wx) + c10 * wx) * (1 - wy) + \
                   (c01 * (1 - wx) + c11 * wx) * wy
        ix = jnp.clip((u * aw).astype(jnp.int32), 0, aw - 1)
        iy = jnp.clip((v * ah).astype(jnp.int32), 0, ah - 1)
        return atlas[iy, ix]

    # The per-tile loop processes `chunk` sprites per sequential step:
    # straight-alpha OVER is associative, so a chunk composites exactly via
    # exclusive reverse-cumprod transmittance — this turns a latency-bound
    # 1-sprite-per-step scan into wide VPU work (the TPU analogue of the
    # reference's per-tile fragment loop).
    n_chunks = _pad_to(max_per_tile, chunk) // chunk
    lane = jnp.arange(chunk, dtype=jnp.int32)

    def render_tile(tile_idx, tile_fb):
        t_y = tile_idx // ntx
        t_x = tile_idx % ntx
        px = px_local + (t_x * tile_w).astype(jnp.float32)
        py = py_local + (t_y * tile_h).astype(jnp.float32)
        start = tile_starts[tile_idx]
        end = tile_ends[tile_idx]

        def chunk_src(k):
            """(chunk,) pair slots -> src rgba (chunk, th, tw, 4), a-masked."""
            ok = k < end
            s = pair_sprite[jnp.minimum(k, pair_cap - 1)]
            d = packed[s]                       # (chunk, 17)
            dx = px[None] - d[:, 0, None, None]
            dy = py[None] - d[:, 1, None, None]
            lx = d[:, 4, None, None] * dx + d[:, 5, None, None] * dy
            ly = -d[:, 5, None, None] * dx + d[:, 4, None, None] * dy
            inside = (jnp.abs(lx) <= d[:, 2, None, None]) & \
                     (jnp.abs(ly) <= d[:, 3, None, None]) & ok[:, None, None]
            # guard 0-size rows gathered on masked-off lanes (0/0 ⇒ NaN)
            u = lx / jnp.maximum(2.0 * d[:, 2, None, None], 1e-6) + 0.5
            v = ly / jnp.maximum(2.0 * d[:, 3, None, None], 1e-6) + 0.5
            au = d[:, 10, None, None] + u * (d[:, 12, None, None] - d[:, 10, None, None])
            av = d[:, 11, None, None] + v * (d[:, 13, None, None] - d[:, 11, None, None])
            texel = jnp.where(d[:, 14, None, None, None] >= 0.0,
                              sample_atlas(au, av), 1.0)
            src = texel * d[:, None, None, 6:10]
            sa = jnp.where(inside, src[..., 3], 0.0)
            srgb = jnp.where(inside[..., None], src[..., :3], 0.0)
            return srgb, sa

        def body(fbt, c):
            k = start + c * chunk + lane
            srgb, sa = chunk_src(k)             # (chunk, th, tw, 3), (chunk, th, tw)
            # transmittance after sprite i within the chunk (draw order =
            # ascending lane): T_i = prod_{j>i} (1 - a_j)
            one_m = 1.0 - sa
            t_after = jnp.flip(jnp.cumprod(jnp.flip(one_m, 0), axis=0), 0)
            t_excl = jnp.concatenate([t_after[1:], jnp.ones_like(sa[:1])], 0)
            contrib = jnp.sum(srgb * (sa * t_excl)[..., None], axis=0)
            t_all = t_after[0]
            rgb = fbt[..., :3] * t_all[..., None] + contrib
            a = 1.0 - (1.0 - fbt[..., 3]) * t_all
            return jnp.concatenate([rgb, a[..., None]], axis=-1), None

        fbt, _ = jax.lax.scan(body, tile_fb, jnp.arange(n_chunks, dtype=jnp.int32))
        return fbt

    tiles = jax.vmap(render_tile)(jnp.arange(num_tiles, dtype=jnp.int32), tiles)
    fbp = tiles.reshape(nty, ntx, tile_h, tile_w, 4).transpose(0, 2, 1, 3, 4)
    fbp = fbp.reshape(hp, wp, 4)
    stats = {
        "pair_overflow": jnp.maximum(total - pair_cap, 0),
        "tile_overflow": jnp.maximum(jnp.max(tile_ends - tile_starts) - max_per_tile, 0),
    }
    return fbp[:H, :W], stats
