"""Tile-binned z-buffered triangle rasterizer (reference twin: the opaque
3D mesh path — GPU preprocessing transform/cull/indirect-args
`bevy_pbr/src/render/gpu_preprocess.rs` + `mesh_preprocess.wesl`, binned
Opaque3d phase `bevy_render/src/render_phase/mod.rs:110`, main pass
`bevy_core_pipeline/src/core_3d/main_opaque_pass_3d_node.rs` — re-designed
as one XLA pipeline: vertex transform happens in the caller; this op does
triangle setup → tile binning → per-tile edge/z loop).

Conventions (matching bevy/wgpu): right-handed y-up world, camera looks -z,
reverse-z depth in [0,1] (GREATER test, clear 0), CCW front faces with
back-face culling. Pixel (0,0) top-left, y down.

Depth is interpolated affinely in screen space (exact for NDC z);
varyings (normal/uv) are perspective-correct (interp attr/w ÷ interp 1/w).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from bevy_tpu.ops.binning import expand_runs


def _pad_to(x, m):
    return (x + m - 1) // m * m


def triangle_setup(clip, tri_verts, tri_active, width, height,
                   viewport=None):
    """Clip-space verts (V,4) + tris (T,3) → screen-space setup.

    Returns dict of per-tri arrays: screen corners (T,3,2), corner depths
    (T,3), corner 1/w (T,3), validity (T,), and screen AABB (T,4).
    Triangles with any vertex behind the near plane are dropped (the
    reference's clipper handles these; stress scenes keep geometry in
    front — a guard, not a clipper. TODO: near-plane clipping)."""
    w = clip[:, 3]
    w_ok = w > 1e-6
    safe_w = jnp.where(w_ok, w, 1.0)
    inv_w = 1.0 / safe_w
    ndc = clip[:, :3] * inv_w[:, None]
    # NDC maps onto the viewport pixel rect (ref: Camera::viewport,
    # bevy_render/src/camera.rs — defaults to the whole target)
    if viewport is None:
        vx0, vy0, vw, vh = 0.0, 0.0, width, height
    else:
        vx0, vy0, vx1, vy1 = viewport
        vw, vh = vx1 - vx0, vy1 - vy0
    sx = vx0 + (ndc[:, 0] * 0.5 + 0.5) * vw
    sy = vy0 + (0.5 - ndc[:, 1] * 0.5) * vh
    sdepth = ndc[:, 2]

    i0, i1, i2 = tri_verts[:, 0], tri_verts[:, 1], tri_verts[:, 2]
    ax, ay = sx[i0], sy[i0]
    bx, by = sx[i1], sy[i1]
    cx, cy = sx[i2], sy[i2]
    # signed area*2 in y-down screen space: CCW (front) world tris come out
    # NEGATIVE after the y flip — cull area2 >= 0 (back-facing/degenerate)
    area2 = (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)
    front = area2 < -1e-12
    valid = tri_active & front & w_ok[i0] & w_ok[i1] & w_ok[i2]

    x0 = jnp.minimum(jnp.minimum(ax, bx), cx)
    x1 = jnp.maximum(jnp.maximum(ax, bx), cx)
    y0 = jnp.minimum(jnp.minimum(ay, by), cy)
    y1 = jnp.maximum(jnp.maximum(ay, by), cy)
    return {
        "corners": jnp.stack([jnp.stack([ax, ay], -1), jnp.stack([bx, by], -1),
                              jnp.stack([cx, cy], -1)], axis=1),
        "depth": jnp.stack([sdepth[i0], sdepth[i1], sdepth[i2]], axis=1),
        "inv_w": jnp.stack([inv_w[i0], inv_w[i1], inv_w[i2]], axis=1),
        "area2": area2,
        "valid": valid,
        "aabb": jnp.stack([x0, y0, x1, y1], axis=1),
    }


def raster_triangles(fb_color, fb_depth, setup, varyings, shade_fn=None,
                     scissor=None,
                     *, tile_h=32, tile_w=128, pairs_per_tri=4,
                     max_per_tile=256, num_varyings=0):
    """Rasterize set-up triangles with a z-buffer.

    varyings: (T, 3, K) per-corner attributes (perspective-correct
      interpolated); shade_fn(interp (th,tw,K), tri_idx, bary) -> (th,tw,4)
      rgba. If shade_fn is None, varyings[..., :4] is treated as rgba color.
    Returns (fb_color, fb_depth, stats).
    """
    H, W, _ = fb_color.shape
    hp, wp = _pad_to(H, tile_h), _pad_to(W, tile_w)
    nty, ntx = hp // tile_h, wp // tile_w
    num_tiles = nty * ntx
    t = setup["valid"].shape[0]
    pair_cap = t * pairs_per_tri + num_tiles

    aabb = setup["aabb"]
    x0 = jnp.floor(aabb[:, 0] / tile_w).astype(jnp.int32)
    y0 = jnp.floor(aabb[:, 1] / tile_h).astype(jnp.int32)
    x1 = jnp.floor(aabb[:, 2] / tile_w).astype(jnp.int32)
    y1 = jnp.floor(aabb[:, 3] / tile_h).astype(jnp.int32)
    onscreen = (x1 >= 0) & (x0 < ntx) & (y1 >= 0) & (y0 < nty)
    x0, x1 = jnp.clip(x0, 0, ntx - 1), jnp.clip(x1, 0, ntx - 1)
    y0, y1 = jnp.clip(y0, 0, nty - 1), jnp.clip(y1, 0, nty - 1)
    kx, ky = x1 - x0 + 1, y1 - y0 + 1
    counts = jnp.where(setup["valid"] & onscreen, kx * ky, 0)

    owner, rank, pvalid, total = expand_runs(counts, pair_cap)
    tx = x0[owner] + rank % kx[owner]
    ty = y0[owner] + rank // kx[owner]
    tile_id = jnp.where(pvalid, ty * ntx + tx, num_tiles)
    perm = jnp.argsort(tile_id, stable=True)
    sorted_tile = tile_id[perm]
    tids = jnp.arange(num_tiles, dtype=jnp.int32)
    tile_starts = jnp.searchsorted(sorted_tile, tids, side="left").astype(jnp.int32)
    tile_ends = jnp.searchsorted(sorted_tile, tids, side="right").astype(jnp.int32)
    pair_tri = owner[perm]

    fbp = jnp.pad(fb_color, ((0, hp - H), (0, wp - W), (0, 0)))
    dbp = jnp.pad(fb_depth, ((0, hp - H), (0, wp - W)))
    ctiles = fbp.reshape(nty, tile_h, ntx, tile_w, 4).transpose(0, 2, 1, 3, 4)
    ctiles = ctiles.reshape(num_tiles, tile_h, tile_w, 4)
    dtiles = dbp.reshape(nty, tile_h, ntx, tile_w).transpose(0, 2, 1, 3)
    dtiles = dtiles.reshape(num_tiles, tile_h, tile_w)

    corners = setup["corners"]
    depths = setup["depth"]
    inv_ws = setup["inv_w"]
    area2 = setup["area2"]
    px_l = jax.lax.broadcasted_iota(jnp.float32, (tile_h, tile_w), 1) + 0.5
    py_l = jax.lax.broadcasted_iota(jnp.float32, (tile_h, tile_w), 0) + 0.5

    def render_tile(tile_idx, tile_c, tile_d):
        t_y = tile_idx // ntx
        t_x = tile_idx % ntx
        px = px_l + (t_x * tile_w).astype(jnp.float32)
        py = py_l + (t_y * tile_h).astype(jnp.float32)
        sciss = ((px >= scissor[0]) & (py >= scissor[1]) &
                 (px < scissor[2]) & (py < scissor[3])) \
            if scissor is not None else True
        start = tile_starts[tile_idx]
        end = tile_ends[tile_idx]

        def body(carry, j):
            col, dep = carry
            k = start + j
            ok = k < end
            ti = pair_tri[jnp.minimum(k, pair_cap - 1)]
            c = corners[ti]          # (3, 2)
            inv_a = 1.0 / area2[ti]  # valid tris have |area2| > 1e-12
            # edge functions; same sign convention as area2 (negative inside)
            def edge(p0, p1):
                return (p1[0] - p0[0]) * (py - p0[1]) - (p1[1] - p0[1]) * (px - p0[0])
            e0 = edge(c[1], c[2])   # opposite corner 0
            e1 = edge(c[2], c[0])
            e2 = edge(c[0], c[1])
            inside = (e0 <= 0) & (e1 <= 0) & (e2 <= 0) & ok
            b0 = e0 * inv_a
            b1 = e1 * inv_a
            b2 = e2 * inv_a
            z = b0 * depths[ti, 0] + b1 * depths[ti, 1] + b2 * depths[ti, 2]
            zpass = sciss & inside & (z > dep)  # reverse-z GREATER
            iw = b0 * inv_ws[ti, 0] + b1 * inv_ws[ti, 1] + b2 * inv_ws[ti, 2]
            iw = jnp.maximum(iw, 1e-12)
            vy = varyings[ti]        # (3, K)
            interp = (b0[..., None] * (vy[0] * inv_ws[ti, 0]) +
                      b1[..., None] * (vy[1] * inv_ws[ti, 1]) +
                      b2[..., None] * (vy[2] * inv_ws[ti, 2])) / iw[..., None]
            if shade_fn is None:
                rgba = interp[..., :4]
            else:
                rgba = shade_fn(interp, ti, (b0, b1, b2))
            rgba = jnp.where(zpass[..., None], rgba, 0.0)
            col = jnp.where(zpass[..., None], rgba, col)
            dep = jnp.where(zpass, z, dep)
            return (col, dep), None

        (tile_c, tile_d), _ = jax.lax.scan(
            body, (tile_c, tile_d), jnp.arange(max_per_tile, dtype=jnp.int32))
        return tile_c, tile_d

    ctiles, dtiles = jax.vmap(render_tile)(
        jnp.arange(num_tiles, dtype=jnp.int32), ctiles, dtiles)
    fbp = ctiles.reshape(nty, ntx, tile_h, tile_w, 4).transpose(0, 2, 1, 3, 4)
    fbp = fbp.reshape(hp, wp, 4)
    dbp = dtiles.reshape(nty, ntx, tile_h, tile_w).transpose(0, 2, 1, 3)
    dbp = dbp.reshape(hp, wp)
    stats = {
        "pair_overflow": jnp.maximum(total - pair_cap, 0),
        "tile_overflow": jnp.maximum(
            jnp.max(tile_ends - tile_starts) - max_per_tile, 0),
    }
    return fbp[:H, :W], dbp[:H, :W], stats
