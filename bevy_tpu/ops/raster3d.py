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


def triangle_setup_corners(clip_c, tri_active, width, height,
                           viewport=None):
    """Per-corner clip coords (T,3,4) → screen-space setup (the corner
    form of triangle_setup; run clip_near_corners first if geometry can
    straddle the near plane — corners with w <= 0 still invalidate the
    triangle here, a guard, not a clipper)."""
    w = clip_c[..., 3]                                # (T,3)
    w_ok = w > 1e-6
    safe_w = jnp.where(w_ok, w, 1.0)
    inv_w = 1.0 / safe_w
    ndc = clip_c[..., :3] * inv_w[..., None]
    # NDC maps onto the viewport pixel rect (ref: Camera::viewport,
    # bevy_render/src/camera.rs — defaults to the whole target)
    if viewport is None:
        vx0, vy0, vw, vh = 0.0, 0.0, width, height
    else:
        vx0, vy0, vx1, vy1 = viewport
        vw, vh = vx1 - vx0, vy1 - vy0
    sx = vx0 + (ndc[..., 0] * 0.5 + 0.5) * vw          # (T,3)
    sy = vy0 + (0.5 - ndc[..., 1] * 0.5) * vh
    sdepth = ndc[..., 2]

    ax, ay = sx[:, 0], sy[:, 0]
    bx, by = sx[:, 1], sy[:, 1]
    cx, cy = sx[:, 2], sy[:, 2]
    # signed area*2 in y-down screen space: CCW (front) world tris come out
    # NEGATIVE after the y flip — cull area2 >= 0 (back-facing/degenerate)
    area2 = (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)
    front = area2 < -1e-12
    valid = tri_active & front & jnp.all(w_ok, axis=1)

    x0 = jnp.minimum(jnp.minimum(ax, bx), cx)
    x1 = jnp.maximum(jnp.maximum(ax, bx), cx)
    y0 = jnp.minimum(jnp.minimum(ay, by), cy)
    y1 = jnp.maximum(jnp.maximum(ay, by), cy)
    return {
        "corners": jnp.stack([sx, sy], axis=-1),       # (T,3,2)
        "depth": sdepth,
        "inv_w": inv_w,
        "area2": area2,
        "valid": valid,
        "aabb": jnp.stack([x0, y0, x1, y1], axis=1),
    }


def triangle_setup(clip, tri_verts, tri_active, width, height,
                   viewport=None):
    """Clip-space verts (V,4) + tris (T,3) → screen-space setup.

    Returns dict of per-tri arrays: screen corners (T,3,2), corner depths
    (T,3), corner 1/w (T,3), validity (T,), and screen AABB (T,4).
    Triangles with any vertex behind the near plane are dropped here —
    callers whose geometry can straddle the near plane run
    clip_near_corners + triangle_setup_corners instead (the reference's
    clipper role; the Pallas visbuf/splat paths are clipless homogeneous
    and need neither)."""
    return triangle_setup_corners(clip[tri_verts], tri_active, width,
                                  height, viewport=viewport)


def clip_near_corners(clip_c, var_c, active, eps=1e-4, extra_budget=None):
    """Vectorized near-plane clip (the role of the hardware/reference
    clipper for the XLA fallback raster; the Pallas paths are clipless
    homogeneous and skip this). Clips each triangle against w = eps.

    clip_c (T,3,4) per-corner clip coords; var_c (T,3,K) per-corner
    varyings (linearly interpolated along clipped edges in clip space —
    exact, since varyings are linear in the pre-division coordinates);
    active (T,).

    Returns (clip_c2, var_c2, active2, src): rows [0,T) hold each input
    triangle's primary output in place (rotated/clipped; winding
    preserved); rows [T, T+B) hold the SECOND triangles produced by
    2-inside/1-outside crossings, compacted into a static budget
    B = extra_budget (default max(64, T//4)). `src` (T+B,) maps every
    output row to its source triangle for per-triangle attributes."""
    t = clip_c.shape[0]
    if extra_budget is None:
        extra_budget = max(64, t // 4)
    w = clip_c[..., 3]
    inside = w > eps                                   # (T,3)
    cnt = jnp.sum(inside.astype(jnp.int32), axis=1)
    # rotate so the SINGLETON corner (the inside one when cnt==1, the
    # outside one when cnt==2) sits first; cyclic shift keeps winding
    r = jnp.where(cnt == 1,
                  jnp.argmax(inside.astype(jnp.int32), axis=1),
                  jnp.argmax((~inside).astype(jnp.int32), axis=1))
    idx = (r[:, None] + jnp.arange(3, dtype=r.dtype)[None]) % 3
    cc = jnp.take_along_axis(clip_c, idx[:, :, None], axis=1)
    vv = jnp.take_along_axis(var_c, idx[:, :, None], axis=1)

    def lerp_at(a_c, a_v, b_c, b_v):
        wa, wb = a_c[:, 3], b_c[:, 3]
        tt = (wa - eps) / jnp.where(jnp.abs(wa - wb) > 1e-20, wa - wb, 1.0)
        tt = jnp.clip(tt, 0.0, 1.0)[:, None]
        return a_c + tt * (b_c - a_c), a_v + tt * (b_v - a_v)

    i01_c, i01_v = lerp_at(cc[:, 0], vv[:, 0], cc[:, 1], vv[:, 1])
    i02_c, i02_v = lerp_at(cc[:, 0], vv[:, 0], cc[:, 2], vv[:, 2])

    # primary triangle per case (cnt==3: untouched; cnt==1: tip kept,
    # both far corners pulled to the plane; cnt==2: near corner pushed
    # to the plane along edge 0→1, plus a second tri for the quad rest)
    one = jnp.stack([cc[:, 0], i01_c, i02_c], axis=1)
    one_v = jnp.stack([vv[:, 0], i01_v, i02_v], axis=1)
    two = jnp.stack([i01_c, cc[:, 1], cc[:, 2]], axis=1)
    two_v = jnp.stack([i01_v, vv[:, 1], vv[:, 2]], axis=1)
    c1 = (cnt == 1)[:, None, None]
    c2 = (cnt == 2)[:, None, None]
    prim_c = jnp.where(c1, one, jnp.where(c2, two, cc))
    prim_v = jnp.where(c1, one_v, jnp.where(c2, two_v, vv))
    prim_ok = active & (cnt >= 1)

    # second triangles (i01, v2, i02) from cnt==2 rows → static budget
    sec_need = active & (cnt == 2)
    pos = jnp.cumsum(sec_need.astype(jnp.int32)) - 1
    tgt = jnp.where(sec_need & (pos < extra_budget), pos, extra_budget)
    rows = jnp.zeros(extra_budget + 1, jnp.int32).at[tgt].set(
        jnp.arange(t, dtype=jnp.int32), mode="drop")[:extra_budget]
    nsec = jnp.sum(sec_need.astype(jnp.int32))
    sec_ok = jnp.arange(extra_budget, dtype=jnp.int32) < \
        jnp.minimum(nsec, extra_budget)
    sec_c = jnp.stack([i01_c[rows], cc[rows, 2], i02_c[rows]], axis=1)
    sec_v = jnp.stack([i01_v[rows], vv[rows, 2], i02_v[rows]], axis=1)

    clip_c2 = jnp.concatenate([prim_c, sec_c], axis=0)
    var_c2 = jnp.concatenate([prim_v, sec_v], axis=0)
    active2 = jnp.concatenate([prim_ok, sec_ok], axis=0)
    src = jnp.concatenate([jnp.arange(t, dtype=jnp.int32), rows], axis=0)
    return clip_c2, var_c2, active2, src


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
