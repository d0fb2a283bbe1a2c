"""Pallas TPU triangle rasterizer — z-buffered opaque mesh path (reference
twin: GPU preprocessing + binned Opaque3d main pass, see ops/raster3d.py
which holds the XLA reference implementation and the conventions: reverse-z
GREATER, CCW front faces ⇒ negative screen area, y-down pixels).

Same architecture as ops/raster2d_pallas.py: XLA prep bins set-up triangles
into a fixed per-tile table; each kernel grid step owns one framebuffer
tile (color planes + depth) in VMEM and walks its dynamic triangle count.
Opaque ⇒ no sort by depth needed, the z-buffer resolves order.

Per-tri table layout (F=32, padded):
  0:6   corner screen xy (ax ay bx by cx cy)
  6:9   corner NDC depths
  9:12  corner 1/w
  12    1/area2 (precomputed)
  13:22 corner world normals, PREMULTIPLIED by the corner's 1/w
        (perspective-correct interp = Σ bᵢ·nᵢ′ ÷ Σ bᵢ·(1/w)ᵢ)
  22:26 base color rgba
  26:29 emissive rgb
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bevy_tpu.ops.binning import expand_runs

F_PAD = 40


def _pad_to(x, m):
    return (x + m - 1) // m * m


def pack_tri_table(setup, normals, colors, emissive):
    """(T,*) setup (from ops.raster3d.triangle_setup) + per-corner world
    normals (T,3,3) + per-tri colors (T,4) + emissive (T,3) → (T, 32) rows."""
    t = setup["valid"].shape[0]
    c = setup["corners"].reshape(t, 6)
    inv_a = jnp.where(setup["valid"], 1.0 / jnp.where(
        setup["valid"], setup["area2"], 1.0), 0.0)
    n_pre = normals * setup["inv_w"][:, :, None]     # premultiply by 1/w
    return jnp.concatenate([
        c, setup["depth"], setup["inv_w"], inv_a[:, None],
        n_pre.reshape(t, 9), colors, emissive,
        jnp.zeros((t, F_PAD - 29), jnp.float32),
    ], axis=1)


def pack_tri_planes(corner_xy, depth, inv_w, area2, valid,
                    normals, colors, emissive, metallic=None,
                    roughness=None):
    """Plane-equation triangle records (T, F_PAD) — barycentrics are affine
    in screen space, so every interpolated quantity is a plane; the kernel
    then needs only FMAs, no per-corner math. Inputs are per-triangle
    corner arrays (T, 3, …) — produce them WITHOUT gathers where possible
    (the uniform-mesh path uses constant one-hot matmuls).

    Layout: 0:9 edge planes (A,B,C ×3, raw sign: inside = all ≤ 0),
    9:12 z plane, 12:15 1/w plane, 15:24 normal planes (premultiplied by
    corner 1/w), 24:28 color rgba, 28:31 emissive rgb, 31 metallic,
    32 perceptual roughness."""
    t = valid.shape[0]
    ax, ay = corner_xy[:, 0, 0], corner_xy[:, 0, 1]
    bx, by = corner_xy[:, 1, 0], corner_xy[:, 1, 1]
    cx, cy = corner_xy[:, 2, 0], corner_xy[:, 2, 1]

    def edge(px0, py0, px1, py1):
        # e(p) = (x1-x0)(py-y0) - (y1-y0)(px-x0)
        a = -(py1 - py0)
        b = px1 - px0
        c = (py1 - py0) * px0 - (px1 - px0) * py0
        return a, b, c

    a0, b0, c0 = edge(bx, by, cx, cy)
    a1, b1, c1 = edge(cx, cy, ax, ay)
    a2, b2, c2 = edge(ax, ay, bx, by)
    inv_area = jnp.where(valid, 1.0 / jnp.where(valid, area2, 1.0), 0.0)

    def plane(q):  # q: (T, 3) corner values → affine (A, B, C)
        qa = (q[:, 0] * a0 + q[:, 1] * a1 + q[:, 2] * a2) * inv_area
        qb = (q[:, 0] * b0 + q[:, 1] * b1 + q[:, 2] * b2) * inv_area
        qc = (q[:, 0] * c0 + q[:, 1] * c1 + q[:, 2] * c2) * inv_area
        return qa, qb, qc

    n_pre = normals * inv_w[:, :, None]
    planes = [plane(depth), plane(inv_w),
              plane(n_pre[:, :, 0]), plane(n_pre[:, :, 1]),
              plane(n_pre[:, :, 2])]
    cols = [a0, b0, c0, a1, b1, c1, a2, b2, c2]
    for pa, pb, pc in planes:
        cols += [pa, pb, pc]
    rec = jnp.stack(cols, axis=1)                      # (T, 24)
    metallic = jnp.zeros(t, jnp.float32) if metallic is None else metallic
    roughness = jnp.full(t, 0.5, jnp.float32) if roughness is None else roughness
    return jnp.concatenate([
        rec, colors, emissive, metallic[:, None], roughness[:, None],
        jnp.zeros((t, F_PAD - 33), jnp.float32)], axis=1)


def _plane_kernel(counts_ref, light_ref,
                  tile_table_ref,
                  col_in_ref, dep_in_ref,
                  col_out_ref, dep_out_ref,
                  tris_ref, sem,
                  *, tile_h, tile_w, max_per_tile, use_scissor=False):
    i = pl.program_id(0)
    j = pl.program_id(1)
    ntx = pl.num_programs(1)
    t = i * ntx + j
    cnt = counts_ref[t]

    dma = pltpu.make_async_copy(tile_table_ref.at[t], tris_ref, sem)
    dma.start()

    def fiota(shape, dim):
        return jax.lax.broadcasted_iota(jnp.int32, shape, dim).astype(jnp.float32)

    px = fiota((tile_h, tile_w), 1) + (j * tile_w).astype(jnp.float32) + 0.5
    py = fiota((tile_h, tile_w), 0) + (i * tile_h).astype(jnp.float32) + 0.5
    ldx, ldy, ldz = light_ref[0], light_ref[1], light_ref[2]
    # viewport scissor (ref: Camera::viewport) — hoisted per tile, one mask
    # statically compiled out for full-frame passes (single camera)
    sciss = ((px >= light_ref[9]) & (py >= light_ref[10]) &
             (px < light_ref[11]) & (py < light_ref[12])) if use_scissor \
        else True

    dma.wait()

    def body(s, fb):
        cr, cg, cb, ca, dep = fb

        def d(k):
            return tris_ref[k, s]
        inside = (d(0) * px + d(1) * py + d(2) <= 0) & \
                 (d(3) * px + d(4) * py + d(5) <= 0) & \
                 (d(6) * px + d(7) * py + d(8) <= 0)
        z = d(9) * px + d(10) * py + d(11)
        zpass = sciss & inside & (z > dep)
        iw = jnp.maximum(d(12) * px + d(13) * py + d(14), 1e-12)
        nx = (d(15) * px + d(16) * py + d(17)) / iw
        ny = (d(18) * px + d(19) * py + d(20)) / iw
        nz = (d(21) * px + d(22) * py + d(23)) / iw
        inv_len = jax.lax.rsqrt(jnp.maximum(nx * nx + ny * ny + nz * nz, 1e-12))
        lambert = jnp.maximum(0.0, -(nx * ldx + ny * ldy + nz * ldz) * inv_len)
        sr = d(24) * (light_ref[6] + light_ref[3] * lambert) + d(28)
        sg = d(25) * (light_ref[7] + light_ref[4] * lambert) + d(29)
        sb = d(26) * (light_ref[8] + light_ref[5] * lambert) + d(30)
        cr = jnp.where(zpass, sr, cr)
        cg = jnp.where(zpass, sg, cg)
        cb = jnp.where(zpass, sb, cb)
        ca = jnp.where(zpass, d(27), ca)
        dep = jnp.where(zpass, z, dep)
        return (cr, cg, cb, ca, dep)

    fb0 = (col_in_ref[0], col_in_ref[1], col_in_ref[2], col_in_ref[3],
           dep_in_ref[:])
    cr, cg, cb, ca, dep = jax.lax.fori_loop(0, cnt, body, fb0)
    col_out_ref[0] = cr
    col_out_ref[1] = cg
    col_out_ref[2] = cb
    col_out_ref[3] = ca
    dep_out_ref[:] = dep


def _plane_kernel_gbuf(counts_ref, light_ref,
                       tile_table_ref,
                       g_in_ref, dep_in_ref,
                       g_out_ref, dep_out_ref,
                       tris_ref, sem,
                       *, tile_h, tile_w, max_per_tile, use_scissor=False):
    """G-buffer variant of _plane_kernel (ref: the deferred prepass,
    bevy_core_pipeline/src/deferred/): writes albedo(0:3), alpha(3),
    world normal(4:7), emissive(7:10), metallic(10), roughness(11) + depth;
    lighting happens in the deferred shade kernel (ops/shade_pallas.py)."""
    i = pl.program_id(0)
    j = pl.program_id(1)
    ntx = pl.num_programs(1)
    t = i * ntx + j
    cnt = counts_ref[t]

    dma = pltpu.make_async_copy(tile_table_ref.at[t], tris_ref, sem)
    dma.start()

    def fiota(shape, dim):
        return jax.lax.broadcasted_iota(jnp.int32, shape, dim).astype(jnp.float32)

    px = fiota((tile_h, tile_w), 1) + (j * tile_w).astype(jnp.float32) + 0.5
    py = fiota((tile_h, tile_w), 0) + (i * tile_h).astype(jnp.float32) + 0.5
    # statically compiled out for full-frame passes (single camera)
    sciss = ((px >= light_ref[9]) & (py >= light_ref[10]) &
             (px < light_ref[11]) & (py < light_ref[12])) if use_scissor \
        else True

    dma.wait()

    def body(s, fb):
        ar, ag, ab, aa, nxp, nyp, nzp, er, eg, eb, met, rgh, dep = fb

        def d(k):
            return tris_ref[k, s]
        inside = (d(0) * px + d(1) * py + d(2) <= 0) & \
                 (d(3) * px + d(4) * py + d(5) <= 0) & \
                 (d(6) * px + d(7) * py + d(8) <= 0)
        z = d(9) * px + d(10) * py + d(11)
        zpass = sciss & inside & (z > dep)
        iw = jnp.maximum(d(12) * px + d(13) * py + d(14), 1e-12)
        nx = (d(15) * px + d(16) * py + d(17)) / iw
        ny = (d(18) * px + d(19) * py + d(20)) / iw
        nz = (d(21) * px + d(22) * py + d(23)) / iw
        inv_len = jax.lax.rsqrt(jnp.maximum(nx * nx + ny * ny + nz * nz, 1e-12))
        ar = jnp.where(zpass, d(24), ar)
        ag = jnp.where(zpass, d(25), ag)
        ab = jnp.where(zpass, d(26), ab)
        aa = jnp.where(zpass, d(27), aa)
        nxp = jnp.where(zpass, nx * inv_len, nxp)
        nyp = jnp.where(zpass, ny * inv_len, nyp)
        nzp = jnp.where(zpass, nz * inv_len, nzp)
        er = jnp.where(zpass, d(28), er)
        eg = jnp.where(zpass, d(29), eg)
        eb = jnp.where(zpass, d(30), eb)
        met = jnp.where(zpass, d(31), met)
        rgh = jnp.where(zpass, d(32), rgh)
        dep = jnp.where(zpass, z, dep)
        return (ar, ag, ab, aa, nxp, nyp, nzp, er, eg, eb, met, rgh, dep)

    fb0 = tuple(g_in_ref[k] for k in range(12)) + (dep_in_ref[:],)
    out = jax.lax.fori_loop(0, cnt, body, fb0)
    for k in range(12):
        g_out_ref[k] = out[k]
    dep_out_ref[:] = out[12]


def _kernel(counts_ref, light_ref,         # scalar prefetch (SMEM)
            tile_table_ref,                # ANY (num_tiles, F_PAD, max_per_tile)
            col_in_ref, dep_in_ref,        # VMEM blocks (aliased)
            col_out_ref, dep_out_ref,
            tris_ref, sem,                 # SMEM scratch + DMA sem
            *, tile_h, tile_w, max_per_tile, use_scissor=False):
    i = pl.program_id(0)
    j = pl.program_id(1)
    ntx = pl.num_programs(1)
    t = i * ntx + j
    cnt = counts_ref[t]

    dma = pltpu.make_async_copy(tile_table_ref.at[t], tris_ref, sem)
    dma.start()

    def fiota(shape, dim):
        return jax.lax.broadcasted_iota(jnp.int32, shape, dim).astype(jnp.float32)

    px = fiota((tile_h, tile_w), 1) + (j * tile_w).astype(jnp.float32) + 0.5
    py = fiota((tile_h, tile_w), 0) + (i * tile_h).astype(jnp.float32) + 0.5

    # directional light (ref: bevy_light DirectionalLight + AmbientLight):
    # light_ref = [dir xyz, light rgb, ambient rgb, scissor x0 y0 x1 y1, pad]
    ldx, ldy, ldz = light_ref[0], light_ref[1], light_ref[2]
    # statically compiled out for full-frame passes (single camera)
    sciss = ((px >= light_ref[9]) & (py >= light_ref[10]) &
             (px < light_ref[11]) & (py < light_ref[12])) if use_scissor \
        else True

    dma.wait()

    def body(s, fb):
        cr, cg, cb, ca, dep = fb

        def d(k):
            return tris_ref[k, s]
        ax, ay, bx, by, cx, cy = d(0), d(1), d(2), d(3), d(4), d(5)
        e0 = (cx - bx) * (py - by) - (cy - by) * (px - bx)
        e1 = (ax - cx) * (py - cy) - (ay - cy) * (px - cx)
        e2 = (bx - ax) * (py - ay) - (by - ay) * (px - ax)
        inside = (e0 <= 0) & (e1 <= 0) & (e2 <= 0)
        inv_a = d(12)
        b0, b1, b2 = e0 * inv_a, e1 * inv_a, e2 * inv_a
        z = b0 * d(6) + b1 * d(7) + b2 * d(8)
        zpass = sciss & inside & (z > dep)
        iw = jnp.maximum(b0 * d(9) + b1 * d(10) + b2 * d(11), 1e-12)
        nx = (b0 * d(13) + b1 * d(16) + b2 * d(19)) / iw
        ny = (b0 * d(14) + b1 * d(17) + b2 * d(20)) / iw
        nz = (b0 * d(15) + b1 * d(18) + b2 * d(21)) / iw
        inv_len = jax.lax.rsqrt(jnp.maximum(nx * nx + ny * ny + nz * nz, 1e-12))
        lambert = jnp.maximum(0.0, -(nx * ldx + ny * ldy + nz * ldz) * inv_len)
        sr = d(22) * (light_ref[6] + light_ref[3] * lambert) + d(26)
        sg = d(23) * (light_ref[7] + light_ref[4] * lambert) + d(27)
        sb = d(24) * (light_ref[8] + light_ref[5] * lambert) + d(28)
        cr = jnp.where(zpass, sr, cr)
        cg = jnp.where(zpass, sg, cg)
        cb = jnp.where(zpass, sb, cb)
        ca = jnp.where(zpass, d(25), ca)
        dep = jnp.where(zpass, z, dep)
        return (cr, cg, cb, ca, dep)

    fb0 = (col_in_ref[0], col_in_ref[1], col_in_ref[2], col_in_ref[3],
           dep_in_ref[:])
    cr, cg, cb, ca, dep = jax.lax.fori_loop(0, cnt, body, fb0)
    col_out_ref[0] = cr
    col_out_ref[1] = cg
    col_out_ref[2] = cb
    col_out_ref[3] = ca
    dep_out_ref[:] = dep


@partial(jax.jit, static_argnames=(
    "tile_h", "tile_w", "pairs_per_tri", "max_per_tile", "interpret",
    "layout", "pair_budget"))
def raster_tris_pallas(fb_planar, depth, tri_table, valid, aabb, light,
                       scissor=None,
                       *, tile_h=32, tile_w=128, pairs_per_tri=2,
                       max_per_tile=256, interpret=False, layout="corners",
                       pair_budget=None):
    """fb_planar (4,H,W) — or the (10,H,W) G-buffer for layout='planes_gbuf'
    — plus depth (H,W) reverse-z; tri_table (T,32) from pack_tri_table
    (layout='corners') or pack_tri_planes (layout='planes'/'planes_gbuf' —
    the fast path: pure-FMA kernel body); valid (T,) bool; aabb (T,4)
    screen x0 y0 x1 y1; light (16,) f32 [dir xyz, light rgb, ambient rgb].
    Returns (fb_planar, depth, stats)."""
    nplanes, H, W = fb_planar.shape
    # scissor rides the light vector's padding (slots 9..12): traced pixel
    # rect [x0, y0, x1, y1); None = the whole target (ref: Camera::viewport)
    use_scissor = scissor is not None
    if scissor is None:
        sc = jnp.asarray([0.0, 0.0, float(W), float(H)], jnp.float32)
    else:
        sc = jnp.stack([jnp.asarray(s, jnp.float32) for s in scissor])
    light = jnp.concatenate([light[:9], sc, light[13:]])
    t = tri_table.shape[0]
    max_per_tile = _pad_to(max_per_tile, 128)
    hp, wp = _pad_to(H, tile_h), _pad_to(W, tile_w)
    nty, ntx = hp // tile_h, wp // tile_w
    num_tiles = nty * ntx

    x0 = jnp.floor(aabb[:, 0] / tile_w).astype(jnp.int32)
    y0 = jnp.floor(aabb[:, 1] / tile_h).astype(jnp.int32)
    x1 = jnp.floor(aabb[:, 2] / tile_w).astype(jnp.int32)
    y1 = jnp.floor(aabb[:, 3] / tile_h).astype(jnp.int32)
    onscreen = (x1 >= 0) & (x0 < ntx) & (y1 >= 0) & (y0 < nty)
    x0, x1 = jnp.clip(x0, 0, ntx - 1), jnp.clip(x1, 0, ntx - 1)
    y0, y1 = jnp.clip(y0, 0, nty - 1), jnp.clip(y1, 0, nty - 1)
    kx, ky = x1 - x0 + 1, y1 - y0 + 1
    counts = jnp.where(valid & onscreen, kx * ky, 0)
    pair_cap = pair_budget or (t * pairs_per_tri + num_tiles)
    owner, rank, pvalid, total = expand_runs(counts, pair_cap)
    # one packed gather instead of three (gathers dominate binning cost)
    code = (y0 * 1024 + x0) * 32 + kx
    c = code[owner]
    kxo = c % 32
    x0o = (c // 32) % 1024
    y0o = c // 32768
    tile_id = (y0o + rank // kxo) * ntx + (x0o + rank % kxo)
    tile_id = jnp.where(pvalid, tile_id, num_tiles)
    perm = jnp.argsort(tile_id)             # opaque: order irrelevant
    sorted_tile = tile_id[perm]
    tids = jnp.arange(num_tiles, dtype=jnp.int32)
    starts = jnp.searchsorted(sorted_tile, tids, side="left").astype(jnp.int32)
    ends = jnp.searchsorted(sorted_tile, tids + 1, side="left").astype(jnp.int32)
    pair_tri = owner[perm]

    tile_counts = jnp.minimum(ends - starts, max_per_tile)
    slot = starts[:, None] + jnp.arange(max_per_tile, dtype=jnp.int32)[None, :]
    slot = jnp.minimum(slot, pair_cap - 1)
    tile_table = tri_table[pair_tri[slot]].transpose(0, 2, 1)

    fbp = jnp.pad(fb_planar, ((0, 0), (0, hp - H), (0, wp - W)))
    dp = jnp.pad(depth, ((0, hp - H), (0, wp - W)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nty, ntx),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),      # tile_table
            pl.BlockSpec((nplanes, tile_h, tile_w), lambda i, j, *_: (0, i, j),
                         memory_space=pltpu.VMEM),     # color/gbuffer in
            pl.BlockSpec((tile_h, tile_w), lambda i, j, *_: (i, j),
                         memory_space=pltpu.VMEM),     # depth in
        ],
        out_specs=[
            pl.BlockSpec((nplanes, tile_h, tile_w), lambda i, j, *_: (0, i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_h, tile_w), lambda i, j, *_: (i, j),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.SMEM((F_PAD, max_per_tile), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    kernels = {"planes": _plane_kernel, "planes_gbuf": _plane_kernel_gbuf,
               "corners": _kernel}
    kernel = partial(kernels[layout], tile_h=tile_h, tile_w=tile_w,
                     max_per_tile=max_per_tile, use_scissor=use_scissor)
    col, dep = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((nplanes, hp, wp), jnp.float32),
                   jax.ShapeDtypeStruct((hp, wp), jnp.float32)],
        input_output_aliases={3: 0, 4: 1},   # indices incl. prefetch args
        interpret=interpret,
    )(tile_counts, light, tile_table, fbp, dp)

    stats = {
        "pair_overflow": jnp.maximum(total - pair_cap, 0),
        "tile_overflow": jnp.maximum(jnp.max(ends - starts) - max_per_tile, 0),
    }
    return col[:, :H, :W], dep[:H, :W], stats
