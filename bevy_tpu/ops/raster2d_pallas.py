"""Pallas TPU sprite rasterizer — the fast path behind ops/raster2d.py's
XLA reference implementation (reference twin: the per-tile fragment work the
wgpu raster pipeline does in `bevy_sprite_render`; see pallas_guide.md).

Why a kernel: in plain XLA the per-tile loop is either latency-bound (one
sprite per lax.scan step ⇒ per-step dispatch overhead × max_per_tile) or
bandwidth-bound (chunked ⇒ materialized (chunk, tiles, th, tw, 4) HBM
intermediates). Here each grid step owns one framebuffer tile resident in
VMEM, loops over a *dynamic* sprite count (only real work, not the static
cap), and blends in-place.

Pipeline (costs scale with VISIBLE sprites, not world capacity):
  1. cull + z-sort: one argsort over (visible?, z) compacts visible sprites
     to the front in draw order; a static `max_visible` budget bounds all
     later shapes (ref: frustum culling before queuing,
     bevy_camera/src/visibility/mod.rs:748).
  2. pair expansion (scatter+cummax, ops/binning.py) + ONE stable sort by
     tile id — pairs are generated in draw order, so stability keeps
     back-to-front order inside each tile for free.
  3. fixed per-tile table (num_tiles, 24, max_per_tile) gathered once —
     aligned dim-0 slices for the kernel's single DMA per tile.
  4. kernel: per-tile dynamic fori_loop; coverage on the VPU; texture
     sampling is gather-free — bilinear filtering of an axis-aligned sprite
     is separable, so a (th, tw) sample block is two small MXU matmuls with
     tent-function weight matrices:  W_y (th×AH) @ atlas_ch @ W_xᵀ (AW×tw).
     (Rotated solid-color sprites are exact; rotated *textured* sprites are
     not supported here — callers use the XLA reference path.)

Framebuffer is channel-planar (4, H, W) so each plane tiles to the native
(8k, 128) VMEM layout.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bevy_tpu.ops.binning import expand_runs


def _pad_to(x, m):
    return (x + m - 1) // m * m


def _kernel(counts_ref,                    # scalar prefetch (SMEM)
            tile_table_ref,                # ANY/HBM (num_tiles, 24, max_per_tile)
            atlas_ref,                     # VMEM (4, AH, AW) planar
            fb_in_ref, fb_out_ref,         # VMEM (4, th, tw), aliased
            sprites_ref, sem,              # scratch: SMEM rows + DMA sem
            *, tile_h, tile_w, max_per_tile, ah, aw, bilinear):
    i = pl.program_id(0)
    j = pl.program_id(1)
    ntx = pl.num_programs(1)
    t = i * ntx + j
    cnt = counts_ref[t]

    # one DMA pulls this tile's sprite table row (dim-0 slice: aligned)
    dma = pltpu.make_async_copy(tile_table_ref.at[t], sprites_ref, sem)
    dma.start()

    def fiota(shape, dim):
        return jax.lax.broadcasted_iota(jnp.int32, shape, dim).astype(jnp.float32)

    px = fiota((tile_h, tile_w), 1) + (j * tile_w).astype(jnp.float32) + 0.5
    py = fiota((tile_h, tile_w), 0) + (i * tile_h).astype(jnp.float32) + 0.5
    col_x = px[0:1, :]                       # (1, tw)
    row_y = py[:, 0:1]                       # (th, 1)
    ky = fiota((tile_h, ah), 1)              # atlas row ids
    kx = fiota((aw, tile_w), 0)              # atlas col ids

    dma.wait()

    def body(carry):
        # front-to-back traversal of the back-to-front table: sprite
        # cnt-1-s is the s-th from the front. Under-compositing
        # (acc += T*src, T *= 1-a) is exact for the over operator and
        # lets the loop exit once the tile saturates to opaque.
        s_, pr0, pg0, pb0, pa0 = carry
        s = cnt - 1 - s_

        def d(k):
            return sprites_ref[k, s]         # scalar load from SMEM
        cx, cy, hx, hy = d(0), d(1), d(2), d(3)
        cos, sin = d(4), d(5)
        dx = px - cx
        dy = py - cy
        lx = cos * dx + sin * dy
        ly = -sin * dx + cos * dy
        inside = (jnp.abs(lx) <= hx) & (jnp.abs(ly) <= hy)
        inv2hx = 1.0 / jnp.maximum(2.0 * hx, 1e-6)
        inv2hy = 1.0 / jnp.maximum(2.0 * hy, 1e-6)

        textured = d(14) >= 0.0
        u0, v0, u1, v1 = d(10), d(11), d(12), d(13)

        def sample():
            uu = ((col_x - cx) * inv2hx + 0.5)        # (1, tw)
            vv = ((row_y - cy) * inv2hy + 0.5)        # (th, 1)
            fx = jnp.clip(u0 + uu * (u1 - u0), jnp.minimum(u0, u1),
                          jnp.maximum(u0, u1)) * aw - 0.5
            fy = jnp.clip(v0 + vv * (v1 - v0), jnp.minimum(v0, v1),
                          jnp.maximum(v0, v1)) * ah - 0.5
            if bilinear:
                wy = jnp.maximum(0.0, 1.0 - jnp.abs(ky - fy))        # (th, AH)
                wx = jnp.maximum(0.0, 1.0 - jnp.abs(kx - fx))        # (AW, tw)
            else:
                wy = (jnp.abs(ky - fy) <= 0.5).astype(jnp.float32)
                wx = (jnp.abs(kx - fx) < 0.5).astype(jnp.float32)
            # edge clamp: renormalize so weights always sum to 1
            wy = wy / jnp.maximum(jnp.sum(wy, axis=1, keepdims=True), 1e-6)
            wx = wx / jnp.maximum(jnp.sum(wx, axis=0, keepdims=True), 1e-6)
            chans = []
            for c in range(4):
                rows = jnp.dot(wy, atlas_ref[c],
                               preferred_element_type=jnp.float32)   # (th, AW)
                chans.append(jnp.dot(rows, wx,
                                     preferred_element_type=jnp.float32))
            return chans

        tex = sample()
        one = jnp.ones((tile_h, tile_w), jnp.float32)
        tr = jnp.where(textured, tex[0], one)
        tg = jnp.where(textured, tex[1], one)
        tb = jnp.where(textured, tex[2], one)
        ta = jnp.where(textured, tex[3], one)

        a = jnp.where(inside, ta * d(9), 0.0)
        t_ = 1.0 - pa0                      # transmittance in front of s
        return (s_ + 1, pr0 + t_ * tr * d(6) * a, pg0 + t_ * tg * d(7) * a,
                pb0 + t_ * tb * d(8) * a, pa0 + t_ * a)

    def not_opaque(carry):
        s_, _, _, _, pa0 = carry
        # exit only on EXACT saturation (bit-identical to the full walk:
        # remaining layers are scaled by a transmittance of exactly 0)
        return (s_ < cnt) & (jnp.min(pa0) < 1.0)

    z0 = jnp.zeros((tile_h, tile_w), jnp.float32)
    _, pr, pg, pb, pa = jax.lax.while_loop(
        not_opaque, body, (jnp.int32(0), z0, z0, z0, z0))
    ia = 1.0 - pa
    fb_out_ref[0] = fb_in_ref[0] * ia + pr
    fb_out_ref[1] = fb_in_ref[1] * ia + pg
    fb_out_ref[2] = fb_in_ref[2] * ia + pb
    fb_out_ref[3] = fb_in_ref[3] * ia + pa


def _kernel_batched(counts_ref,            # scalar prefetch (SMEM)
                    tile_table_ref,        # ANY/HBM (num_tiles, mpt, 128)
                    atlas_ref,             # VMEM (4, AH, AW) planar
                    fb_in_ref, fb_out_ref,  # VMEM (4, th, tw), aliased
                    sprites_ref, sem,      # scratch: VMEM rows + DMA sem
                    *, tile_h, tile_w, max_per_tile, ah, aw, bilinear,
                    batch, sample_dtype=jnp.float32):
    """Batched tile loop: each fori_loop step rasterizes `batch` sprites —
    coverage/uv math runs on (batch*th, tw) stacked blocks and the
    bilinear row pass is four (batch*th, AH)@(AH, AW) MXU matmuls shared
    by every sprite in the block; only the column pass and the
    (order-dependent) blend walk the batch. ~batch× fewer serial VPU ops
    per sprite than the scalar loop — the sprite raster is
    issue-latency-bound, not FLOP-bound (see pallas_guide.md).

    Everything stays strictly 2D: per-sprite scalars are expanded to row
    blocks with one-hot expansion MATMULS (E: (R,B), F: (B*AW,B)) instead
    of broadcast+reshape — Mosaic rejects shape casts that split or merge
    the lane dimension."""
    i = pl.program_id(0)
    j = pl.program_id(1)
    ntx = pl.num_programs(1)
    t = i * ntx + j
    cnt = counts_ref[t]

    dma = pltpu.make_async_copy(tile_table_ref.at[t], sprites_ref, sem)
    dma.start()

    B = batch
    R = B * tile_h

    def fiota(shape, dim):
        return jax.lax.broadcasted_iota(jnp.int32, shape, dim).astype(jnp.float32)

    def iiota(shape, dim):
        return jax.lax.broadcasted_iota(jnp.int32, shape, dim)

    # pixel coords per stacked row block: rows r → sprite r//th, tile row
    # r%th; columns are the tile's pixel columns (row-invariant)
    rrow = iiota((R, 1), 0)
    rsprite = rrow // tile_h                       # (R,1) sprite lane
    pxb = fiota((R, tile_w), 1) + (j * tile_w).astype(jnp.float32) + 0.5
    pyb = (rrow - rsprite * tile_h).astype(jnp.float32) + \
        (i * tile_h).astype(jnp.float32) + 0.5     # (R,1)
    col_x = pxb[0:1, :]                            # (1, tw)
    ky = fiota((R, ah), 1)                         # atlas row ids
    # per-block atlas column ids: kx[r] = r % aw over B stacked aw-blocks
    kxr = iiota((B * aw, tile_w), 0)
    kx = (kxr - (kxr // aw) * aw).astype(jnp.float32)
    # one-hot expansion matrices (constant, hoisted out of the loop):
    # E (R,B): E[r,b]=1 iff r//th==b   — rep(v) = E @ v for (B,1) scalars
    # F (BAW,B): F[r,b]=1 iff r//aw==b — expands (B,tw) rows to aw-blocks
    # S (B,BAW): S = Fᵀ                — per-sprite column-weight sums
    E = (rsprite == iiota((R, B), 1)).astype(jnp.float32)
    F = ((iiota((B * aw, B), 0) // aw) == iiota((B * aw, B), 1)) \
        .astype(jnp.float32)
    S = ((iiota((B, B * aw), 1) // aw) == iiota((B, B * aw), 0)) \
        .astype(jnp.float32)
    # stacked slot k holds draw-order bitrev(k) (table rows are permuted
    # to match — see dispatch): the halves-pairing over-composite tree
    # then reduces in exact back-to-front order.
    nbits = max(B - 1, 1).bit_length()
    rdraw = jnp.zeros_like(rsprite)
    for bit in range(nbits):
        rdraw = rdraw | (((rsprite >> bit) & 1) << (nbits - 1 - bit))

    dma.wait()

    def body(carry):
        # blocks are traversed front-to-back (block nblk-1-s_ first) with
        # under-compositing, so the loop exits early once every pixel in
        # the tile saturates to exactly-opaque — the win under extreme
        # overlap (bevymark's spawn-corner fan) where hot tiles hold
        # hundreds of sprites whose opaque cores cover the tile within a
        # few blocks.
        s_, apr, apg, apb, apa = carry
        s = nblk - 1 - s_
        sp = sprites_ref[pl.ds(s * B, B), :]           # (B, 128)
        rp = jnp.dot(E, sp, preferred_element_type=jnp.float32)  # (R, 128)

        def col(k):
            return sp[:, k:k + 1]                      # (B, 1)

        def rep(k):
            return rp[:, k:k + 1]                      # (R, 1)

        valid = (rdraw + s * B) < cnt                  # (R,1)
        dx = pxb - rep(0)
        dy = pyb - rep(1)                              # (R,1)
        lx = rep(4) * dx + rep(5) * dy
        ly = -rep(5) * dx + rep(4) * dy
        inside = (jnp.abs(lx) <= rep(2)) & (jnp.abs(ly) <= rep(3)) & valid

        # row (v) weights for ALL sprites: four matmuls serve every
        # sprite in the block
        inv2hy = 1.0 / jnp.maximum(2.0 * rep(3), 1e-6)
        v0, v1 = rep(11), rep(13)
        vv = (pyb - rep(1)) * inv2hy + 0.5             # (R,1)
        fy = jnp.clip(v0 + vv * (v1 - v0), jnp.minimum(v0, v1),
                      jnp.maximum(v0, v1)) * ah - 0.5
        if bilinear:
            wy = jnp.maximum(0.0, 1.0 - jnp.abs(ky - fy))          # (R, AH)
        else:
            wy = (jnp.abs(ky - fy) <= 0.5).astype(jnp.float32)
        wy = wy / jnp.maximum(jnp.sum(wy, axis=1, keepdims=True), 1e-6)
        # sample_dtype=bf16 halves/quarters the MXU cost of the sampling
        # matmuls; weights/texels are 8-bit-image-scale data, so bf16's 8
        # mantissa bits are at the GPU texture-filter precision class
        wy_s = wy.astype(sample_dtype)
        t1 = [jnp.dot(wy_s, atlas_ref[c].astype(sample_dtype),
                      preferred_element_type=jnp.float32)          # (R, AW)
              for c in range(4)]

        # column (u) weights: batched build, normalize via S-matmul sums
        u0b, u1b = col(10), col(12)
        inv2hx = 1.0 / jnp.maximum(2.0 * col(2), 1e-6)  # (B,1)
        uu = (col_x - col(0)) * inv2hx + 0.5           # (B, tw)
        fx = jnp.clip(u0b + uu * (u1b - u0b), jnp.minimum(u0b, u1b),
                      jnp.maximum(u0b, u1b)) * aw - 0.5
        fx_all = jnp.dot(F, fx, preferred_element_type=jnp.float32)
        if bilinear:
            wx = jnp.maximum(0.0, 1.0 - jnp.abs(kx - fx_all))      # (BAW, tw)
        else:
            wx = (jnp.abs(kx - fx_all) < 0.5).astype(jnp.float32)
        norm = jnp.maximum(jnp.dot(S, wx, preferred_element_type=jnp.float32),
                           1e-6)                       # (B, tw)

        # column pass for ALL sprites at once: place each sprite's t1
        # rows into its own aw-column block (static masked concat — no
        # dynamic lane shifts on TPU), then ONE (R, B*aw)@(B*aw, tw)
        # matmul per channel computes every sprite's texture block.
        # Replaces 4*B small per-sprite matmuls with 4 MXU-sized ones.
        nrm_inv = jnp.dot(E, 1.0 / norm,
                          preferred_element_type=jnp.float32)  # (R, tw)
        wx_s = wx.astype(sample_dtype)
        texs = []
        for c in range(4):
            blkdiag = jnp.concatenate(
                [jnp.where(rsprite == k, t1[c].astype(sample_dtype),
                           jnp.zeros((), sample_dtype))
                 for k in range(B)], axis=1)           # (R, B*aw)
            tc = jnp.dot(blkdiag, wx_s,
                         preferred_element_type=jnp.float32) * nrm_inv
            texs.append(jnp.where(rp[:, 14:15] >= 0.0, tc, 1.0))
        # premultiplied over-composite is ASSOCIATIVE: tree-reduce the B
        # stacked (th,tw) layers instead of a serial walk. Layer k over
        # layer j (k in front): C = Ck + (1-Ak)Cj, A = Ak + (1-Ak)Aj.
        # Stacking keeps everything (R,tw)-vectorized per level.
        av = jnp.where(inside, texs[3] * rp[:, 9:10], 0.0)     # (R, tw)
        pr = texs[0] * rp[:, 6:7] * av
        pg = texs[1] * rp[:, 7:8] * av
        pb = texs[2] * rp[:, 8:9] * av
        n_lay = B
        while n_lay > 1:
            h = n_lay // 2 * tile_h
            # front = later half of each adjacent pair (higher k drawn
            # later = in front under back-to-front z order)
            fr_a, fr_r = av[h:n_lay * tile_h], pr[h:n_lay * tile_h]
            fr_g, fr_b = pg[h:n_lay * tile_h], pb[h:n_lay * tile_h]
            bk_a, bk_r = av[:h], pr[:h]
            bk_g, bk_b = pg[:h], pb[:h]
            ia = 1.0 - fr_a
            av = fr_a + ia * bk_a
            pr = fr_r + ia * bk_r
            pg = fr_g + ia * bk_g
            pb = fr_b + ia * bk_b
            n_lay //= 2
        # under-composite this block BEHIND the accumulated front layers
        t_ = 1.0 - apa
        return (s_ + 1, apr + t_ * pr[:tile_h], apg + t_ * pg[:tile_h],
                apb + t_ * pb[:tile_h], apa + t_ * av[:tile_h])

    def not_opaque(carry):
        s_, _, _, _, apa = carry
        # exact-saturation exit: skipped blocks are scaled by T == 0, so
        # the image is identical to the full walk
        return (s_ < nblk) & (jnp.min(apa) < 1.0)

    nblk = (cnt + B - 1) // B
    z0 = jnp.zeros((tile_h, tile_w), jnp.float32)
    _, apr, apg, apb, apa = jax.lax.while_loop(
        not_opaque, body, (jnp.int32(0), z0, z0, z0, z0))
    ia = 1.0 - apa
    fb_out_ref[0] = fb_in_ref[0] * ia + apr
    fb_out_ref[1] = fb_in_ref[1] * ia + apg
    fb_out_ref[2] = fb_in_ref[2] * ia + apb
    fb_out_ref[3] = fb_in_ref[3] * ia + apa


@partial(jax.jit, static_argnames=(
    "tile_h", "tile_w", "pairs_per_sprite", "max_per_tile", "max_visible",
    "bilinear", "interpret", "sprite_batch", "sample_dtype"))
def raster_sprites_pallas(fb_planar, packed, atlas_planar, *, tile_h=32,
                          tile_w=128, pairs_per_sprite=4, max_per_tile=256,
                          max_visible=None, bilinear=True, interpret=False,
                          sprite_batch=8, sample_dtype="f32"):
    """fb_planar (4, H, W) linear RGBA planes; atlas_planar (4, AH, AW);
    packed (N, 17) from ops.raster2d.pack_sprite_instances.
    Returns (fb_planar, stats)."""
    _, H, W = fb_planar.shape
    n = packed.shape[0]
    v = min(max_visible or n, n)
    max_per_tile = _pad_to(max_per_tile, 128)  # lane-aligned DMA slices
    hp, wp = _pad_to(H, tile_h), _pad_to(W, tile_w)
    nty, ntx = hp // tile_h, wp // tile_w
    num_tiles = nty * ntx
    ah, aw = int(atlas_planar.shape[1]), int(atlas_planar.shape[2])

    # ---- 1. cull + z-sort + compact (all shapes below scale with v) ----
    center = packed[:, 0:2]
    half = packed[:, 2:4]
    cs, sn = packed[:, 4], packed[:, 5]
    z = packed[:, 15]
    active = packed[:, 16] > 0.5
    rx = jnp.abs(cs) * half[:, 0] + jnp.abs(sn) * half[:, 1]
    ry = jnp.abs(sn) * half[:, 0] + jnp.abs(cs) * half[:, 1]
    onscreen = (center[:, 0] + rx > 0) & (center[:, 0] - rx < wp) & \
               (center[:, 1] + ry > 0) & (center[:, 1] - ry < hp) & \
               (half[:, 0] > 0) & (half[:, 1] > 0) & active
    n_visible = jnp.sum(onscreen.astype(jnp.int32))
    if v < n:
        # compact visible rows first (sort-free cumsum scatter), THEN
        # z-sort the v-budget — the sort shrinks from capacity to budget
        # (ties keep spawn order: both paths are stable in original index)
        pos = jnp.cumsum(onscreen.astype(jnp.int32)) - 1
        tgt = jnp.where(onscreen & (pos < v), pos, v)
        cand = jnp.zeros(v + 1, jnp.int32).at[tgt].set(
            jnp.arange(n, dtype=jnp.int32), mode="drop")[:v]
        cvalid = jnp.arange(v, dtype=jnp.int32) < n_visible
        zc = jnp.where(cvalid, z[cand], jnp.inf)
        # sort carries its payloads (1-D gathers run on the scalar core
        # — see ops/shade_pallas.bin_lights)
        _, order, visi = jax.lax.sort(
            (zc, cand, cvalid.astype(jnp.int32)), dimension=0,
            is_stable=True, num_keys=1)
        vis = visi > 0
    else:
        zkey = jnp.where(onscreen, z, jnp.inf)
        _, order, visi = jax.lax.sort(
            (zkey, jnp.arange(n, dtype=jnp.int32),
             onscreen.astype(jnp.int32)), dimension=0,
            is_stable=True, num_keys=1)
        order = order[:v]
        vis = visi[:v] > 0
    pk = packed[order]                      # (v, 17) visible, back-to-front

    # ---- 2. pair expansion + one stable sort by tile ----
    # (a sort-free chunked-scatter binning was tried and measured SLOWER
    # on TPU — XLA row scatters copy the table per chunk; the window-
    # splat path in ops/raster2d_splat.py is the sort-free design)
    cso, sno = pk[:, 4], pk[:, 5]
    rxo = jnp.abs(cso) * pk[:, 2] + jnp.abs(sno) * pk[:, 3]
    ryo = jnp.abs(sno) * pk[:, 2] + jnp.abs(cso) * pk[:, 3]
    x0 = jnp.floor((pk[:, 0] - rxo) / tile_w).astype(jnp.int32)
    x1 = jnp.floor((pk[:, 0] + rxo) / tile_w).astype(jnp.int32)
    y0 = jnp.floor((pk[:, 1] - ryo) / tile_h).astype(jnp.int32)
    y1 = jnp.floor((pk[:, 1] + ryo) / tile_h).astype(jnp.int32)
    x0, x1 = jnp.clip(x0, 0, ntx - 1), jnp.clip(x1, 0, ntx - 1)
    y0, y1 = jnp.clip(y0, 0, nty - 1), jnp.clip(y1, 0, nty - 1)
    kx, ky = x1 - x0 + 1, y1 - y0 + 1
    counts = jnp.where(vis, kx * ky, 0)
    pair_cap = v * pairs_per_sprite + num_tiles
    owner, rank, valid, total = expand_runs(counts, pair_cap)
    # one packed ROW gather instead of three 1-D gathers
    zv = jnp.zeros_like(x0)
    spack = jnp.stack([x0, y0, jnp.maximum(kx, 1), zv, zv, zv, zv, zv],
                      axis=1)
    srow = spack[owner]
    tile_id = (srow[:, 1] + rank // srow[:, 2]) * ntx + \
        (srow[:, 0] + rank % srow[:, 2])
    tile_id = jnp.where(valid, tile_id, num_tiles)
    # stable tile sort carrying the sprite index payload
    sorted_tile, pair_sprite = jax.lax.sort(
        (tile_id, owner.astype(jnp.int32)), dimension=0, is_stable=True,
        num_keys=1)
    tids = jnp.arange(num_tiles, dtype=jnp.int32)
    starts = jnp.searchsorted(sorted_tile, tids, side="left").astype(jnp.int32)
    ends = jnp.searchsorted(sorted_tile, tids + 1, side="left").astype(jnp.int32)

    # ---- 3. fixed per-tile table; dim-0 slices are aligned for the DMA ----
    tile_counts = jnp.minimum(ends - starts, max_per_tile)
    # on overflow keep the FRONT-most max_per_tile sprites (the tail of the
    # back-to-front run) — dropping the front layers is visually worse
    starts = jnp.maximum(starts, ends - max_per_tile)
    batched = sprite_batch > 1
    if batched:
        # bit-reversed placement inside each batch group: the kernel's
        # halves-pairing composite tree then reduces in draw order
        nb = max(sprite_batch - 1, 1).bit_length()
        br = np.array([int(format(k, f"0{nb}b")[::-1], 2)
                       for k in range(sprite_batch)], np.int32)
        lanes = np.arange(max_per_tile, dtype=np.int32)
        offs = (lanes // sprite_batch) * sprite_batch + \
            br[lanes % sprite_batch]
        slot = starts[:, None] + jnp.asarray(offs)[None, :]
    else:
        slot = starts[:, None] + \
            jnp.arange(max_per_tile, dtype=jnp.int32)[None, :]
    slot = jnp.minimum(slot, pair_cap - 1)
    if batched:
        # rows = sprites so the kernel's per-block dynamic slice runs on
        # the (8-aligned) sublane dim — lane-dim starts must be 128-aligned;
        # the lane dim itself pads 17→128 because DMA minor dims must be
        # 128-multiples (≈12 MB/frame extra HBM traffic: negligible)
        tile_table = jnp.pad(pk[pair_sprite[slot]], ((0, 0), (0, 0), (0, 111)))
    else:
        tile_table = pk[pair_sprite[slot]].transpose(0, 2, 1)
        tile_table = jnp.pad(tile_table, ((0, 0), (0, 7), (0, 0)))

    fbp = jnp.pad(fb_planar, ((0, 0), (0, hp - H), (0, wp - W)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nty, ntx),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),      # tile_table
            pl.BlockSpec(memory_space=pltpu.VMEM),     # atlas (full)
            pl.BlockSpec((4, tile_h, tile_w), lambda i, j, *_: (0, i, j),
                         memory_space=pltpu.VMEM),     # fb in
        ],
        out_specs=pl.BlockSpec((4, tile_h, tile_w), lambda i, j, *_: (0, i, j),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            (pltpu.VMEM((max_per_tile, 128), jnp.float32) if batched
             else pltpu.SMEM((24, max_per_tile), jnp.float32)),
            pltpu.SemaphoreType.DMA,
        ],
    )
    if batched:
        kernel = partial(_kernel_batched, tile_h=tile_h, tile_w=tile_w,
                         max_per_tile=max_per_tile, ah=ah, aw=aw,
                         bilinear=bilinear, batch=sprite_batch,
                         sample_dtype=(jnp.bfloat16 if sample_dtype == "bf16"
                                       else jnp.float32))
    else:
        kernel = partial(_kernel, tile_h=tile_h, tile_w=tile_w,
                         max_per_tile=max_per_tile, ah=ah, aw=aw,
                         bilinear=bilinear)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((4, hp, wp), jnp.float32),
        input_output_aliases={3: 0},   # fb in → fb out (index incl. prefetch)
        interpret=interpret,
    )(tile_counts, tile_table, atlas_planar, fbp)

    stats = {
        "pair_overflow": jnp.maximum(total - pair_cap, 0),
        "tile_overflow": jnp.maximum(jnp.max(ends - starts) - max_per_tile, 0),
        "visible_overflow": jnp.maximum(n_visible - v, 0),
    }
    return out[:, :H, :W], stats
