"""Window-splat sprite rasterizer — the sort-free 2D fast path
(reference twin: the instanced alpha-blended sprite draw of
`bevy_sprite_render/src/render/mod.rs:442-499`, rethought the same way
as the 3D window-splat raster in ops/raster3d_splat.py).

Why a second pallas path: the tile-list kernel (ops/raster2d_pallas.py)
needs per-tile sprite lists, and building them costs a stable sort (or
TPU-hostile scatters) over the PAIR BUDGET every frame — measured ~18 ms
of the 34 ms bevymark frame at 30k live birds. Here there are NO tile
lists:

  1. cull + z-sort the visible budget (v ≪ pair budget), REVERSED to
     front-to-back order.
  2. each sprite expands to one window per overlapped (win_h-row x
     128-lane) framebuffer block — short sprites get one tight-y window,
     tall ones use the aligned band grid (same scheme as
     raster3d_splat.build_windows).
  3. ONE sequential-grid kernel streams per-window sprite records
     HBM→VMEM (double-buffered) and under-composites each window into a
     VMEM-resident premultiplied accumulation buffer:
         rgb += T * src_rgb * a;  a += T * a     (T = 1 - a_before)
     Sequential grid ⇒ the read-modify-write IS the z order. Since
     traversal is front-to-back, a window whose region has saturated to
     exactly-opaque alpha is skipped — bit-identical to the full walk
     (remaining layers scale by a transmittance of exactly 0), and the
     win under bevymark's spawn-corner overlap.
  4. the accumulation merges over the prior framebuffer content in one
     fused XLA elementwise (out = fb * (1 - acc_a) + acc_rgb).

The framebuffer accumulator lives in VMEM as (ncols, H, 128) per-channel
column-major planes (the raster3d composite layout). A full 1280x736x4ch
f32 buffer is ~15 MB — over the VMEM budget with scratch — so the screen
splits into `passes` COLUMN groups. Windows belong to exactly one column
(meta = col*2048 + y), so the window list is stable-sorted by column
group and each pass streams ONLY its own records — unlike a row split,
where every pass walks the full list to skip foreign windows (measured
~7 ms of wasted streaming on bevymark's sparse half).

Texture sampling is the tile kernel's separable form: bilinear tents
row/col weight matrices against the planar atlas (two small matmuls per
channel), optionally in bfloat16 (GPU texture-filter precision class).
Rotated *textured* sprites are not supported here (same rule as the
tile kernel) — callers use the XLA reference path.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bevy_tpu.ops.binning import expand_runs

WIN_W = 128
CHUNK = 32           # windows per record DMA: 32*32 fields = an aligned
                     # (8, 128) HBM slice per chunk (Mosaic requires the
                     # sliced sublane dim %8; 16 gave a (4,128) slice that
                     # the hardware compiler rejects)


def _splat_kernel(range_ref, meta_hbm, rec_hbm, atlas_ref,
                  r_out, g_out, b_out, a_out,
                  buf, mbuf, sem_a, sem_b, sem_ma, sem_mb,
                  *, win_h, ah, aw, bilinear, c_lo, n_cols, sample_dtype,
                  rotated, alpha_only):
    """One column-group pass: windows are pre-partitioned by column so
    every streamed record is composited (no skip-streaming). range_ref
    (3,): [w_lo, w_hi, chunk_base] — the pass's window range in the
    column-sorted list; one boundary chunk may be shared with the
    neighbouring pass. Outputs are (n_cols, H, 128) accumulation planes
    (premultiplied rgb + alpha), zeroed at kernel start. atlas_ref is
    channel-stacked (4*ah, aw) so stage-1 sampling is ONE matmul —
    or just the (ah, aw) alpha plane when alpha_only.

    Records stream HBM→SMEM (not VMEM): every per-window field read is
    a scalar, and ~15 scalar loads per window out of a VMEM tile were a
    dominant share of the per-window fixed cost (round-4 profile:
    17.1 ms of the 24.5 ms bevymark frame in these kernels).

    Static specializations (round 4, the per-window algebra cut):
    - rotated=False: coverage and the uv chain are separable — the
      row piece (1, 128) and column piece (win_h, 1) AND together in
      the blend, replacing ~5 full-block ops with rank-1 broadcasts.
    - alpha_only=True: the atlas' RGB planes are known ≡ 1 (tinted
      alpha-mask sprites, the bevymark bird class) — sampling drops to
      two small matmuls on the alpha plane and the blend multiplies
      the per-sprite color directly."""
    w_lo = range_ref[0]
    w_hi = range_ref[1]
    cbase = range_ref[2]
    hp = r_out.shape[1]
    zeros = jnp.zeros((n_cols, hp, WIN_W), jnp.float32)
    r_out[...] = zeros
    g_out[...] = zeros
    b_out[...] = zeros
    a_out[...] = zeros

    nch = (w_hi + CHUNK - 1) // CHUNK - cbase

    def issue(c, sem, msem):
        pltpu.make_async_copy(rec_hbm.at[cbase + c], buf.at[c % 2],
                              sem).start()
        pltpu.make_async_copy(meta_hbm.at[cbase + c], mbuf.at[c % 2],
                              msem).start()

    def wait(c, sem, msem):
        pltpu.make_async_copy(rec_hbm.at[0], buf.at[c % 2], sem).wait()
        pltpu.make_async_copy(meta_hbm.at[0], mbuf.at[c % 2], msem).wait()

    @pl.when(nch > 0)
    def _():
        issue(0, sem_a, sem_ma)

    iox = jax.lax.broadcasted_iota(jnp.int32, (1, WIN_W), 1)
    ioy = jax.lax.broadcasted_iota(jnp.int32, (win_h, 1), 0)
    ky = jax.lax.broadcasted_iota(
        jnp.int32, (win_h, ah), 1).astype(jnp.float32)
    kx = jax.lax.broadcasted_iota(
        jnp.int32, (aw, WIN_W), 0).astype(jnp.float32)

    def chunk(c, _):
        even = c % 2 == 0

        @pl.when((c + 1 < nch) & even)
        def _():
            issue(c + 1, sem_b, sem_mb)

        @pl.when((c + 1 < nch) & ~even)
        def _():
            issue(c + 1, sem_a, sem_ma)

        # STATIC buffer-slot indices only (the raster3d Mosaic lesson)
        def process(half, c):
            for k in range(CHUNK):
                w = (cbase + c) * CHUNK + k
                m = mbuf[half, k]
                colk = m // 2048 - c_lo
                y0l = m % 2048

                @pl.when((w >= w_lo) & (w < w_hi))
                def _():
                    def d(j, _k=k):
                        f = _k * 32 + j
                        return buf[half, f // WIN_W, f % WIN_W]

                    a_cur = a_out[colk, pl.ds(y0l, win_h), :]
                    cx, cy = d(0), d(1)
                    hx, hy = d(2), d(3)
                    px = (iox + (colk + c_lo) * WIN_W
                          ).astype(jnp.float32) + 0.5
                    py = (ioy + y0l).astype(jnp.float32) + 0.5
                    if rotated:
                        cos, sin = d(4), d(5)
                        # rotated coverage as row+col affine pieces: the
                        # full-block work is one broadcast-add per edge
                        lxr = cos * px - (cos * cx + sin * cy)  # (1, 128)
                        lyr = -sin * px + (sin * cx - cos * cy)
                        lx = lxr + sin * py                 # (win_h, 128)
                        ly = lyr + cos * py
                        inside = (jnp.abs(lx) <= hx) & (jnp.abs(ly) <= hy)
                        masked = jnp.where(inside, a_cur, 1.0)
                        lx_row = lx[0:1, :]
                        ly_col = ly[:, 0:1]
                    else:
                        # axis-aligned: coverage is separable — row and
                        # column masks AND in the blend as rank-1 pieces
                        lx_row = px - cx                    # (1, 128)
                        ly_col = py - cy                    # (win_h, 1)
                        rowm = jnp.abs(lx_row) <= hx
                        colm = jnp.abs(ly_col) <= hy
                        masked = jnp.where(rowm & colm, a_cur, 1.0)

                    # exact-saturation skip, tested over the SPRITE'S
                    # covered pixels only (layers behind an opaque region
                    # are scaled by T == 0): at bevymark steady-state
                    # overdraw (~30x) a sprite's own footprint saturates
                    # far sooner than the whole (win_h, 128) block, so
                    # hoisting the cheap coverage test above the gate
                    # trades ~8 block-ops for skipping the sampling
                    # matmuls + blend of every buried sprite
                    @pl.when(jnp.min(masked) < 1.0)
                    def _():

                        # bilinear tents with the uv chain folded into the
                        # tap coordinate: f = a*l + b (affine in the local
                        # coordinate), clamped to the sprite's atlas rect
                        u0, v0, u1, v1 = d(10), d(11), d(12), d(13)
                        sx = (u1 - u0) / jnp.maximum(2.0 * hx, 1e-6)
                        sy = (v1 - v0) / jnp.maximum(2.0 * hy, 1e-6)
                        fx = (u0 + (u1 - u0) * 0.5 + sx * lx_row)
                        fx = jnp.clip(fx, jnp.minimum(u0, u1),
                                      jnp.maximum(u0, u1)) * aw - 0.5
                        fy = (v0 + (v1 - v0) * 0.5 + sy * ly_col)
                        fy = jnp.clip(fy, jnp.minimum(v0, v1),
                                      jnp.maximum(v0, v1)) * ah - 0.5
                        if bilinear:
                            wy = jnp.maximum(0.0, 1.0 - jnp.abs(ky - fy))
                            wx = jnp.maximum(0.0, 1.0 - jnp.abs(kx - fx))
                        else:
                            wy = (jnp.abs(ky - fy) <= 0.5).astype(jnp.float32)
                            wx = (jnp.abs(kx - fx) < 0.5).astype(jnp.float32)
                        wy = wy / jnp.maximum(
                            jnp.sum(wy, axis=1, keepdims=True), 1e-6)
                        wx = wx / jnp.maximum(
                            jnp.sum(wx, axis=0, keepdims=True), 1e-6)
                        textured = d(14) >= 0.0
                        if alpha_only:
                            # atlas RGB ≡ 1: sample the alpha plane only
                            mid = jnp.dot(
                                atlas_ref[...].astype(sample_dtype),
                                wx.astype(sample_dtype),
                                preferred_element_type=jnp.float32)
                            ta = jnp.dot(
                                wy.astype(sample_dtype),
                                mid.astype(sample_dtype),
                                preferred_element_type=jnp.float32)
                            ta = jnp.where(textured, ta, 1.0)
                            tr = tg = tb = None
                        else:
                            # stage 1 — one channel-stacked matmul:
                            # (4*ah, aw) @ (aw, 128); stage 2 — four
                            # independent (win_h, ah) @ (ah, 128) slices.
                            # (A single block-diagonal stage-2 matmul was
                            # tried and measured SLOWER: 27.7 → 30.1 ms —
                            # the blockdiag build + the 4x-M matmul cost
                            # more than the small-matmul latency they hide)
                            mid = jnp.dot(
                                atlas_ref[...].astype(sample_dtype),
                                wx.astype(sample_dtype),
                                preferred_element_type=jnp.float32)
                            mid_s = mid.astype(sample_dtype)
                            wy_s = wy.astype(sample_dtype)
                            texs = [jnp.dot(
                                wy_s, mid_s[ch * ah:(ch + 1) * ah],
                                preferred_element_type=jnp.float32)
                                for ch in range(4)]
                            one = jnp.ones((win_h, WIN_W), jnp.float32)
                            tr = jnp.where(textured, texs[0], one)
                            tg = jnp.where(textured, texs[1], one)
                            tb = jnp.where(textured, texs[2], one)
                            ta = jnp.where(textured, texs[3], one)

                        if rotated:
                            av = jnp.where(inside, ta * d(9), 0.0)
                        else:
                            # rank-1 coverage: alpha on the row, mask on
                            # the column; their product is the only
                            # full-block op
                            avr = jnp.where(rowm, d(9), 0.0)    # (1, 128)
                            avc = jnp.where(colm, 1.0, 0.0)     # (win_h, 1)
                            av = ta * (avc * avr)
                        t_ = 1.0 - a_cur
                        tav = t_ * av
                        sl = (colk, pl.ds(y0l, win_h), slice(None))
                        if alpha_only:
                            r_out[sl] = r_out[sl] + d(6) * tav
                            g_out[sl] = g_out[sl] + d(7) * tav
                            b_out[sl] = b_out[sl] + d(8) * tav
                        else:
                            r_out[sl] = r_out[sl] + tr * d(6) * tav
                            g_out[sl] = g_out[sl] + tg * d(7) * tav
                            b_out[sl] = b_out[sl] + tb * d(8) * tav
                        a_out[sl] = a_cur + tav

        @pl.when(even)
        def _():
            wait(c, sem_a, sem_ma)
            process(0, c)

        @pl.when(~even)
        def _():
            wait(c, sem_b, sem_mb)
            process(1, c)
        return 0

    jax.lax.fori_loop(0, nch, chunk, 0)


@partial(jax.jit, static_argnames=(
    "win_h", "windows_per_sprite", "max_visible", "bilinear", "interpret",
    "sample_dtype", "passes", "rotated", "alpha_only"))
def raster_sprites_splat(fb_planar, packed, atlas_planar, *, win_h=40,
                         windows_per_sprite=3, max_visible=None,
                         bilinear=True, interpret=False, sample_dtype="f32",
                         passes=2, rotated=True, alpha_only=False):
    """fb_planar (4, H, W) linear RGBA planes; atlas_planar (4, AH, AW);
    packed (N, 17) from ops.raster2d.pack_sprite_instances.
    Returns (fb_planar, stats).

    rotated=False (static): the caller guarantees no sprite carries a
    rotation — the kernel drops to separable row/col coverage.
    alpha_only=True (static): the caller guarantees the atlas RGB planes
    are all ones (tinted alpha-mask sprites) — sampling uses only the
    alpha plane. Both are SpritePlugin knobs."""
    _, H, W0 = fb_planar.shape
    n = packed.shape[0]
    v = min(max_visible or n, n)
    ncols = (W0 + WIN_W - 1) // WIN_W
    W = ncols * WIN_W
    hp = (H + win_h - 1) // win_h * win_h
    nbands = hp // win_h
    ah, aw = int(atlas_planar.shape[1]), int(atlas_planar.shape[2])

    # ---- 1. cull + z-sort + compact, REVERSED to front-to-back ----
    center = packed[:, 0:2]
    half = packed[:, 2:4]
    cs, sn = packed[:, 4], packed[:, 5]
    z = packed[:, 15]
    active = packed[:, 16] > 0.5
    rx = jnp.abs(cs) * half[:, 0] + jnp.abs(sn) * half[:, 1]
    ry = jnp.abs(sn) * half[:, 0] + jnp.abs(cs) * half[:, 1]
    onscreen = (center[:, 0] + rx > 0) & (center[:, 0] - rx < W) & \
               (center[:, 1] + ry > 0) & (center[:, 1] - ry < hp) & \
               (half[:, 0] > 0) & (half[:, 1] > 0) & active
    n_visible = jnp.sum(onscreen.astype(jnp.int32))
    if v < n:
        pos = jnp.cumsum(onscreen.astype(jnp.int32)) - 1
        tgt = jnp.where(onscreen & (pos < v), pos, v)
        cand = jnp.zeros(v + 1, jnp.int32).at[tgt].set(
            jnp.arange(n, dtype=jnp.int32), mode="drop")[:v]
        cvalid = jnp.arange(v, dtype=jnp.int32) < n_visible
        zc = jnp.where(cvalid, z[cand], jnp.inf)
        # sort carries payloads (1-D gathers run on the scalar core —
        # see ops/shade_pallas.bin_lights)
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
    # reverse the stable back-to-front order: exact front-to-back with
    # equal-z ties still resolving later-spawned-on-top
    order = order[::-1]
    vis = vis[::-1]
    pk = packed[order]                      # (v, 17) front-to-back

    # ---- 2. window expansion (one per overlapped block) ----
    cso, sno = pk[:, 4], pk[:, 5]
    rxo = jnp.abs(cso) * pk[:, 2] + jnp.abs(sno) * pk[:, 3]
    ryo = jnp.abs(sno) * pk[:, 2] + jnp.abs(cso) * pk[:, 3]
    x0 = pk[:, 0] - rxo
    x1 = pk[:, 0] + rxo
    y0 = pk[:, 1] - ryo
    y1 = pk[:, 1] + ryo
    c0 = jnp.clip(jnp.floor(x0 / WIN_W).astype(jnp.int32), 0, ncols - 1)
    c1 = jnp.clip(jnp.floor((x1 - 1e-3) / WIN_W).astype(jnp.int32),
                  0, ncols - 1)
    b0 = jnp.clip(jnp.floor(y0 / win_h).astype(jnp.int32), 0, nbands - 1)
    b1 = jnp.clip(jnp.floor((y1 - 1e-3) / win_h).astype(jnp.int32),
                  0, nbands - 1)
    nbx = c1 - c0 + 1
    # tight windows 8-align down (fast sublane access); covered pixel
    # rows span <= (y1-y0)+1, so alignment slack of 7 fits win_h - 8
    single_band = (y1 - y0) <= (win_h - 8.0)
    nby = jnp.where(single_band, 1, b1 - b0 + 1)
    counts = jnp.where(vis, nbx * nby, 0)
    wcap = v * windows_per_sprite + 8
    wcap = (wcap + CHUNK - 1) // CHUNK * CHUNK
    owner, rank, wvalid, total = expand_runs(counts, wcap)
    tight_y = jnp.clip(jnp.floor(y0).astype(jnp.int32) & ~7, 0,
                       max(hp - win_h, 0))
    ybase = jnp.where(single_band, tight_y, b0 * win_h)
    # ONE packed per-sprite code gather (budget-sized gathers dominate
    # expansion cost): y (11b) | c0 (10b) | nbx (5b)
    # packed per-sprite expansion data, ONE row gather (1-D int32
    # gathers run on the scalar core — see ops/shade_pallas.bin_lights)
    z8 = jnp.zeros_like(c0)
    sprite_pack = jnp.stack([ybase, c0, jnp.maximum(nbx, 1),
                             z8, z8, z8, z8, z8], axis=1)     # (v, 8)
    srow = sprite_pack[owner]                                 # (wcap, 8)
    yo, c0o, nbxo = srow[:, 0], srow[:, 1], srow[:, 2]
    col = jnp.clip(c0o + rank % nbxo, 0, ncols - 1)
    wy_ = jnp.clip(yo + (rank // nbxo) * win_h, 0, max(hp - win_h, 0))
    meta = (col * 2048 + wy_).astype(jnp.int32)

    # ---- 3. partition windows by column group (each window belongs to
    # exactly ONE pass — passes stream only their own records, unlike a
    # row split where every pass walks the full list) then build records
    # in partitioned order. The sort key carries z order within each
    # group (stable) and pushes invalid windows past every group. ----
    n_passes = min(passes, ncols)
    cols_pp = (ncols + n_passes - 1) // n_passes
    group = jnp.where(wvalid, col // cols_pp, n_passes).astype(jnp.int32)
    group_s, meta_s, owner_s = jax.lax.sort(
        (group, meta, owner.astype(jnp.int32)), dimension=0,
        is_stable=True, num_keys=1)
    recw = jnp.pad(pk, ((0, 0), (0, 15)))[owner_s]      # (wcap, 32)
    # per-chunk record blocks (8, 128): the kernel DMAs them into SMEM,
    # where the ~15 per-window field reads are cheap scalar loads
    rec_chunks = recw.reshape(wcap // CHUNK, CHUNK * 32 // WIN_W, WIN_W)
    mo = meta_s.reshape(wcap // CHUNK, CHUNK)
    meta_chunks = jnp.pad(mo, ((0, 0), (0, WIN_W - CHUNK)))
    pids = jnp.arange(n_passes + 1, dtype=jnp.int32)
    bounds = jnp.searchsorted(group_s, pids, side="left").astype(jnp.int32)

    # ---- 4. column-group passes ----
    sdt = jnp.bfloat16 if sample_dtype == "bf16" else jnp.float32
    atlas_stacked = atlas_planar[3] if alpha_only \
        else atlas_planar.reshape(4 * ah, aw)
    accs = []
    for p in range(n_passes):
        c_lo = p * cols_pp
        n_cols = min(cols_pp, ncols - c_lo)
        if n_cols <= 0:
            break
        w_lo = bounds[p]
        w_hi = bounds[p + 1]
        rng = jnp.stack([w_lo, w_hi, w_lo // CHUNK]).astype(jnp.int32)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(1,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.HBM),    # meta chunks
                # records pinned to HBM: under ANY the 12.6 MB table
                # fits VMEM and Mosaic then rejects the (1, 512) row
                # slice for the SMEM-bound DMA (sublane tiling)
                pl.BlockSpec(memory_space=pltpu.HBM),    # record chunks
                pl.BlockSpec(memory_space=pltpu.VMEM),   # atlas (stacked)
            ],
            out_specs=[
                pl.BlockSpec((n_cols, hp, WIN_W), lambda *_: (0, 0, 0),
                             memory_space=pltpu.VMEM)] * 4,
            scratch_shapes=[
                pltpu.SMEM((2, CHUNK * 32 // WIN_W, WIN_W), jnp.float32),
                pltpu.SMEM((2, WIN_W), jnp.int32),
                pltpu.SemaphoreType.DMA,
                pltpu.SemaphoreType.DMA,
                pltpu.SemaphoreType.DMA,
                pltpu.SemaphoreType.DMA,
            ],
        )
        out = pl.pallas_call(
            partial(_splat_kernel, win_h=win_h, ah=ah, aw=aw,
                    bilinear=bilinear, c_lo=c_lo, n_cols=n_cols,
                    sample_dtype=sdt, rotated=rotated,
                    alpha_only=alpha_only),
            grid_spec=grid_spec,
            out_shape=[jax.ShapeDtypeStruct((n_cols, hp, WIN_W), jnp.float32)
                       ] * 4,
            interpret=interpret,
        )(rng, meta_chunks, rec_chunks, atlas_stacked)
        accs.append(out)

    acc = [jnp.concatenate([a[i] for a in accs], axis=0) for i in range(4)]
    # (ncols, hp, 128) column planes → (hp, W) rows
    acc = [a.transpose(1, 0, 2).reshape(hp, W)[:H, :W0] for a in acc]
    ia = 1.0 - acc[3]
    out_fb = jnp.stack([
        fb_planar[0] * ia + acc[0],
        fb_planar[1] * ia + acc[1],
        fb_planar[2] * ia + acc[2],
        fb_planar[3] * ia + acc[3],
    ], 0)
    stats = {
        "pair_overflow": jnp.maximum(total - wcap, 0),
        "tile_overflow": jnp.asarray(0, jnp.int32),
        "visible_overflow": jnp.maximum(n_visible - v, 0),
    }
    return out_fb, stats
