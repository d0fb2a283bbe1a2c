"""Deferred shading with tile-binned point lights (reference twin: the
clustered-forward light binning `bevy_light/src/cluster/assign.rs:133` +
per-fragment light loop `clustered_forward.wesl` / `pbr_lighting.wesl`,
re-shaped as bevy's deferred path `bevy_core_pipeline/src/deferred/`:
G-buffer → per-tile light lists → one shade kernel).

Light clusters align with raster tiles (2D tiled light culling); the shade
kernel reconstructs world position from reverse-z depth + the inverse
view-projection, then walks the tile's light list in SMEM. Distance
attenuation matches the reference's smooth inverse-square window
(getDistanceAttenuation, pbr_lighting.wesl):
    atten = saturate(1 - (d²/r²)²)² / (d² + 1)
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


LF = 16  # base light record (point/spot): x y z  r g b  range  pad |
         # dir xyz  cos_outer  inv(cos_inner - cos_outer)  pad  flag  —
         # point lights use the sentinel cos_outer=-2, inv=1 so the cone
         # term clips to 1; slot 15 is the rect-light flag. Worlds with
         # RectLight rows widen records to 24 fields: 16:19 u-axis,
         # 19:22 v-axis, 22/23 half extents (see deferred.py:102).


def _pad_to(x, m):
    return (x + m - 1) // m * m


def bin_lights(pos_view_z, center_px, radius_px, active, nty, ntx,
               tile_h, tile_w, pairs_per_light, max_per_tile, records):
    """Tile-bin point lights by conservative screen AABB. records (L, 8)
    rows are pre-packed [x y z  r g b  range  pad] (world space, color
    premultiplied by intensity). Returns (tile_table, counts, stats).

    TPU layout note: every per-pair lookup is a 2-D ROW gather from a
    packed (L, 8) table, and the tile sort carries its payload through
    `lax.sort` variadic operands — flat 1-D int32 gathers run on the
    scalar core and measured 3-10 ms EACH at 524k pairs (r3 xplane),
    ~10x slower per element than the row-gather path."""
    num_tiles = nty * ntx
    l = records.shape[0]
    x0 = jnp.floor((center_px[:, 0] - radius_px) / tile_w).astype(jnp.int32)
    x1 = jnp.floor((center_px[:, 0] + radius_px) / tile_w).astype(jnp.int32)
    y0 = jnp.floor((center_px[:, 1] - radius_px) / tile_h).astype(jnp.int32)
    y1 = jnp.floor((center_px[:, 1] + radius_px) / tile_h).astype(jnp.int32)
    onscreen = (x1 >= 0) & (x0 < ntx) & (y1 >= 0) & (y0 < nty) & active
    x0, x1 = jnp.clip(x0, 0, ntx - 1), jnp.clip(x1, 0, ntx - 1)
    y0, y1 = jnp.clip(y0, 0, nty - 1), jnp.clip(y1, 0, nty - 1)
    kx, ky = x1 - x0 + 1, y1 - y0 + 1
    counts = jnp.where(onscreen, kx * ky, 0)
    pair_cap = l * pairs_per_light + num_tiles
    ends_l = jnp.cumsum(counts)
    starts_l = ends_l - counts
    total = ends_l[-1]
    pos = jnp.arange(pair_cap, dtype=jnp.int32)
    # owner via scatter + cummax (see expand_runs)
    mark_at = jnp.where(counts > 0, starts_l, pair_cap)
    mark = jnp.full(pair_cap, -1, jnp.int32).at[mark_at].max(
        jnp.arange(l, dtype=jnp.int32), mode="drop")
    owner = jnp.clip(jax.lax.cummax(mark), 0, l - 1)
    # one row gather for ALL per-light pair data (8-wide for the fast path)
    packed = jnp.stack(
        [x0, y0, jnp.maximum(kx, 1), starts_l,
         jnp.arange(l, dtype=jnp.int32), jnp.zeros_like(x0),
         jnp.zeros_like(x0), jnp.zeros_like(x0)], axis=1)   # (L, 8)
    prow = packed[owner]                                    # (P, 8)
    rank = pos - prow[:, 3]
    kxo = prow[:, 2]
    tile_id = (prow[:, 1] + rank // kxo) * ntx + (prow[:, 0] + rank % kxo)
    pvalid = pos < jnp.minimum(total, pair_cap)
    tile_id = jnp.where(pvalid, tile_id, num_tiles)
    # sort pairs by tile, carrying the light index as a payload operand
    sorted_tile, pair_light = jax.lax.sort(
        (tile_id, prow[:, 4]), dimension=0, is_stable=True, num_keys=1)
    tids = jnp.arange(num_tiles, dtype=jnp.int32)
    starts = jnp.searchsorted(sorted_tile, tids, side="left").astype(jnp.int32)
    ends = jnp.searchsorted(sorted_tile, tids + 1, side="left").astype(jnp.int32)
    tile_counts = jnp.minimum(ends - starts, max_per_tile)
    slot = starts[:, None] + jnp.arange(max_per_tile, dtype=jnp.int32)[None, :]
    slot = jnp.minimum(slot, pair_cap - 1)
    # (r5 A/B: widening this 1-wide index gather to an 8-lane row table
    # — tile + row-gather + lane slice — measured WORSE, 16.8 → 17.2 ms:
    # the 306k x 8 tile materialization exceeds the gather saving)
    table = records[pair_light[slot]].transpose(0, 2, 1)   # (T, 8, mpt)
    stats = {"light_pair_overflow": jnp.maximum(total - pair_cap, 0),
             "light_tile_overflow": jnp.maximum(
                 jnp.max(ends - starts) - max_per_tile, 0)}
    return table, tile_counts, stats


def _shade_kernel(counts_ref, params_ref,
                  light_table_ref,
                  gbuf_ref, dep_ref, shadow_ref,
                  col_out_ref,
                  lights_ref, sem, acc_ref,
                  *, tile_h, tile_w, max_per_tile, spot, rect=False,
                  clearcoat=True, anisotropy=False, reflectance=False,
                  specular_tint=False):
    i = pl.program_id(0)
    j = pl.program_id(1)
    ntx = pl.num_programs(1)
    t = i * ntx + j
    cnt = counts_ref[t]

    dma = pltpu.make_async_copy(light_table_ref.at[t], lights_ref, sem)
    dma.start()

    def fiota(shape, dim):
        return jax.lax.broadcasted_iota(jnp.int32, shape, dim).astype(jnp.float32)

    px = fiota((tile_h, tile_w), 1) + (j * tile_w).astype(jnp.float32) + 0.5
    py = fiota((tile_h, tile_w), 0) + (i * tile_h).astype(jnp.float32) + 0.5

    # params (40,): [0:16 inv_vp row-major, 16:19 light dir, 19:22 light
    # rgb, 22:25 ambient rgb, 25 width, 26 height, 27:31 clear rgba,
    # 31:34 camera position, 34 global row offset (row-band sharding:
    # each device shades a band but reconstructs GLOBAL pixel rays)]
    def p(k):
        return params_ref[k]

    py = py + p(34)
    depth = dep_ref[:]
    geom = depth > 0.0
    ndx = 2.0 * px / p(25) - 1.0
    ndy = 1.0 - 2.0 * py / p(26)
    # world = inv_vp @ [ndx, ndy, z, 1], then divide by w
    wx = p(0) * ndx + p(1) * ndy + p(2) * depth + p(3)
    wy = p(4) * ndx + p(5) * ndy + p(6) * depth + p(7)
    wz = p(8) * ndx + p(9) * ndy + p(10) * depth + p(11)
    ww = p(12) * ndx + p(13) * ndy + p(14) * depth + p(15)
    inv_ww = 1.0 / jnp.where(jnp.abs(ww) > 1e-9, ww, 1.0)
    wx, wy, wz = wx * inv_ww, wy * inv_ww, wz * inv_ww

    ar, ag, ab = gbuf_ref[0], gbuf_ref[1], gbuf_ref[2]
    aa = gbuf_ref[3]
    nx, ny, nz = gbuf_ref[4], gbuf_ref[5], gbuf_ref[6]
    er, eg, eb = gbuf_ref[7], gbuf_ref[8], gbuf_ref[9]
    met = gbuf_ref[10]
    rough = jnp.clip(gbuf_ref[11], 0.045, 1.0)
    if clearcoat:
        cc = gbuf_ref[12]                  # clearcoat weight (0 = off)
        ccr = jnp.clip(gbuf_ref[13], 0.045, 1.0)
        cc_a2 = (ccr * ccr) * (ccr * ccr)
    if anisotropy:
        # planes 14:17 = anisotropy tangent (already rotated by the
        # material's anisotropy_rotation at resolve), 17 = strength
        # (ref: bevy_pbr anisotropy — Filament-derived aniso GGX)
        tx, ty, tz = gbuf_ref[14], gbuf_ref[15], gbuf_ref[16]
        aniso = gbuf_ref[17]
        # pixels without a tangent (flat/legacy G-buffer paths write
        # zeros) get an arbitrary orthonormal frame — their strength is
        # 0, and at zero strength the aniso terms reduce EXACTLY to the
        # isotropic lobe, so the frame choice cannot show
        tlen2 = tx * tx + ty * ty + tz * tz
        fy_ = jnp.where(jnp.abs(ny) < 0.9, 1.0, 0.0)
        fx_ = 1.0 - fy_
        cxf = fy_ * nz
        cyf = -fx_ * nz
        czf = fx_ * ny - fy_ * nx
        use_fb = tlen2 < 0.25
        tx = jnp.where(use_fb, cxf, tx)
        ty = jnp.where(use_fb, cyf, ty)
        tz = jnp.where(use_fb, czf, tz)
        inv_tl = jax.lax.rsqrt(jnp.maximum(tx * tx + ty * ty + tz * tz,
                                           1e-12))
        tx, ty, tz = tx * inv_tl, ty * inv_tl, tz * inv_tl
        aniso = jnp.where(use_fb, 0.0, aniso)

    # view vector + PBR terms shared across lights (ref: pbr_lighting.wesl
    # Cook-Torrance GGX; diffuse kept un-normalized by π to match the
    # forward path's brightness convention)
    vx, vy, vz = p(31) - wx, p(32) - wy, p(33) - wz
    inv_vlen = jax.lax.rsqrt(jnp.maximum(vx * vx + vy * vy + vz * vz, 1e-9))
    vx, vy, vz = vx * inv_vlen, vy * inv_vlen, vz * inv_vlen
    nov = jnp.maximum(nx * vx + ny * vy + nz * vz, 1e-4)
    alpha = rough * rough
    a2 = alpha * alpha
    if anisotropy:
        # bitangent + per-direction roughnesses (Filament / bevy
        # anisotropy_strength convention: at = a(1+s), ab = a(1-s))
        bx_ = ny * tz - nz * ty
        by_ = nz * tx - nx * tz
        bz_ = nx * ty - ny * tx
        at = jnp.maximum(alpha * (1.0 + aniso), 1e-3)
        ab_r = jnp.maximum(alpha * (1.0 - aniso), 1e-3)
        tov = tx * vx + ty * vy + tz * vz
        bov = bx_ * vx + by_ * vy + bz_ * vz
        lam_v_c = jnp.sqrt(jnp.maximum(
            (at * tov) ** 2 + (ab_r * bov) ** 2 + nov * nov, 1e-12))
    dr = ar * (1.0 - met)
    dg = ag * (1.0 - met)
    db = ab * (1.0 - met)
    if reflectance:
        # ref: StandardMaterial::reflectance — F0 = 0.16 * r^2 (0.5 maps
        # to the 4% default); trace-time specialized like the coat lobe
        base_f0 = 0.16 * gbuf_ref[18] * gbuf_ref[18]
    else:
        base_f0 = 0.04
    if specular_tint:
        # ref: StandardMaterial::specular_tint — modulates the
        # DIELECTRIC F0 color; metals keep their albedo F0
        f0r = base_f0 * gbuf_ref[19] * (1.0 - met) + ar * met
        f0g = base_f0 * gbuf_ref[20] * (1.0 - met) + ag * met
        f0b = base_f0 * gbuf_ref[21] * (1.0 - met) + ab * met
    else:
        f0r = base_f0 * (1.0 - met) + ar * met
        f0g = base_f0 * (1.0 - met) + ag * met
        f0b = base_f0 * (1.0 - met) + ab * met

    def shade_light(lx, ly, lz, cr, cg, cb):
        """L normalized toward the light; c* = light color (incl. atten)."""
        nol = jnp.maximum(nx * lx + ny * ly + nz * lz, 0.0)
        hx, hy, hz = lx + vx, ly + vy, lz + vz
        inv_h = jax.lax.rsqrt(jnp.maximum(hx * hx + hy * hy + hz * hz, 1e-9))
        noh = jnp.maximum((nx * hx + ny * hy + nz * hz) * inv_h, 0.0)
        loh = jnp.maximum((lx * hx + ly * hy + lz * hz) * inv_h, 0.0)
        if anisotropy:
            # Filament-style anisotropic GGX D + height-correlated Smith
            # visibility (ref: bevy_pbr anisotropy / pbr_lighting.wesl);
            # aniso == 0 degenerates to the isotropic terms exactly
            toh = (tx * hx + ty * hy + tz * hz) * inv_h
            boh = (bx_ * hx + by_ * hy + bz_ * hz) * inv_h
            a2an = at * ab_r
            dsum = (toh / at) ** 2 + (boh / ab_r) ** 2 + noh * noh
            dist = 1.0 / jnp.maximum(
                3.14159265 * a2an * dsum * dsum, 1e-9)
            tol = tx * lx + ty * ly + tz * lz
            bol = bx_ * lx + by_ * ly + bz_ * lz
            lam_l = jnp.sqrt(jnp.maximum(
                (at * tol) ** 2 + (ab_r * bol) ** 2 + nol * nol, 1e-12))
            vis = 0.5 / jnp.maximum(nol * lam_v_c + nov * lam_l, 1e-4)
        else:
            den = noh * noh * (a2 - 1.0) + 1.0
            dist = a2 / jnp.maximum(3.14159265 * den * den, 1e-9)
            vis = 0.5 / jnp.maximum(
                nol * (nov * (1.0 - alpha) + alpha) +
                nov * (nol * (1.0 - alpha) + alpha), 1e-4)
        fres = (1.0 - loh) ** 5
        sr = dist * vis * (f0r + (1.0 - f0r) * fres)
        sg = dist * vis * (f0g + (1.0 - f0g) * fres)
        sb = dist * vis * (f0b + (1.0 - f0b) * fres)
        if not clearcoat:       # trace-time specialization (no coat
            return ((dr + sr) * cr * nol,   # materials in the world)
                    (dg + sg) * cg * nol,
                    (db + sb) * cb * nol)
        # clearcoat: second GGX lobe on the base normal with Kelemen
        # visibility and f0=0.04; the base layer is attenuated by the
        # coat's fresnel (ref: pbr_lighting.wesl clearcoat terms)
        ccden = noh * noh * (cc_a2 - 1.0) + 1.0
        ccdist = cc_a2 / jnp.maximum(3.14159265 * ccden * ccden, 1e-9)
        ccvis = 0.25 / jnp.maximum(loh * loh, 1e-4)
        fc = (0.04 + 0.96 * fres) * cc
        coat = ccdist * ccvis * fc
        keep = 1.0 - fc
        return (((dr + sr) * keep + coat) * cr * nol,
                ((dg + sg) * keep + coat) * cg * nol,
                ((db + sb) * keep + coat) * cb * nol)

    # directional (shadowed) + ambient
    lit = shadow_ref[:]
    drr, drg, drb = shade_light(-p(16), -p(17), -p(18), p(19), p(20), p(21))
    acc_ref[0] = ar * p(22) + drr * lit
    acc_ref[1] = ag * p(23) + drg * lit
    acc_ref[2] = ab * p(24) + drb * lit

    # ---- tile sub-frustum side planes (world space, through the camera)
    # for a per-light sphere early skip: pairs come from conservative
    # screen-AABB binning, so a light whose sphere misses the tile's
    # frustum laterally (the AABB corner waste — measured 23% useful
    # pixel area on many_lights) pays only a ~16-mult scalar test
    # instead of the full (tile_h, tile_w) shade body. Exact-
    # conservative: outside any side plane by more than the range means
    # zero attenuation on every pixel of the tile.
    def corner_dir(cx_, cy_):
        nxc = 2.0 * cx_ / p(25) - 1.0
        nyc = 1.0 - 2.0 * cy_ / p(26)
        # unproject at z_ndc=1 (near, reverse-z); direction from camera
        ux = p(0) * nxc + p(1) * nyc + p(2) + p(3)
        uy = p(4) * nxc + p(5) * nyc + p(6) + p(7)
        uz = p(8) * nxc + p(9) * nyc + p(10) + p(11)
        uw = p(12) * nxc + p(13) * nyc + p(14) + p(15)
        inv = 1.0 / jnp.where(jnp.abs(uw) > 1e-12, uw, 1e-12)
        return (ux * inv - p(31), uy * inv - p(32), uz * inv - p(33))

    tx0 = (j * tile_w).astype(jnp.float32)
    ty0 = (i * tile_h).astype(jnp.float32) + p(34)
    ca = corner_dir(tx0, ty0)
    cb = corner_dir(tx0 + tile_w, ty0)
    cc_ = corner_dir(tx0 + tile_w, ty0 + tile_h)
    cd = corner_dir(tx0, ty0 + tile_h)
    ce = corner_dir(tx0 + 0.5 * tile_w, ty0 + 0.5 * tile_h)  # center dir

    def side_plane(a, b):
        nx_ = a[1] * b[2] - a[2] * b[1]
        ny_ = a[2] * b[0] - a[0] * b[2]
        nz_ = a[0] * b[1] - a[1] * b[0]
        inv_n = jax.lax.rsqrt(jnp.maximum(
            nx_ * nx_ + ny_ * ny_ + nz_ * nz_, 1e-18))
        # orient inward (tile-center dir on the positive side)
        s = jnp.where(nx_ * ce[0] + ny_ * ce[1] + nz_ * ce[2] >= 0.0,
                      inv_n, -inv_n)
        return nx_ * s, ny_ * s, nz_ * s

    pls = [side_plane(ca, cb), side_plane(cb, cc_),
           side_plane(cc_, cd), side_plane(cd, ca)]

    dma.wait()

    def body(s, _):
        def d(k):
            return lights_ref[k, s]
        # scalar sphere-vs-tile-frustum early skip (see plane setup);
        # rect lights influence beyond their range sphere (extents), so
        # they always take the full body
        if rect:
            _shade_body(s)
            return 0
        lcx, lcy, lcz = d(0) - p(31), d(1) - p(32), d(2) - p(33)
        rng = d(6)
        inside = (pls[0][0] * lcx + pls[0][1] * lcy + pls[0][2] * lcz
                  > -rng)
        for (pnx, pny, pnz) in pls[1:]:
            inside = inside & (pnx * lcx + pny * lcy + pnz * lcz > -rng)

        @pl.when(inside)
        def _shade_one():
            _shade_body(s)
        return 0

    def _shade_body(s):
        def d(k):
            return lights_ref[k, s]
        dx = d(0) - wx
        dy = d(1) - wy
        dz = d(2) - wz
        if rect:
            # rect (area) light, representative-point approximation
            # (ref: bevy_light rect_light.rs): light the fragment from
            # the nearest point of the rect (center d(0:3), axes u=d(16:19)
            # v=d(19:22), half extents d(22), d(23)), one-sided along the
            # normal d(8:11). Non-rect rows carry zero extents/axes so the
            # clamp collapses to the center; the side gate keys on the
            # slot-15 flag.
            qu = jnp.clip(-(dx * d(16) + dy * d(17) + dz * d(18)),
                          -d(22), d(22))
            qv = jnp.clip(-(dx * d(19) + dy * d(20) + dz * d(21)),
                          -d(23), d(23))
            side = jnp.where(
                (d(15) > 0.5) & (dx * d(8) + dy * d(9) + dz * d(10) > 0.0),
                0.0, 1.0)
            dx = dx + qu * d(16) + qv * d(19)
            dy = dy + qu * d(17) + qv * d(20)
            dz = dz + qu * d(18) + qv * d(21)
        d2 = dx * dx + dy * dy + dz * dz
        inv_d = jax.lax.rsqrt(jnp.maximum(d2, 1e-9))
        rng2 = jnp.maximum(d(6) * d(6), 1e-9)
        win = jnp.clip(1.0 - (d2 / rng2) * (d2 / rng2), 0.0, 1.0)
        atten = win * win / (d2 + 1.0)
        if spot:
            # spot cone (ref: spot_light_attenuation): smooth edge between
            # outer and inner half-angle cosines; point lights pass the
            # sentinel cos_outer=-2 so the term clips to 1. Worlds with no
            # SpotLight rows trace the cone-free variant (spot=False).
            cos_to = -(dx * inv_d * d(8) + dy * inv_d * d(9) +
                       dz * inv_d * d(10))
            cone = jnp.clip((cos_to - d(11)) * d(12), 0.0, 1.0)
            atten = atten * cone * cone
        if rect:
            atten = atten * side
        pr, pg, pb = shade_light(dx * inv_d, dy * inv_d, dz * inv_d,
                                 d(3) * atten, d(4) * atten, d(5) * atten)
        acc_ref[0] = acc_ref[0] + pr
        acc_ref[1] = acc_ref[1] + pg
        acc_ref[2] = acc_ref[2] + pb

    # sky-only tiles (no geometry anywhere) skip the whole light walk —
    # their every pixel takes the clear color below regardless (the
    # horizon band of many_lights bins hundreds of far-field lights
    # into tiles that are pure sky)
    @pl.when(jnp.max(depth) > 0.0)
    def _light_walk():
        jax.lax.fori_loop(0, cnt, body, 0)

    out_r = jnp.where(geom, acc_ref[0] + er, p(27))
    out_g = jnp.where(geom, acc_ref[1] + eg, p(28))
    out_b = jnp.where(geom, acc_ref[2] + eb, p(29))
    out_a = jnp.where(geom, aa, p(30))
    col_out_ref[0] = out_r
    col_out_ref[1] = out_g
    col_out_ref[2] = out_b
    col_out_ref[3] = out_a


@partial(jax.jit, static_argnames=("tile_h", "tile_w", "max_per_tile",
                                   "interpret", "spot", "rect", "clearcoat",
                                   "anisotropy", "reflectance",
                                   "specular_tint"))
def deferred_shade(gbuffer, depth, light_table, tile_counts, params,
                   shadow=None, *, tile_h=32, tile_w=128, max_per_tile=256,
                   interpret=False, spot=True, rect=False, clearcoat=True,
                   anisotropy=False, reflectance=False,
                   specular_tint=False):
    """gbuffer (18,H,W), depth (H,W); light_table (num_tiles, F, mpt) from
    bin_lights, where F is the record width — 16 for point/spot scenes,
    24 when rect=True (u/v axes + half extents, see LF comment); params
    (40,) f32 (see _shade_kernel); shadow (H,W) lit factor for the
    directional light (None = fully lit). Returns color (4,H,W)."""
    _, H, W = gbuffer.shape
    max_per_tile = _pad_to(max_per_tile, 128)
    hp, wp = _pad_to(H, tile_h), _pad_to(W, tile_w)
    nty, ntx = hp // tile_h, wp // tile_w

    gb = jnp.pad(gbuffer, ((0, 0), (0, hp - H), (0, wp - W)))
    dp = jnp.pad(depth, ((0, hp - H), (0, wp - W)))
    sh = jnp.ones((hp, wp), jnp.float32) if shadow is None else \
        jnp.pad(shadow, ((0, hp - H), (0, wp - W)), constant_values=1.0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nty, ntx),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),          # light_table
            pl.BlockSpec((int(gbuffer.shape[0]), tile_h, tile_w),
                         lambda i, j, *_: (0, i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_h, tile_w), lambda i, j, *_: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_h, tile_w), lambda i, j, *_: (i, j),
                         memory_space=pltpu.VMEM),      # shadow factor
        ],
        out_specs=pl.BlockSpec((4, tile_h, tile_w), lambda i, j, *_: (0, i, j),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.SMEM((int(light_table.shape[1]), max_per_tile), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.VMEM((3, tile_h, tile_w), jnp.float32),
        ],
    )
    kernel = partial(_shade_kernel, tile_h=tile_h, tile_w=tile_w,
                     max_per_tile=max_per_tile, spot=spot, rect=rect,
                     clearcoat=clearcoat, anisotropy=anisotropy,
                     reflectance=reflectance, specular_tint=specular_tint)
    col = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((4, hp, wp), jnp.float32),
        interpret=interpret,
    )(tile_counts, params, light_table, gb, dp, sh)
    return col[:, :H, :W]
