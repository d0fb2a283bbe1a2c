"""Window-splat rasterizer — the fast 3D path for instanced scenes
(reference twin: bevy's GPU-driven raster — meshlet sw raster
`bevy_pbr/src/meshlet/` + the `gpu_preprocess.rs` transform/cull —
rethought for TPU: no per-tile work lists, no scalar loops).

Measured reality at many_cubes scale (160k instances, 1280x720): ~55k
visible clusters, median footprint 15 px tall, and the whole visible set
decomposes into only ~60k aligned 32-row x 128-lane blocks. So the
raster is:

1. **Block decomposition (XLA)**: each visible cluster emits one window
   per overlapped (win_h-row x 128-lane) framebuffer block — lane
   columns statically aligned (the composite then needs NO dynamic lane
   offsets; dynamic *sublane* starts are cheap). Single-block clusters
   get one unaligned window at their own y0; multi-block clusters use
   the aligned band grid. Exorbitant clusters (> max_blocks, or
   near-plane straddlers with full-viewport AABBs) go to the streaming
   tile kernel (ops/raster3d_visbuf) — the Nanite sw/hw split, recast.
2. **Window evaluation (XLA)**: all cs triangles evaluate over each
   window in ONE fused elementwise chain, vector-parallel across
   windows. Depth and winning-triangle id pack into a single f32 — the
   low 4 mantissa bits of reverse-z hold the tri-in-cluster index
   (IEEE non-negative floats order like their bit patterns, so one
   `max` chain resolves depth AND id together, and window traffic
   halves). Optional per-cluster triangle compaction sorts backface-
   culled triangles last so `eval_tris` can cap the unrolled loop
   (meshlet cone-culling's moral equivalent).
3. **Composite (Pallas)**: a single-program kernel holds the whole
   packed-depth + winner-id framebuffer in VMEM, laid out
   (cols, H, 128) so the column is a cheap leading-dim index, and
   streams windows HBM→VMEM double-buffered, one read-max-write per
   window. TPU Pallas grids are sequential ⇒ RMW is race-free.

The packed depth (z | tri bits) is what lands in target.depth; the id
bits perturb z by < 2^-19 relative — far below any depth-test tolerance.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bevy_tpu.ops.binning import expand_runs
from bevy_tpu.ops.raster3d_visbuf import ZREC

WIN_W = 128          # window width = one framebuffer column (lane-aligned)
CHUNK_WIN = 8        # windows per composite DMA
ID_BITS = 4          # low mantissa bits of packed z = tri-in-cluster id
ID_MASK = (1 << ID_BITS) - 1
REC_FIELDS = 13      # fused-kernel record: 3 edge planes (9) + z plane (3) + id


def build_rec_rows(zrec, cs: int, ntri: int):
    """Valid-first record packing for the fused kernel, gather-free.

    Replaces compact_cluster_tris (argsort + take_along_axis — 6.3 ms of
    (65536,12,20) slice-gathers in the round-2 many_cubes profile) plus
    fused_eval_composite's internal row relayout (3.1 ms, and it re-ran
    per window class): slot s of each cluster's output row is the s-th
    VALID triangle, selected by a masked SUM over the cs axis — pure
    elementwise multiply + sublane reduction, which XLA fuses into one
    pass with no gather. Empty slots are all-zero records; the kernel's
    `z > cur_d` test rejects them (reverse-z depth is >= 0), matching
    the zeroed-invalid-planes convention.

    Returns (ncl, rrows, 128) float32 rows, field stride REC_FIELDS
    (ntri=8 packs to a single 128-lane row per cluster — half the
    ZREC-stride DMA bytes). zrec: (ncl*cs, ZREC) or (ncl, cs, ZREC)."""
    ncl = zrec.shape[0] if zrec.ndim == 3 else zrec.shape[0] // cs
    r = zrec.reshape(ncl, cs, -1)[:, :, :REC_FIELDS]
    valid = r[:, :, 12] >= 0.0                     # tri_id < 0 = culled
    rank = jnp.cumsum(valid.astype(jnp.int32), axis=1) - 1
    vr = jnp.where(valid, rank, -1)
    slots = [jnp.sum(r * (vr == s).astype(r.dtype)[:, :, None], axis=1)
             for s in range(min(ntri, cs))]
    rows = jnp.concatenate(slots, axis=1)          # (ncl, ntri*13)
    rowlen = len(slots) * REC_FIELDS
    rrows = (rowlen + WIN_W - 1) // WIN_W
    if rrows * WIN_W != rowlen:
        rows = jnp.pad(rows, ((0, 0), (0, rrows * WIN_W - rowlen)))
    return rows.reshape(ncl, rrows, WIN_W)


def coplanar_quad_pairs(positions, triangles):
    """Host-side static pairing of coplanar adjacent triangles into
    convex quads (classic quad-fusion: a planar convex quad rasterizes
    with 4 edge planes + 1 z plane = 13 block-ops/slot instead of two
    triangles' 22 — the cube-heavy instancing scenes halve their window
    eval work; ref workload: examples/stress_tests/many_cubes.rs).

    Returns a list of entries covering every non-degenerate triangle:
    ("pair", iA, aU, aV, iB, bU, bV) — iA/iB local tri indices, aU/aV
    the A-local corner indices of the two SHARED verts (their lambda
    planes vanish on A's two boundary edges), bU/bV likewise for B —
    or ("tri", i) for unpaired triangles."""
    import numpy as np
    tris = np.asarray(triangles, np.int64)
    pos = np.asarray(positions, np.float64)
    tc = len(tris)
    n = np.cross(pos[tris[:, 1]] - pos[tris[:, 0]],
                 pos[tris[:, 2]] - pos[tris[:, 0]])
    nl = np.linalg.norm(n, axis=1)
    scale = float(np.max(np.abs(pos)) + 1e-12)
    nn = n / np.maximum(nl, 1e-20)[:, None]
    edge_map = {}
    for i in range(tc):
        if nl[i] < 1e-12:
            continue                       # degenerate (padding) tri
        for k in range(3):
            a, b = int(tris[i, k]), int(tris[i, (k + 1) % 3])
            edge_map.setdefault((min(a, b), max(a, b)), []).append((i, k))
    used = np.zeros(tc, bool)
    out = []
    for i in range(tc):
        if used[i] or nl[i] < 1e-12:
            continue
        used[i] = True
        match = None
        for k in range(3):
            a = int(tris[i, k])
            b = int(tris[i, (k + 1) % 3])
            for (j, kj) in edge_map.get((min(a, b), max(a, b)), ()):
                if j == i or used[j]:
                    continue
                if float(np.dot(nn[i], nn[j])) < 1.0 - 1e-5:
                    continue               # not coplanar / opposite facing
                oj = int(tris[j, (kj + 2) % 3])
                if abs(float(np.dot(pos[oj] - pos[tris[i, 0]], nn[i]))) \
                        > 1e-5 * scale:
                    continue               # parallel but offset planes
                # convexity of the union polygon oi -> a -> oj -> b
                oi = int(tris[i, (k + 2) % 3])
                quad = pos[[oi, a, oj, b]]
                ed = np.roll(quad, -1, 0) - quad
                cr = np.cross(ed, np.roll(ed, -1, 0)) @ nn[i]
                if not (np.all(cr > 1e-12 * scale * scale) or
                        np.all(cr < -1e-12 * scale * scale)):
                    continue               # non-convex quad
                match = (j, k, kj)
                break
            if match:
                break
        if match is None:
            out.append(("tri", i))
            continue
        j, k, kj = match
        used[j] = True
        a = int(tris[i, k])
        b = int(tris[i, (k + 1) % 3])
        bl = [int(x) for x in tris[j]]
        out.append(("pair", i, k, (k + 1) % 3, j,
                    bl.index(a), bl.index(b)))
    return out


def build_quad_rec_rows(zrec, cs: int, entries, nquad: int):
    """Quad records for the fused kernel (nedge=4, stride 16), assembled
    from the per-TRIANGLE zrec by STATIC slices (the pairing pattern is
    per-mesh static and uniform across clusters — single-cluster meshes
    only, which is the instancing-stress case). Quad fields:
    [edgeA_u(3), edgeA_v(3), edgeB_u(3), edgeB_v(3), z(3), id(1)] where
    the edges are the lambda planes of the shared corners (they vanish
    on the four boundary edges; see coplanar_quad_pairs) and z/id come
    from triangle A — so the resolve's winner-id -> srec/frec mapping is
    untouched (a coplanar pair shares attribute planes). A quad is valid
    only when BOTH triangles passed the pack_planes_h guards; unpaired
    ("tri", i) entries duplicate an edge plane as the 4th.

    Returns (ncl, rrows, 128) rows, valid-first like build_rec_rows."""
    ncl = zrec.shape[0] if zrec.ndim == 3 else zrec.shape[0] // cs
    r = zrec.reshape(ncl, cs, -1)
    qs, oks = [], []
    for e in entries:
        if e[0] == "pair":
            _, iA, aU, aV, iB, bU, bV = e
            rec = jnp.concatenate([
                r[:, iA, 3 * aU:3 * aU + 3], r[:, iA, 3 * aV:3 * aV + 3],
                r[:, iB, 3 * bU:3 * bU + 3], r[:, iB, 3 * bV:3 * bV + 3],
                r[:, iA, 9:13]], axis=1)
            ok = (r[:, iA, 12] >= 0.0) & (r[:, iB, 12] >= 0.0)
        else:
            i = e[1]
            rec = jnp.concatenate([
                r[:, i, 0:9], r[:, i, 0:3], r[:, i, 9:13]], axis=1)
            ok = r[:, i, 12] >= 0.0
        qs.append(rec)
        oks.append(ok)
    q = jnp.stack(qs, axis=1)                      # (ncl, nq, 16)
    vq = jnp.stack(oks, axis=1)                    # (ncl, nq)
    rank = jnp.cumsum(vq.astype(jnp.int32), axis=1) - 1
    vr = jnp.where(vq, rank, -1)
    nquad = min(nquad, len(entries))
    slots = [jnp.sum(q * (vr == s).astype(q.dtype)[:, :, None], axis=1)
             for s in range(nquad)]
    rows = jnp.concatenate(slots, axis=1)          # (ncl, nquad*16)
    rowlen = nquad * 16
    rrows = (rowlen + WIN_W - 1) // WIN_W
    if rrows * WIN_W != rowlen:
        rows = jnp.pad(rows, ((0, 0), (0, rrows * WIN_W - rowlen)))
    return rows.reshape(ncl, rrows, WIN_W)


def compact_cluster_tris(zrec, cs: int):
    """Sort each cluster's triangles valid-first (invalid = backface or
    padding, marked by tri_id < 0 in slot 12). Enables `eval_tris` caps.
    Returns (zrec_sorted, max_valid_per_cluster)."""
    t = zrec.shape[0]
    ncl = t // cs
    r = zrec.reshape(ncl, cs, ZREC)
    invalid = r[:, :, 12] < 0
    order = jnp.argsort(invalid, axis=1, stable=True)
    r = jnp.take_along_axis(r, order[:, :, None], axis=1)
    return r.reshape(t, ZREC), jnp.max(jnp.sum(~invalid, axis=1))


def build_windows(aabb, cl_valid, *, win_h, width, height, budget,
                  max_blocks=32):
    """Decompose visible cluster AABBs into per-block windows.

    Returns dict with owner (B,), meta (B,) packed col*2048+y0, wvalid
    (B,) prefix bools, fallback (NCL,) bool (clusters for the streaming
    kernel), overflow () int32 dropped windows."""
    ncols = (width + WIN_W - 1) // WIN_W
    nbands = (height + win_h - 1) // win_h
    x0, y0, x1, y1 = aabb[:, 0], aabb[:, 1], aabb[:, 2], aabb[:, 3]
    onscreen = (x1 > 0) & (x0 < width) & (y1 > 0) & (y0 < height) & \
        (x1 > x0) & (y1 > y0) & cl_valid
    c0 = jnp.clip(jnp.floor(x0 / WIN_W).astype(jnp.int32), 0, ncols - 1)
    c1 = jnp.clip(jnp.floor((x1 - 1e-3) / WIN_W).astype(jnp.int32),
                  0, ncols - 1)
    b0 = jnp.clip(jnp.floor(y0 / win_h).astype(jnp.int32), 0, nbands - 1)
    b1 = jnp.clip(jnp.floor((y1 - 1e-3) / win_h).astype(jnp.int32),
                  0, nbands - 1)
    nbx = c1 - c0 + 1
    nby = b1 - b0 + 1
    single_band = (y1 - y0 <= win_h - 1.0)
    nby = jnp.where(single_band, 1, nby)
    blocks = nbx * nby
    use = onscreen & (blocks <= max_blocks)
    counts = jnp.where(use, blocks, 0)
    owner, rank, pvalid, total = expand_runs(counts, budget)
    # packed per-cluster expansion data, ONE row gather (1-D int32
    # gathers run on the scalar core — see ops/shade_pallas.bin_lights)
    z8 = jnp.zeros_like(c0)
    cpack = jnp.stack(
        [c0, jnp.maximum(nbx, 1), b0,
         jnp.clip(jnp.floor(y0).astype(jnp.int32), 0,
                  max(height - win_h, 0)),
         single_band.astype(jnp.int32), z8, z8, z8], axis=1)
    crow = cpack[owner]                                   # (B, 8)
    col = jnp.clip(crow[:, 0] + rank % crow[:, 1], 0, ncols - 1)
    band_y = (crow[:, 2] + rank // crow[:, 1]) * win_h
    # single-band clusters: one unaligned window at their own y0
    wy = jnp.where(crow[:, 4] > 0, crow[:, 3],
                   jnp.clip(band_y, 0, max(height - win_h, 0)))
    meta = jnp.where(pvalid, col * 2048 + wy, 0)
    return {
        "owner": jnp.where(pvalid, owner, 0),
        "meta": meta.astype(jnp.int32),
        "wvalid": pvalid,
        "fallback": onscreen & (blocks > max_blocks),
        "overflow": jnp.maximum(total - budget, 0),
    }


def _eval_block(rec, owner, meta, *, win_h, ntri, cs, viewport, id_base=0):
    """Elementwise window evaluation for one block of windows.
    rec (b, ntri, ZREC); owner/meta (b,). Returns (b, win_h, 128)."""
    col = meta // 2048
    wy = meta % 2048
    px = (col[:, None, None] * WIN_W +
          jax.lax.broadcasted_iota(jnp.int32, (1, 1, WIN_W), 2)
          ).astype(jnp.float32) + 0.5                     # (b, 1, 128)
    py = (wy[:, None, None] +
          jax.lax.broadcasted_iota(jnp.int32, (1, win_h, 1), 1)
          ).astype(jnp.float32) + 0.5                     # (b, win_h, 1)
    if viewport is not None:
        vx0, vy0, vx1, vy1 = viewport
        gate = (px >= vx0) & (px < vx1) & (py >= vy0) & (py < vy1)
    else:
        gate = None
    acc = jnp.zeros((owner.shape[0], win_h, WIN_W), jnp.float32)
    for s in range(ntri):
        def d(k):
            return rec[:, s, k][:, None, None]
        # inside = all edges <= 0 AND z > 0 AND valid tri, folded into
        # one max chain (invalid tris have tri_id < 0 in slot 12; their
        # zeroed planes give z == 0, which -z folds out)
        emax = jnp.maximum(jnp.maximum(
            d(0) * px + d(1) * py + d(2),
            d(3) * px + d(4) * py + d(5)),
            d(6) * px + d(7) * py + d(8))
        z = d(9) * px + d(10) * py + d(11)
        ok = jnp.maximum(emax, -z) < 0
        if gate is not None:
            ok = ok & gate
        # slot 12 holds the GLOBAL tri id (survives per-cluster
        # compaction); pack its cluster-local part into the mantissa
        lid = (rec[:, s, 12].astype(jnp.int32) - id_base - owner * cs) & \
            ID_MASK
        zi = jax.lax.bitcast_convert_type(z, jnp.int32)
        packed = jax.lax.bitcast_convert_type(
            (zi & ~ID_MASK) | lid[:, None, None], jnp.float32)
        acc = jnp.maximum(acc, jnp.where(ok, packed, 0.0))
    return acc


def eval_windows(zrec, cs: int, owner, meta, wvalid, *, win_h,
                 viewport=None, eval_tris=None, chunk=4096, id_base=0):
    """Evaluate cluster triangles over their windows (pure XLA).

    Returns (B, win_h, 128) float32 packed values: reverse-z depth with
    the low ID_BITS mantissa bits replaced by the triangle-in-cluster
    index (0 = background/no hit). The budget B is a CAPACITY, not a
    cost: valid windows form a prefix, and a `fori_loop` with a dynamic
    trip count evaluates `chunk` windows per iteration — compute tracks
    the actual window count, only memory scales with the budget."""
    t = zrec.shape[0]
    ncl = t // cs
    ntri = cs if eval_tris is None else min(eval_tris, cs)
    assert cs <= (1 << ID_BITS), "cluster size exceeds packed id bits"

    recs = zrec.reshape(ncl, cs, ZREC)[:, :ntri]

    def gather_rec(o):
        return recs[o]

    b = owner.shape[0]
    if b <= chunk:
        return _eval_block(gather_rec(owner), owner, meta, win_h=win_h,
                           ntri=ntri, cs=cs, viewport=viewport,
                           id_base=id_base)
    bpad = (b + chunk - 1) // chunk * chunk
    if bpad != b:
        owner = jnp.pad(owner, (0, bpad - b))
        meta = jnp.pad(meta, (0, bpad - b))
        wvalid = jnp.pad(wvalid, (0, bpad - b))
    nwin = jnp.sum(wvalid.astype(jnp.int32))
    nch = (nwin + chunk - 1) // chunk
    out = jnp.zeros((bpad, win_h, WIN_W), jnp.float32)

    def body(c, out):
        o = jax.lax.dynamic_slice(owner, (c * chunk,), (chunk,))
        m = jax.lax.dynamic_slice(meta, (c * chunk,), (chunk,))
        acc = _eval_block(gather_rec(o), o, m, win_h=win_h, ntri=ntri,
                          cs=cs, viewport=viewport, id_base=id_base)
        return jax.lax.dynamic_update_slice(out, acc, (c * chunk, 0, 0))

    out = jax.lax.fori_loop(0, nch, body, out)
    return out[:b]


def eval_oit_windows(zrec, frec, cs: int, owner, meta, wvalid, depth, *,
                     win_h, eval_tris=None, chunk=2048, id_base=0):
    """Weighted-blended OIT window evaluation (ref: bevy_core_pipeline's
    OIT — `src/oit/`; McGuire-Bavoil weighted blended transparency,
    which is order-independent and therefore sort-free, the TPU fit).

    zrec: packed planes; frec (T, 8): flat lit rgb + alpha (slot 3);
    depth (H, W): the OPAQUE reverse-z buffer — transparent fragments
    count only where nearer. Returns (B, 5, win_h, 128): accumulated
    [w*r, w*g, w*b, w, revealage] per window (revealage multiplies)."""
    t = zrec.shape[0]
    ncl = t // cs
    ntri = cs if eval_tris is None else min(eval_tris, cs)
    recs = zrec.reshape(ncl, cs, ZREC)[:, :ntri]
    cols = frec.reshape(ncl, cs, 8)[:, :ntri, :4]
    h, w = depth.shape
    ncols_fb = (w + WIN_W - 1) // WIN_W
    dep_pad = jnp.pad(depth, ((0, win_h), (0, ncols_fb * WIN_W - w)),
                      constant_values=3.4e38)

    def block(rec, col4, owner_b, meta_b):
        b = owner_b.shape[0]
        colk = meta_b // 2048
        wy = meta_b % 2048
        px = (colk[:, None, None] * WIN_W +
              jax.lax.broadcasted_iota(jnp.int32, (1, 1, WIN_W), 2)
              ).astype(jnp.float32) + 0.5
        py = (wy[:, None, None] +
              jax.lax.broadcasted_iota(jnp.int32, (1, win_h, 1), 1)
              ).astype(jnp.float32) + 0.5
        rows = wy[:, None, None] + jax.lax.broadcasted_iota(
            jnp.int32, (1, win_h, 1), 1)
        ccols = colk[:, None, None] * WIN_W + jax.lax.broadcasted_iota(
            jnp.int32, (1, 1, WIN_W), 2)
        dep_w = dep_pad[rows, ccols]                 # (b, win_h, 128)
        acc = jnp.zeros((b, 4, win_h, WIN_W), jnp.float32)
        reveal = jnp.ones((b, win_h, WIN_W), jnp.float32)
        for s in range(ntri):
            def d(k):
                return rec[:, s, k][:, None, None]
            emax = jnp.maximum(jnp.maximum(
                d(0) * px + d(1) * py + d(2),
                d(3) * px + d(4) * py + d(5)),
                d(6) * px + d(7) * py + d(8))
            z = d(9) * px + d(10) * py + d(11)
            cover = (jnp.maximum(emax, -z) < 0) & (z > dep_w)
            a = col4[:, s, 3][:, None, None] * cover.astype(jnp.float32)
            # z-aware weight: nearer (larger reverse-z) counts more
            wz = a * (0.1 + z * z * 10.0)
            acc = acc.at[:, 0].add(col4[:, s, 0][:, None, None] * wz)
            acc = acc.at[:, 1].add(col4[:, s, 1][:, None, None] * wz)
            acc = acc.at[:, 2].add(col4[:, s, 2][:, None, None] * wz)
            acc = acc.at[:, 3].add(wz)
            reveal = reveal * (1.0 - a)
        return jnp.concatenate([acc, reveal[:, None]], 1)

    b = owner.shape[0]
    if b <= chunk:
        return block(recs[owner], cols[owner], owner, meta)
    bpad = (b + chunk - 1) // chunk * chunk
    owner = jnp.pad(owner, (0, bpad - b))
    meta = jnp.pad(meta, (0, bpad - b))
    wvalid_p = jnp.pad(wvalid, (0, bpad - b))
    nch = (jnp.sum(wvalid_p.astype(jnp.int32)) + chunk - 1) // chunk
    out = jnp.zeros((bpad, 5, win_h, WIN_W), jnp.float32)
    out = out.at[:, 4].set(1.0)

    def body(c, out):
        o = jax.lax.dynamic_slice(owner, (c * chunk,), (chunk,))
        m = jax.lax.dynamic_slice(meta, (c * chunk,), (chunk,))
        res = block(recs[o], cols[o], o, m)
        return jax.lax.dynamic_update_slice(out, res, (c * chunk, 0, 0, 0))

    return jax.lax.fori_loop(0, nch, body, out)[:b]


def accumulate_oit(oit, windows, meta, wvalid):
    """Merge OIT windows into the (5, H, W) accumulation buffer
    (sequential XLA read-modify-write per window — transparent window
    counts are small, so no kernel needed)."""
    _, h, w = oit.shape
    ncols = (w + WIN_W - 1) // WIN_W
    wp = ncols * WIN_W
    win_h = windows.shape[2]
    oit_p = jnp.pad(oit, ((0, 0), (0, win_h), (0, wp - w)))
    nwin = jnp.sum(wvalid.astype(jnp.int32))

    def body(i, buf):
        m = meta[i]
        colk = m // 2048
        y0 = m % 2048
        x0 = colk * WIN_W
        cur = jax.lax.dynamic_slice(buf, (0, y0, x0), (5, win_h, WIN_W))
        wnd = windows[i]
        new = jnp.concatenate([cur[:4] + wnd[:4],
                               (cur[4] * wnd[4])[None]], 0)
        return jax.lax.dynamic_update_slice(buf, new, (0, y0, x0))

    oit_p = jax.lax.fori_loop(0, nwin, body, oit_p)
    return oit_p[:, :h, :w]


def oit_blend(color, oit):
    """Composite the OIT accumulation over the opaque color (ref: the
    oit resolve pass). color (4, H, W); oit (5, H, W)."""
    accum = oit[:3]
    total_w = oit[3]
    reveal = jnp.clip(oit[4], 0.0, 1.0)
    avg = accum / jnp.maximum(total_w, 1e-6)[None]
    alpha_vis = 1.0 - reveal
    rgb = avg * alpha_vis[None] + color[:3] * reveal[None]
    return jnp.concatenate([rgb, color[3:4]], 0)


def coarse_min_depth(depth, cell_h=16, cell_w=64):
    """Min-pool the (packed) reverse-z depth to a coarse grid — the hi-z
    pyramid level used for occlusion tests (ref: the downsample-depth
    pass of bevy_render/src/occlusion_culling + meshlet's hi-z)."""
    h, w = depth.shape
    hp = (h + cell_h - 1) // cell_h * cell_h
    wp = (w + cell_w - 1) // cell_w * cell_w
    if (hp, wp) != (h, w):
        depth = jnp.pad(depth, ((0, hp - h), (0, wp - w)),
                        constant_values=0.0)
    return depth.reshape(hp // cell_h, cell_h, wp // cell_w, cell_w
                         ).min((1, 3))


def occlusion_test(aabb, zmax, coarse, cell_h=16, cell_w=64, max_span=4):
    """Conservative per-cluster occlusion: occluded iff EVERY coarse
    cell the AABB touches holds depth nearer than the cluster's nearest
    bound. Clusters spanning more than max_span cells per axis are kept
    (sampling can't cover them conservatively — they're rare and near).
    Returns (NCL,) bool."""
    nch, ncw = coarse.shape
    x0, y0, x1, y1 = aabb[:, 0], aabb[:, 1], aabb[:, 2], aabb[:, 3]
    cx0 = jnp.floor(x0 / cell_w).astype(jnp.int32)
    cx1 = jnp.floor((x1 - 1e-3) / cell_w).astype(jnp.int32)
    cy0 = jnp.floor(y0 / cell_h).astype(jnp.int32)
    cy1 = jnp.floor((y1 - 1e-3) / cell_h).astype(jnp.int32)
    spanx = cx1 - cx0 + 1
    spany = cy1 - cy0 + 1
    small = (spanx <= max_span) & (spany <= max_span)
    m = jnp.full(aabb.shape[0], 3.4e38, jnp.float32)
    for dy in range(max_span):
        for dx in range(max_span):
            cyy = jnp.clip(cy0 + dy, 0, nch - 1)
            cxx = jnp.clip(cx0 + dx, 0, ncw - 1)
            cell = coarse[cyy, cxx]
            use = (dy < spany) & (dx < spanx)
            m = jnp.minimum(m, jnp.where(use, cell, 3.4e38))
    return small & (zmax < m)


def _composite_kernel(nwin_ref, meta_hbm, win_hbm, dep_hbm, winid_hbm,
                      dep_out, win_out, buf, mbuf, sem_fb0, sem_fb1,
                      sem_a, sem_b, sem_ma, sem_mb, *, win_h, cs):
    """Stream packed windows HBM→VMEM (CHUNK_WIN per DMA, double-
    buffered, per-chunk meta rows to SMEM alongside) and merge each at
    (col, y0) into the VMEM-resident framebuffer. Sequential grid ⇒
    read-modify-write is race-free."""
    nwin = nwin_ref[0]
    cp0 = pltpu.make_async_copy(dep_hbm, dep_out, sem_fb0)
    cp1 = pltpu.make_async_copy(winid_hbm, win_out, sem_fb1)
    cp0.start()
    cp1.start()
    nch = (nwin + CHUNK_WIN - 1) // CHUNK_WIN

    def issue(c, sem, msem):
        pltpu.make_async_copy(win_hbm.at[c], buf.at[c % 2], sem).start()
        pltpu.make_async_copy(meta_hbm.at[c], mbuf.at[c % 2], msem).start()

    def wait(c, sem, msem):
        pltpu.make_async_copy(win_hbm.at[0], buf.at[c % 2], sem).wait()
        pltpu.make_async_copy(meta_hbm.at[0], mbuf.at[c % 2], msem).wait()

    @pl.when(nch > 0)
    def _():
        issue(0, sem_a, sem_ma)
    cp0.wait()
    cp1.wait()

    def chunk(c, _):
        even = c % 2 == 0

        @pl.when((c + 1 < nch) & even)
        def _():
            issue(c + 1, sem_b, sem_mb)

        @pl.when((c + 1 < nch) & ~even)
        def _():
            issue(c + 1, sem_a, sem_ma)

        # STATIC buffer-slot indices only: a traced leading index on
        # VMEM/SMEM scratch makes Mosaic copy the slot per access —
        # hence the even/odd duplication (same lesson as _stream_kernel)
        def process(half, c):
            for k in range(CHUNK_WIN):
                w = c * CHUNK_WIN + k

                @pl.when(w < nwin)
                def _():
                    m = mbuf[half, 2 * k]
                    cluster = mbuf[half, 2 * k + 1]
                    colk = m // 2048
                    y0 = m % 2048
                    dz = buf[half, k]               # (win_h, 128) packed
                    cur = dep_out[colk, pl.ds(y0, win_h), :]
                    zpass = dz > cur
                    dep_out[colk, pl.ds(y0, win_h), :] = \
                        jnp.where(zpass, dz, cur)
                    lid = jax.lax.bitcast_convert_type(dz, jnp.int32) & \
                        ID_MASK
                    glob = (cluster * cs + lid).astype(jnp.float32)
                    cw = win_out[colk, pl.ds(y0, win_h), :]
                    win_out[colk, pl.ds(y0, win_h), :] = \
                        jnp.where(zpass, glob, cw)

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


def _fused_kernel(nwin_ref, meta_hbm, rec_hbm, sciss_ref, dep_hbm,
                  winid_hbm, dep_out, win_out, buf, mbuf,
                  sem_fb0, sem_fb1, sem_ra, sem_rb, sem_ma, sem_mb,
                  *, win_h, ntri, rrows, use_scissor, load_fb,
                  stride=ZREC, nedge=3):
    """Fused window evaluate + composite: streams per-window CLUSTER
    RECORDS (not evaluated pixels) HBM→VMEM and rasters each window
    directly into the VMEM framebuffer — the evaluated-window buffer
    (0.5-1.5 GB at many_cubes scale, ~20 ms of HBM traffic + zeroing in
    the round-2 profile) never exists. Winner ids come straight from
    record slot 12, so the packed z|id mantissa trick is unnecessary on
    this path. Sequential grid ⇒ read-modify-write is race-free.

    Records are fetched per window from the CONTIGUOUS (ncl, rrows, 128)
    HBM table by the window's owner id (dynamic-leading-index DMAs, one
    per window, issued a chunk ahead) — the XLA-side per-window record
    gather + relayout this replaces was ~9.4 ms of the round-2
    many_cubes profile. Pipeline: meta chunks run two ahead, record
    DMAs one ahead, both overlapped with window processing.

    Edge/z evaluation is row/col-decomposed: e = (a*px + c)_row +
    (b*py)_col leaves ONE full-block op per plane instead of three.
    Invalid (padding/backface) triangles have zeroed planes, so z == 0
    everywhere and `z > cur_d` rejects them (reverse-z depth is >= 0 by
    construction) — no explicit validity test needed."""
    nwin = nwin_ref[0]
    cp0 = pltpu.make_async_copy(dep_hbm, dep_out, sem_fb0)
    cp1 = pltpu.make_async_copy(winid_hbm, win_out, sem_fb1)
    cp0.start()
    cp1.start()
    nch = (nwin + CHUNK_WIN - 1) // CHUNK_WIN

    def meta_issue(c, msem):
        pltpu.make_async_copy(meta_hbm.at[c], mbuf.at[c % 2], msem).start()

    def meta_wait(c, msem):
        pltpu.make_async_copy(meta_hbm.at[0], mbuf.at[c % 2], msem).wait()

    def rec_issue(half, sem):
        # one DMA per window from its owner row; owner ids sit in the
        # already-arrived meta slot `half`
        for k in range(CHUNK_WIN):
            own = mbuf[half, 2 * k + 1]
            pltpu.make_async_copy(rec_hbm.at[own], buf.at[half, k],
                                  sem).start()

    def rec_wait(half, sem):
        for _ in range(CHUNK_WIN):
            pltpu.make_async_copy(rec_hbm.at[0], buf.at[half, 0],
                                  sem).wait()

    # prologue: meta 0 → wait → records 0 issued; meta 1 in flight
    @pl.when(nch > 0)
    def _():
        meta_issue(0, sem_ma)
        meta_wait(0, sem_ma)
        rec_issue(0, sem_ra)

    @pl.when(nch > 1)
    def _():
        meta_issue(1, sem_mb)
    cp0.wait()
    cp1.wait()

    iox = jax.lax.broadcasted_iota(
        jnp.int32, (1, WIN_W), 1).astype(jnp.float32)
    ioy = jax.lax.broadcasted_iota(
        jnp.int32, (win_h, 1), 0).astype(jnp.float32)

    def chunk(c, _):
        even = c % 2 == 0

        # STATIC buffer-slot indices only (same Mosaic constraint as
        # _composite_kernel — hence the even/odd duplication)
        def stage(half, other, rsem, rsem_o, msem_self, msem_o, c):
            # 1. finish this chunk's record DMAs
            rec_wait(half, rsem)
            # 2. kick next chunk's records (its meta is already in flight)
            @pl.when(c + 1 < nch)
            def _():
                meta_wait(c + 1, msem_o)
                rec_issue(other, rsem_o)
            # 3. process this chunk
            for k in range(CHUNK_WIN):
                w = c * CHUNK_WIN + k

                @pl.when(w < nwin)
                def _():
                    m = mbuf[half, 2 * k]
                    colk = m // 2048
                    y0 = m % 2048
                    # row/col coordinate pieces: full-block ops below are
                    # ONE broadcast-add per plane
                    px = iox + (colk * WIN_W).astype(jnp.float32) + 0.5
                    py = ioy + y0.astype(jnp.float32) + 0.5
                    if use_scissor:
                        gx = (px >= sciss_ref[0]) & (px < sciss_ref[2])
                        gy = (py >= sciss_ref[1]) & (py < sciss_ref[3])
                    # NOTE: a per-tri pl.when gate on slot 12 (skip
                    # invalid tris, drop record compaction) was tried and
                    # measured 68.8 → 184 ms: the scratch-tile round
                    # trips + 786k scalar branches per frame defeat
                    # Mosaic's register carrying and pipelining. Invalid
                    # tris instead rely on zeroed planes (z == 0 fails
                    # z > cur_d since reverse-z depth is >= 0).
                    cur_d = dep_out[colk, pl.ds(y0, win_h), :]
                    cur_w = win_out[colk, pl.ds(y0, win_h), :]
                    for s in range(ntri):

                        def d(j, _b=s * stride, _k=k):
                            f = _b + j          # static flat index
                            return buf[half, _k, f // WIN_W, f % WIN_W]
                        # nedge boundary planes, then the z plane, then
                        # the id slot (nedge=3: triangles, the ZREC/
                        # REC_FIELDS layouts; nedge=4: coplanar quad
                        # records — see build_quad_rec_rows)
                        es = [(d(3 * j) * px + d(3 * j + 2)) +
                              d(3 * j + 1) * py for j in range(nedge)]
                        zb = 3 * nedge
                        z = (d(zb) * px + d(zb + 2)) + d(zb + 1) * py
                        emax = jnp.maximum(es[0], es[1])
                        for ee in es[2:]:
                            emax = jnp.maximum(emax, ee)
                        zpass = (emax <= 0) & (z > cur_d)
                        if use_scissor:
                            zpass = zpass & gx & gy
                        cur_d = jnp.where(zpass, z, cur_d)
                        cur_w = jnp.where(zpass, d(zb + 3), cur_w)
                    dep_out[colk, pl.ds(y0, win_h), :] = cur_d
                    win_out[colk, pl.ds(y0, win_h), :] = cur_w
            # 4. the freed meta slot takes chunk c+2
            @pl.when(c + 2 < nch)
            def _():
                meta_issue(c + 2, msem_self)

        @pl.when(even)
        def _():
            stage(0, 1, sem_ra, sem_rb, sem_ma, sem_mb, c)

        @pl.when(~even)
        def _():
            stage(1, 0, sem_rb, sem_ra, sem_mb, sem_ma, c)
        return 0

    jax.lax.fori_loop(0, nch, chunk, 0)


def to_col_major(img, pad_value=0.0):
    """(H, W) → (ncols, H, 128) column planes (the composite layout)."""
    H, W0 = img.shape
    ncols = (W0 + WIN_W - 1) // WIN_W
    W = ncols * WIN_W
    if W != W0:
        img = jnp.pad(img, ((0, 0), (0, W - W0)), constant_values=pad_value)
    return img.reshape(H, ncols, WIN_W).transpose(1, 0, 2)


def from_col_major(col, width):
    """(ncols, H, 128) → (H, width)."""
    ncols, H, _ = col.shape
    return col.transpose(1, 0, 2).reshape(H, ncols * WIN_W)[:, :width]


@partial(jax.jit, static_argnames=("win_h", "cs", "eval_tris",
                                   "interpret", "viewport", "col_major",
                                   "width", "nedge", "rec_slots"))
def fused_eval_composite(depth, winner, zrec, owner, meta, wvalid, *,
                         win_h=32, cs=12, eval_tris=None, viewport=None,
                         interpret=False, col_major=False, width=None,
                         rec_rows=None, nedge=3, rec_slots=None):
    """Evaluate + merge windows in ONE pallas pass (see _fused_kernel).
    zrec (NCL*cs, ZREC) compacted records (global tri ids in slot 12);
    owner/meta/wvalid from build_windows. Replaces the
    eval_windows → composite_windows pair on the opaque path.

    col_major=True: depth/winner are already (ncols, H, 128) column
    planes and are returned as such — callers running several window
    classes hoist the row↔column relayout out of the loop (it was
    ~3 ms of 29 MB transposes per many_cubes frame). `width` gives the
    true pixel width when col_major (for the scissor default).

    rec_rows: prebuilt (ncl, rrows, 128) REC_FIELDS-stride rows from
    build_rec_rows — hoists the record layout out of the class loop and
    skips this call's internal ZREC-stride build (zrec may then be a
    dummy; its shape still sets ncl for validation)."""
    if col_major:
        ncols, H, _ = depth.shape
        dcol, wcol = depth, winner
    else:
        H, W0 = depth.shape
        ncols = (W0 + WIN_W - 1) // WIN_W
        W = ncols * WIN_W
        if W != W0:
            depth = jnp.pad(depth, ((0, 0), (0, W - W0)))
            winner = jnp.pad(winner, ((0, 0), (0, W - W0)),
                             constant_values=-1.0)
        dcol = depth.reshape(H, ncols, WIN_W).transpose(1, 0, 2)
        wcol = winner.reshape(H, ncols, WIN_W).transpose(1, 0, 2)
    ncl = zrec.shape[0] if zrec.ndim == 3 else zrec.shape[0] // cs
    ntri = cs if eval_tris is None else min(eval_tris, cs)
    b = owner.shape[0]
    bpad = (b + CHUNK_WIN - 1) // CHUNK_WIN * CHUNK_WIN
    if bpad != b:
        owner = jnp.pad(owner, (0, bpad - b))
        meta = jnp.pad(meta, (0, bpad - b))
        wvalid = jnp.pad(wvalid, (0, bpad - b))
    # contiguous per-cluster record rows, lane-padded for aligned DMA:
    # the kernel fetches each window's row by owner id (the XLA-side
    # per-window gather + relayout this replaces was ~9 ms/frame)
    if rec_rows is not None:
        assert rec_rows.shape[0] == ncl
        rrows = rec_rows.shape[1]
        stride = 3 * nedge + 4        # tri rows 13, quad rows 16
        if rec_slots is not None:
            ntri = rec_slots          # quad rows pack ~half the slots
    else:
        assert nedge == 3, "n-gon records require prebuilt rec_rows"
        stride = ZREC
        rowlen = ntri * ZREC
        rowpad = (rowlen + WIN_W - 1) // WIN_W * WIN_W
        rrows = rowpad // WIN_W
        recs = zrec.reshape(ncl, cs * ZREC)
        if rowlen < cs * ZREC:
            recs = recs[:, :rowlen]
        rec_rows = jnp.pad(recs, ((0, 0), (0, rowpad - rowlen))).reshape(
            ncl, rrows, WIN_W)
    nwin = jnp.sum(wvalid.astype(jnp.int32))[None]
    mo = jnp.stack([meta, owner.astype(jnp.int32)], 1).reshape(
        bpad // CHUNK_WIN, 2 * CHUNK_WIN)
    meta_chunks = jnp.pad(mo, ((0, 0), (0, 128 - 2 * CHUNK_WIN)))
    if viewport is not None:
        sciss = jnp.asarray(viewport, jnp.float32)
    else:
        sciss = jnp.zeros(4, jnp.float32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[
            # meta + records pinned to HBM: under ANY the compiler
            # stages the 4 MB meta table into VMEM through serialized
            # async copies (4 x 4.5 ms spans in the round-4 profile) —
            # the kernel already streams rows to SMEM itself
            pl.BlockSpec(memory_space=pltpu.HBM),         # meta chunks
            pl.BlockSpec(memory_space=pltpu.HBM),         # record rows
            pl.BlockSpec(memory_space=pltpu.SMEM),        # scissor
            pl.BlockSpec(memory_space=pl.ANY),            # depth (HBM)
            pl.BlockSpec(memory_space=pl.ANY),            # winner (HBM)
        ],
        out_specs=[
            pl.BlockSpec((ncols, H, WIN_W), lambda *_: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ncols, H, WIN_W), lambda *_: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            # records land in SMEM: every field read is a scalar, and
            # the ~64 scalar loads per window out of a VMEM tile were
            # the dominant per-window fixed cost (same lever as
            # raster2d_splat, round 4)
            pltpu.SMEM((2, CHUNK_WIN, rrows, WIN_W), jnp.float32),
            pltpu.SMEM((2, 128), jnp.int32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )
    dep, win = pl.pallas_call(
        partial(_fused_kernel, win_h=win_h, ntri=ntri, rrows=rrows,
                use_scissor=viewport is not None, load_fb=True,
                stride=stride, nedge=nedge),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((ncols, H, WIN_W), jnp.float32),
                   jax.ShapeDtypeStruct((ncols, H, WIN_W), jnp.float32)],
        interpret=interpret,
    )(nwin.astype(jnp.int32), meta_chunks, rec_rows, sciss, dcol, wcol)
    if col_major:
        return dep, win
    dep = dep.transpose(1, 0, 2).reshape(H, W)[:, :W0]
    win = win.transpose(1, 0, 2).reshape(H, W)[:, :W0]
    return dep, win


@partial(jax.jit, static_argnames=("win_h", "cs", "interpret"))
def composite_windows(depth, winner, windows, owner, meta, wvalid, *,
                      win_h=32, cs=12, interpret=False):
    """Merge evaluated windows into the framebuffer.

    depth/winner (H, W); windows (B, win_h, 128) packed from
    eval_windows; owner/meta/wvalid from build_windows. W pads
    internally to a multiple of 128. Returns updated (depth, winner)
    where depth carries packed z and winner global f32 triangle ids."""
    H, W0 = depth.shape
    ncols = (W0 + WIN_W - 1) // WIN_W
    W = ncols * WIN_W
    if W != W0:
        depth = jnp.pad(depth, ((0, 0), (0, W - W0)))
        winner = jnp.pad(winner, ((0, 0), (0, W - W0)), constant_values=-1.0)
    b = windows.shape[0]
    bpad = (b + CHUNK_WIN - 1) // CHUNK_WIN * CHUNK_WIN
    if bpad != b:
        windows = jnp.pad(windows, ((0, bpad - b), (0, 0), (0, 0)))
        meta = jnp.pad(meta, (0, bpad - b))
        owner = jnp.pad(owner, (0, bpad - b))
        wvalid = jnp.pad(wvalid, (0, bpad - b))
    nwin = jnp.sum(wvalid.astype(jnp.int32))[None]   # valid = prefix
    win_chunks = windows.reshape(bpad // CHUNK_WIN, CHUNK_WIN, win_h, WIN_W)
    # per-chunk meta rows [m0, owner0, m1, owner1, ...] padded to 128 for
    # SMEM DMA alignment
    mo = jnp.stack([meta, owner.astype(jnp.int32)], 1).reshape(
        bpad // CHUNK_WIN, 2 * CHUNK_WIN)
    meta_chunks = jnp.pad(mo, ((0, 0), (0, 128 - 2 * CHUNK_WIN)))
    # (H, W) → (ncols, H, 128): column-major tiles, leading-dim indexable
    dcol = depth.reshape(H, ncols, WIN_W).transpose(1, 0, 2)
    wcol = winner.reshape(H, ncols, WIN_W).transpose(1, 0, 2)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),         # meta chunks
            pl.BlockSpec(memory_space=pltpu.HBM),         # window chunks
            pl.BlockSpec(memory_space=pl.ANY),            # depth (HBM)
            pl.BlockSpec(memory_space=pl.ANY),            # winner (HBM)
        ],
        out_specs=[
            pl.BlockSpec((ncols, H, WIN_W), lambda *_: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ncols, H, WIN_W), lambda *_: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, CHUNK_WIN, win_h, WIN_W), jnp.float32),
            pltpu.SMEM((2, 128), jnp.int32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )
    dep, win = pl.pallas_call(
        partial(_composite_kernel, win_h=win_h, cs=cs),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((ncols, H, WIN_W), jnp.float32),
                   jax.ShapeDtypeStruct((ncols, H, WIN_W), jnp.float32)],
        interpret=interpret,
    )(nwin.astype(jnp.int32), meta_chunks, win_chunks, dcol, wcol)
    dep = dep.transpose(1, 0, 2).reshape(H, W)[:, :W0]
    win = win.transpose(1, 0, 2).reshape(H, W)[:, :W0]
    return dep, win
