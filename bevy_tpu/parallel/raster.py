"""Multi-chip cluster raster (the layer SURVEY.md §2.8 maps to jax
collectives; reference position: the GPU-driven preprocessing of
bevy_render/src/batching/gpu_preprocessing.rs scaled past one device).

Sharding plan (shard_map over one mesh axis, n devices):
  * CLUSTERS shard: device d culls/packs/evals the clusters with
    index % n == d, with record ids offset by a per-device base — the
    same partitioned-id mechanism the two-phase occlusion path uses, so
    per-device record tables concatenate into one global id space.
  * Each device composites its clusters into a private full-res
    visbuffer (packed reverse-z depth + tri-in-cluster id, winner =
    global record row).
  * MERGE is one all_to_all: the framebuffer splits into n row bands;
    after the exchange every device holds all n devices' copies of ITS
    band and takes the depth-argmax (the packed visbuffer makes this
    merge associative and order-free). Communication is H*W floats per
    device — the reduce-scatter shape, riding ICI.
  * Flat-shade records all_gather (k*cs*8 floats, small) and the
    resolve runs row-sharded: each device shades only its band.

The result stays row-sharded (P(axis) on H) — matching the framebuffer
sharding of parallel.world_shardings, so a following post/present pass
keeps the layout.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _mesh_axis(mesh: Mesh):
    """The shard axis of `mesh`: its single axis name, or — for a
    multi-axis mesh like the multi-host ('host', 'chip') layout — the
    TUPLE of all axis names, which jax collectives and PartitionSpec
    treat as one flattened axis (host-major device order, so the ICI
    'chip' axis is minor and ring collectives cross DCN only at host
    boundaries)."""
    names = tuple(mesh.axis_names)
    return names[0] if len(names) == 1 else names


def sharded_flat_raster(mesh: Mesh, cc, cn, tri_ok, mat_tri, light_vec,
                        *, width, height, cluster_size=12, win_h=32,
                        visible_budget=4096, window_budget=8192,
                        interpret=True):
    """Rasterize clusters over every device of `mesh` (one axis).

    cc (T,3,4) clip-space corners, cn (T,3,3) world normals, tri_ok (T,)
    valid, mat_tri (T,9|11) per-tri materials, with T a multiple of
    cluster_size. Flat-forward path (per-tri shade records). Height must
    divide by n_devices. Returns color (4,H,W) row-sharded and depth
    (H,W) row-sharded."""
    from bevy_tpu.ops.raster3d_splat import (
        build_windows, compact_cluster_tris, composite_windows,
        eval_windows)
    from bevy_tpu.ops.raster3d_visbuf import (
        cluster_screen_aabbs, pack_flat_shade, pack_planes_h,
        resolve_flat)

    axis = _mesh_axis(mesh)
    n = mesh.devices.size
    cs = cluster_size
    t = cc.shape[0]
    n_cl = t // cs
    assert height % n == 0, "height must divide across the mesh"
    k = max(8, visible_budget // n)          # per-device cluster budget

    def shard_fn(cc, cn, tri_ok, mat_tri, light_vec):
        d = jax.lax.axis_index(axis)
        # replicated cull: every device computes AABBs once (cheap),
        # then keeps its modulo partition of the visible set
        aabb, cl_valid, _zmax = cluster_screen_aabbs(
            cc, jnp.ones((n_cl,), bool), tri_ok, cs, width, height)
        mine = cl_valid & (jnp.arange(n_cl, dtype=jnp.int32) % n == d)
        # sort-free compaction of my clusters into k slots
        pos = jnp.cumsum(mine.astype(jnp.int32)) - 1
        tgt = jnp.where(mine & (pos < k), pos, k)
        ids = jnp.zeros(k + 1, jnp.int32).at[tgt].set(
            jnp.arange(n_cl, dtype=jnp.int32), mode="drop")[:k]
        v = jnp.arange(k, dtype=jnp.int32) < jnp.sum(mine.astype(jnp.int32))
        tv = k * cs
        cc_v = cc.reshape(n_cl, cs, 3, 4)[ids].reshape(tv, 3, 4)
        cn_v = cn.reshape(n_cl, cs, 3, 3)[ids].reshape(tv, 3, 3)
        ok_v = jnp.broadcast_to(v[:, None], (k, cs)).reshape(tv) & \
            tri_ok.reshape(n_cl, cs)[ids].reshape(tv)
        mat_v = mat_tri.reshape(n_cl, cs, -1)[ids].reshape(tv, -1)
        id_base = d * tv                     # partitioned global id space
        zrec, _, valid = pack_planes_h(cc_v, cn_v, ok_v, width, height,
                                       build_srec=False, id_base=id_base)
        frec = pack_flat_shade(cn_v, mat_v, light_vec, valid)
        zrec_c, _ = compact_cluster_tris(zrec, cs)
        wins = build_windows(aabb[ids], v, win_h=win_h, width=width,
                             height=height, budget=window_budget)
        windows = eval_windows(zrec_c, cs, wins["owner"], wins["meta"],
                               wins["wvalid"], win_h=win_h,
                               id_base=id_base)
        depth = jnp.zeros((height, width), jnp.float32)
        winner = jnp.full((height, width), -1.0, jnp.float32)
        depth, winner = composite_windows(
            depth, winner, windows, wins["owner"] + d * k, wins["meta"],
            wins["wvalid"], win_h=win_h, cs=cs, interpret=interpret)
        # ---- merge: band all_to_all + depth argmax ----
        bh = height // n
        db = jax.lax.all_to_all(depth.reshape(n, bh, width), axis, 0, 0,
                                tiled=False)        # (n, bh, W): src dev
        wb = jax.lax.all_to_all(winner.reshape(n, bh, width), axis, 0, 0,
                                tiled=False)
        src = jnp.argmax(db, axis=0)
        band_depth = jnp.max(db, axis=0)
        band_winner = jnp.take_along_axis(wb, src[None], axis=0)[0]
        band_winner = jnp.where(band_depth > 0.0, band_winner, -1.0)
        # ---- row-sharded resolve with the gathered global records ----
        frec_all = jax.lax.all_gather(frec, axis).reshape(n * tv, -1)
        band_color = jnp.zeros((4, bh, width), jnp.float32)
        band_color = resolve_flat(band_winner.astype(jnp.int32), frec_all,
                                  band_color)
        return band_color, band_depth

    fn = jax.jit(jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(), P(), P(), P(), P()),
        out_specs=(P(None, axis, None), P(axis, None)),
        check_vma=False))       # pallas_call outputs carry no vma info
    return fn(cc, cn, tri_ok, mat_tri, light_vec)


def sharded_instance_raster(mesh: Mesh, clip, nrm, triangles, inst_ok,
                            mat_inst, light_vec, color, depth, *,
                            width, height, cluster_size=12, win_h=32,
                            window_budget=8192, eval_tris=None,
                            interpret=True):
    """Full flat-opaque mesh pass sharded over INSTANCES (the product
    path Mesh3dPlugin(shards=...) uses for e.g. many_cubes; reference
    position: gpu_preprocessing.rs scaled past one device).

    Per device (shard_map over `mesh`'s one axis):
      1. its instance slice runs corner extraction (one-hot MXU matmul),
         cluster screen AABBs + conservative frustum cull, plane packing
         with a per-device global id base, and flat shade records;
      2. windows build/eval/composite into a PRIVATE full-res visbuffer
         (packed reverse-z|id — associative max merge);
      3. ONE all_to_all exchanges framebuffer row bands (the
         reduce-scatter shape: H*W floats in, H*W out per device), each
         device max-merges its band;
      4. flat records all_gather (k*cs*8 floats, small) and the resolve
         shades row-sharded bands only.

    clip (Ni, VC, 4) clip-space vertices, nrm (Ni, VC, 3), triangles
    (TC, 3) STATIC numpy, inst_ok (Ni,), mat_inst (Ni, 9). Ni and height
    must divide by the device count. color (4, H, W) / depth (H, W) are
    the background/target buffers. Returns (color, depth, overflow)
    row-sharded."""
    import numpy as _np

    from bevy_tpu.ops.raster3d_splat import (
        build_windows, compact_cluster_tris, composite_windows,
        eval_windows)
    from bevy_tpu.ops.raster3d_visbuf import (
        cluster_screen_aabbs, pack_flat_shade, pack_planes_h,
        resolve_flat)

    axis = _mesh_axis(mesh)
    n = mesh.devices.size
    cs = cluster_size
    ni, vc = clip.shape[0], clip.shape[1]
    assert ni % n == 0, "instance count must divide across the mesh"
    assert height % n == 0, "height must divide across the mesh"
    nis = ni // n                           # instances per device
    tc0 = int(triangles.shape[0])
    tcp = (tc0 + cs - 1) // cs * cs
    tris = _np.zeros((tcp, 3), _np.int32)
    tris[:tc0] = _np.asarray(triangles, _np.int32)
    cc_num = tcp // cs
    onehot = _np.zeros((vc, tcp * 3), _np.float32)
    for ti in range(tcp):
        for kk in range(3):
            onehot[int(tris[ti, kk]), ti * 3 + kk] = 1.0
    onehot_j = jnp.asarray(onehot)
    k = nis * cc_num                        # per-device clusters (all)
    tv = k * cs

    def shard_fn(clip_s, nrm_s, ok_s, mat_s, light_vec, color_s, depth_s):
        d = jax.lax.axis_index(axis)
        quant = jnp.concatenate([jnp.moveaxis(clip_s, -1, 1),
                                 jnp.moveaxis(nrm_s, -1, 1)], axis=1)
        corners = jnp.einsum("nqv,vc->nqc", quant, onehot_j)
        corners = corners.reshape(nis, 7, tcp, 3)
        cc = jnp.moveaxis(corners[:, 0:4], 1, -1).reshape(tv, 3, 4)
        cn = jnp.moveaxis(corners[:, 4:7], 1, -1).reshape(tv, 3, 3)
        tri_ok = jnp.broadcast_to(ok_s[:, None], (nis, tcp)).reshape(tv)
        aabb, cl_valid, _zmax = cluster_screen_aabbs(
            cc, jnp.broadcast_to(ok_s[:, None], (nis, cc_num)
                                 ).reshape(k), tri_ok, cs, width, height)
        mat_tri = jnp.broadcast_to(
            mat_s[:, None, None, :], (nis, cc_num, cs, mat_s.shape[1])
        ).reshape(tv, -1)
        id_base = d * tv                    # partitioned global id space
        zrec, _, valid = pack_planes_h(cc, cn, tri_ok, width, height,
                                       build_srec=False, id_base=id_base)
        frec = pack_flat_shade(cn, mat_tri, light_vec, valid)
        zrec_c, _ = compact_cluster_tris(zrec, cs)
        depth_p = jnp.zeros((height, width), jnp.float32)
        winner = jnp.full((height, width), -1.0, jnp.float32)
        overflow = jnp.zeros((), jnp.int32)
        # window height classes as in raster_batched
        h_px = aabb[:, 3] - aabb[:, 1]
        half_h = max(win_h // 2, 8)
        for class_h, cmask in ((half_h, h_px <= half_h - 1.0),
                               (win_h, h_px > half_h - 1.0)):
            wins = build_windows(aabb, cl_valid & cmask, win_h=class_h,
                                 width=width, height=height,
                                 budget=window_budget)
            windows = eval_windows(zrec_c, cs, wins["owner"],
                                   wins["meta"], wins["wvalid"],
                                   win_h=class_h, eval_tris=eval_tris,
                                   id_base=id_base)
            depth_p, winner = composite_windows(
                depth_p, winner, windows, wins["owner"] + d * k,
                wins["meta"], wins["wvalid"], win_h=class_h, cs=cs,
                interpret=interpret)
            overflow = overflow + wins["overflow"] + \
                jnp.sum(wins["fallback"].astype(jnp.int32))
        # ---- merge: band all_to_all + packed-depth max (order-free) ----
        bh = height // n
        db = jax.lax.all_to_all(depth_p.reshape(n, bh, width), axis, 0, 0,
                                tiled=False)
        wb = jax.lax.all_to_all(winner.reshape(n, bh, width), axis, 0, 0,
                                tiled=False)
        src = jnp.argmax(db, axis=0)
        band_depth = jnp.maximum(jnp.max(db, axis=0), depth_s)
        band_winner = jnp.take_along_axis(wb, src[None], axis=0)[0]
        band_winner = jnp.where(jnp.max(db, axis=0) > depth_s,
                                band_winner, -1.0)
        # ---- row-sharded resolve over gathered global records ----
        frec_all = jax.lax.all_gather(frec, axis).reshape(n * tv, -1)
        band_color = resolve_flat(band_winner.astype(jnp.int32), frec_all,
                                  color_s)
        return band_color, band_depth, jax.lax.psum(overflow, axis)

    fn = jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis), P(),
                  P(None, axis, None), P(axis, None)),
        out_specs=(P(None, axis, None), P(axis, None), P()),
        check_vma=False)
    return fn(clip, nrm, inst_ok, mat_inst, light_vec, color, depth)


def sharded_deferred_shade(mesh: Mesh, gbuffer, depth, light_table,
                           tile_counts, params, shadow=None, *,
                           tile_h=32, tile_w=128, max_per_tile=256,
                           interpret=True, **spec_kw):
    """Row-band sharded deferred G-buffer shade (VERDICT r2 #5: extend
    sharding past the flat resolve; ref position: the per-view clustered
    shade of bevy_pbr/src/render/clustered_forward.wesl scaled past one
    device).

    The G-buffer/depth/shadow planes shard by rows; the tile light table
    (built once, replicated — binning is cheap after the row-gather
    rework) is sliced per device to its band's tile rows. Each device
    runs the SAME deferred_shade kernel on its band with a global row
    offset in params[34], so ray reconstruction matches the unsharded
    frame bit-for-bit. No collectives: shading is pixel-local; the
    result stays row-sharded for a following post/present pass."""
    from bevy_tpu.ops.shade_pallas import deferred_shade

    axis = _mesh_axis(mesh)
    n = mesh.devices.size
    c, h, w = gbuffer.shape
    band = (h + n * tile_h - 1) // (n * tile_h) * tile_h   # rows per device
    hp = band * n
    ntx = (w + tile_w - 1) // tile_w
    ntyb = band // tile_h

    gb = jnp.pad(gbuffer, ((0, 0), (0, hp - h), (0, 0)))
    dp = jnp.pad(depth, ((0, hp - h), (0, 0)))
    sh = jnp.ones((hp, w), jnp.float32) if shadow is None else \
        jnp.pad(shadow, ((0, hp - h), (0, 0)), constant_values=1.0)

    def shard_fn(gb_s, dp_s, sh_s, table, counts, prm):
        d = jax.lax.axis_index(axis)
        t0 = d * ntyb * ntx
        table_b = jax.lax.dynamic_slice_in_dim(table, t0, ntyb * ntx, 0)
        counts_b = jax.lax.dynamic_slice_in_dim(counts, t0, ntyb * ntx, 0)
        prm = prm.at[34].set((d * band).astype(jnp.float32))
        return deferred_shade(
            gb_s, dp_s, table_b, counts_b, prm, sh_s, tile_h=tile_h,
            tile_w=tile_w, max_per_tile=max_per_tile, interpret=interpret,
            **spec_kw)

    fn = jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(None, axis, None), P(axis, None), P(axis, None),
                  P(), P(), P()),
        out_specs=P(None, axis, None),
        check_vma=False)
    color = fn(gb, dp, sh, light_table, tile_counts, params)
    return color[:, :h, :w]
