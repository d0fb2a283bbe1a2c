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

    axis = mesh.axis_names[0]
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
