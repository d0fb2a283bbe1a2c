"""Visibility-buffer rasterizer (ops/raster3d_visbuf.py) vs the XLA
reference rasterizer (ops/raster3d.py) — same scene, same conventions
(reference twin for behavior: bevy meshlet sw raster + opaque main pass)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from bevy_tpu.math.affine import TRS, trs_to_mat4
from bevy_tpu.math.quat import quat_rotate_vec3
from bevy_tpu.ops.raster3d import raster_triangles, triangle_setup
from bevy_tpu.ops.raster3d_visbuf import (
    bin_clusters, build_cluster_meta, cluster_records, cluster_screen_aabbs,
    pack_planes_h, raster_visbuf, resolve_forward, tile_chunk_records,
)
from bevy_tpu.render.camera import perspective_infinite_reverse, view_matrix
from bevy_tpu.render.mesh import cuboid

W, H = 256, 128
TILE_H, TILE_W = 32, 128
LIGHT = jnp.concatenate([
    jnp.asarray([0.0, -0.7071, -0.7071, 1.0, 0.9, 0.8,
                 0.1, 0.1, 0.12], jnp.float32), jnp.zeros(7, jnp.float32)])


def _scene(n=40, seed=0, spread=6.0, z_range=(-14.0, -3.0)):
    rng = np.random.RandomState(seed)
    xyz = np.stack([
        rng.uniform(-spread, spread, n),
        rng.uniform(-spread / 2, spread / 2, n),
        rng.uniform(z_range[0], z_range[1], n)], 1).astype(np.float32)
    col = rng.uniform(0.1, 1.0, (n, 4)).astype(np.float32)
    col[:, 3] = 1.0
    return jnp.asarray(xyz), jnp.asarray(col)


def _render_both(xyz, col, n, hiz=False):
    m = cuboid(1.0, 1.0, 1.0)
    vc, tc = m.num_vertices, m.num_triangles
    view = view_matrix(jnp.zeros(3), jnp.asarray([0.0, 0.0, 0.0, 1.0]),
                       jnp.ones(3))
    proj = perspective_infinite_reverse(jnp.asarray(0.9), W / H,
                                        jnp.asarray(0.1))
    vp = proj @ view
    rot = jnp.tile(jnp.asarray([0.2474, 0.0, 0.0, 0.9689]), (n, 1))
    mats = trs_to_mat4(TRS(translation=xyz, rotation=rot,
                           scale=jnp.ones((n, 3))))
    mvp = jnp.einsum("ij,njk->nik", vp, mats)
    ph = jnp.concatenate([jnp.asarray(m.positions),
                          jnp.ones((vc, 1), jnp.float32)], 1)
    clip = jnp.einsum("nij,vj->nvi", mvp, ph)           # (n, vc, 4)
    nrm = quat_rotate_vec3(rot[:, None, :], jnp.asarray(m.normals)[None])

    # ---- XLA reference path (per-tri, w-guard drops straddlers)
    clip_flat = clip.reshape(n * vc, 4)
    nrm_flat = nrm.reshape(n * vc, 3)
    tri_verts = (jnp.asarray(m.triangles, jnp.int32)[None] +
                 (jnp.arange(n, dtype=jnp.int32) * vc)[:, None, None]
                 ).reshape(n * tc, 3)
    tri_active = jnp.ones(n * tc, bool)
    setup = triangle_setup(clip_flat, tri_verts, tri_active, W, H)
    corner_n = nrm_flat[tri_verts]
    colors = jnp.repeat(col, tc, axis=0)
    varyings = jnp.concatenate(
        [corner_n,
         jnp.broadcast_to(colors[:, None, :], (n * tc, 3, 4)),
         jnp.zeros((n * tc, 3, 3))], axis=2)

    def shade(interp, ti, bary):
        nn = interp[..., 0:3]
        nn = nn * jax.lax.rsqrt(jnp.maximum(
            jnp.sum(nn * nn, -1, keepdims=True), 1e-12))
        lam = jnp.maximum(0.0, -jnp.sum(nn * LIGHT[:3], -1))
        rgb = interp[..., 3:6] * (LIGHT[6:9] + LIGHT[3:6] * lam[..., None]) \
            + interp[..., 7:10]
        return jnp.concatenate([rgb, interp[..., 6:7]], -1)

    fb0 = jnp.zeros((H, W, 4), jnp.float32)
    dep0 = jnp.zeros((H, W), jnp.float32)
    ref_fb, ref_dep, _ = raster_triangles(
        fb0, dep0, setup, varyings, shade,
        tile_h=TILE_H, tile_w=TILE_W, max_per_tile=1024)

    # ---- visbuf path
    cc = clip_flat[tri_verts]                   # (T, 3, 4)
    cn = corner_n
    mat_inst = jnp.concatenate([col, jnp.zeros((n, 3)),
                                jnp.zeros((n, 2))], 1)      # (n, 9)
    mat_tri = jnp.repeat(mat_inst, tc, axis=0)
    zrec, srec, valid = pack_planes_h(cc, cn, jnp.ones(n * tc, bool), W, H,
                                      materials=mat_tri)
    aabb, cl_valid, zmax = cluster_screen_aabbs(
        cc, jnp.ones(n, bool).repeat(1), valid, tc, W, H)
    ntx = (W + TILE_W - 1) // TILE_W
    nty = (H + TILE_H - 1) // TILE_H
    dep = jnp.zeros((H, W), jnp.float32)
    win = jnp.full((H, W), -1.0, jnp.float32)
    okey = None
    if hiz:  # front-to-back in-tile order (any order must give same image)
        okey = jnp.clip((1.0 - zmax) * 65535.0, 0, 65535).astype(jnp.int32)
    cl_table, cl_counts, stats = bin_clusters(
        aabb, cl_valid, ntx=ntx, nty=nty, tile_w=TILE_W, tile_h=TILE_H,
        max_clusters_per_tile=max(n, 8), pair_budget=n * 8 + ntx * nty,
        order_key=okey)
    meta = build_cluster_meta(cl_table, zmax)
    recs = tile_chunk_records(cluster_records(zrec, tc), cl_table)
    dep, win = raster_visbuf(dep, win, recs, meta, cl_counts,
                             tile_h=TILE_H, tile_w=TILE_W, cs=tc,
                             interpret=True)
    fb = resolve_forward(win.astype(jnp.int32), srec, LIGHT,
                         jnp.zeros((4, H, W), jnp.float32))
    assert int(stats["pair_overflow"]) == 0
    assert int(stats["tile_overflow"]) == 0
    return (np.asarray(ref_fb), np.asarray(ref_dep),
            np.moveaxis(np.asarray(fb), 0, -1), np.asarray(dep))


def test_visbuf_matches_reference():
    xyz, col = _scene(40)
    ref_fb, ref_dep, fb, dep = _render_both(xyz, col, 40)
    # coverage agreement (straddler-free scene): same pixels hit
    ref_hit = ref_dep > 0
    hit = dep > 0
    disagree = np.mean(ref_hit != hit)
    assert disagree < 0.002, f"coverage disagreement {disagree}"
    both = ref_hit & hit
    assert np.allclose(ref_dep[both], dep[both], atol=1e-4)
    err = np.abs(ref_fb[both] - fb[both])
    assert np.percentile(err, 99) < 0.02, np.percentile(err, 99)


def test_visbuf_near_straddlers_render():
    """Cubes crossing the near plane must still rasterize their front parts
    (clipless homogeneous raster; the reference path drops those tris)."""
    n = 12
    rng = np.random.RandomState(3)
    xyz = np.stack([
        rng.uniform(-1.5, 1.5, n),
        rng.uniform(-1.0, 1.0, n),
        rng.uniform(-1.2, 0.4, n)], 1).astype(np.float32)  # camera inside
    col = np.full((n, 4), 0.8, np.float32)
    _, _, fb, dep = _render_both(jnp.asarray(xyz), jnp.asarray(col), n)
    assert np.isfinite(fb).all()
    assert np.isfinite(dep).all()
    assert (dep > 0).mean() > 0.05     # geometry did render


def test_visbuf_hiz_matches_simple():
    """Front-to-back in-tile ordering must produce the same image as
    arbitrary ordering (the z-buffer resolves either)."""
    xyz, col = _scene(40, seed=7)
    _, _, fb_a, dep_a = _render_both(xyz, col, 40, hiz=False)
    _, _, fb_b, dep_b = _render_both(xyz, col, 40, hiz=True)
    assert np.allclose(dep_a, dep_b, atol=1e-6)
    assert np.allclose(fb_a, fb_b, atol=1e-5)


def test_visbuf_depth_order():
    """Nearer cube wins the z-test in the visbuffer."""
    xyz = jnp.asarray([[0.0, 0.0, -5.0], [0.3, 0.0, -9.0]], jnp.float32)
    col = jnp.asarray([[1.0, 0.0, 0.0, 1.0], [0.0, 1.0, 0.0, 1.0]])
    _, _, fb, dep = _render_both(xyz, col, 2)
    cy, cx = H // 2, W // 2
    # center pixel: front (red-ish) cube
    assert fb[cy, cx, 0] > fb[cy, cx, 1]
