"""Window-splat rasterizer (ops/raster3d_splat.py) vs the XLA reference
rasterizer — visible clusters decompose into block windows; giant
footprints go to the streaming-kernel fallback (ref behavior: bevy
meshlet sw/hw raster split)."""

import numpy as np
import jax
import jax.numpy as jnp

from bevy_tpu.math.affine import TRS, trs_to_mat4
from bevy_tpu.math.quat import quat_rotate_vec3
from bevy_tpu.ops.raster3d import raster_triangles, triangle_setup
from bevy_tpu.ops.raster3d_splat import (
    build_windows, compact_cluster_tris, composite_windows, eval_windows,
)
from bevy_tpu.ops.raster3d_visbuf import (
    cluster_screen_aabbs, pack_planes_h, resolve_forward,
)
from bevy_tpu.render.camera import perspective_infinite_reverse, view_matrix
from bevy_tpu.render.mesh import cuboid

W, H = 256, 128
WIN_H = 16
LIGHT = jnp.concatenate([
    jnp.asarray([0.0, -0.7071, -0.7071, 1.0, 0.9, 0.8,
                 0.1, 0.1, 0.12], jnp.float32), jnp.zeros(7, jnp.float32)])


def _render_both(xyz, col, n, eval_tris=None, compact=False, max_blocks=32):
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
    clip = jnp.einsum("nij,vj->nvi", mvp, ph)
    nrm = quat_rotate_vec3(rot[:, None, :], jnp.asarray(m.normals)[None])

    # ---- XLA reference path
    clip_flat = clip.reshape(n * vc, 4)
    nrm_flat = nrm.reshape(n * vc, 3)
    tri_verts = (jnp.asarray(m.triangles, jnp.int32)[None] +
                 (jnp.arange(n, dtype=jnp.int32) * vc)[:, None, None]
                 ).reshape(n * tc, 3)
    setup = triangle_setup(clip_flat, tri_verts,
                           jnp.ones(n * tc, bool), W, H)
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

    ref_fb, ref_dep, _ = raster_triangles(
        jnp.zeros((H, W, 4), jnp.float32), jnp.zeros((H, W), jnp.float32),
        setup, varyings, shade, tile_h=32, tile_w=128, max_per_tile=1024)

    # ---- splat path
    cc = clip_flat[tri_verts]
    mat_inst = jnp.concatenate([col, jnp.zeros((n, 5))], 1)
    mat_tri = jnp.repeat(mat_inst, tc, axis=0)
    zrec, srec, valid = pack_planes_h(cc, corner_n, jnp.ones(n * tc, bool),
                                      W, H, materials=mat_tri)
    if compact:
        zrec_e, max_valid = compact_cluster_tris(zrec, tc)
        assert int(max_valid) <= (eval_tris or tc)
    else:
        zrec_e = zrec
    aabb, cl_valid, zmax = cluster_screen_aabbs(
        cc, jnp.ones(n, bool), valid, tc, W, H)
    wins = build_windows(aabb, cl_valid, win_h=WIN_H, width=W, height=H,
                         budget=max(16 * n, 64), max_blocks=max_blocks)
    assert int(wins["overflow"]) == 0
    windows = eval_windows(zrec_e, tc, wins["owner"], wins["meta"],
                           wins["wvalid"], win_h=WIN_H,
                           eval_tris=eval_tris)
    dep = jnp.zeros((H, W), jnp.float32)
    win = jnp.full((H, W), -1.0, jnp.float32)
    dep, win = composite_windows(dep, win, windows, wins["owner"],
                                 wins["meta"], wins["wvalid"],
                                 win_h=WIN_H, cs=tc, interpret=True)
    fb = resolve_forward(win.astype(jnp.int32), srec, LIGHT,
                         jnp.zeros((4, H, W), jnp.float32))
    n_fallback = int(jnp.sum(wins["fallback"]))
    return (np.asarray(ref_fb), np.asarray(ref_dep),
            np.moveaxis(np.asarray(fb), 0, -1), np.asarray(dep), n_fallback)


def _scene(n, seed=0, z_range=(-60.0, -25.0), spread=18.0):
    rng = np.random.RandomState(seed)
    xyz = np.stack([
        rng.uniform(-spread, spread, n),
        rng.uniform(-spread / 2, spread / 2, n),
        rng.uniform(z_range[0], z_range[1], n)], 1).astype(np.float32)
    col = rng.uniform(0.1, 1.0, (n, 4)).astype(np.float32)
    col[:, 3] = 1.0
    return jnp.asarray(xyz), jnp.asarray(col)


def _compare(ref_fb, ref_dep, fb, dep, cov_tol=0.003):
    ref_hit = ref_dep > 0
    hit = dep > 0
    disagree = np.mean(ref_hit != hit)
    assert disagree < cov_tol, f"coverage disagreement {disagree}"
    both = ref_hit & hit
    # dep carries packed id bits in the low mantissa — compare loosely
    assert np.allclose(ref_dep[both], dep[both], atol=1e-4)
    err = np.abs(ref_fb[both] - fb[both])
    assert np.percentile(err, 99) < 0.02, np.percentile(err, 99)


def test_splat_matches_reference_far_scene():
    xyz, col = _scene(60)
    ref_fb, ref_dep, fb, dep, nfb = _render_both(xyz, col, 60)
    assert nfb == 0
    _compare(ref_fb, ref_dep, fb, dep)


def test_splat_multiblock_near_cubes():
    """Nearer cubes span multiple block windows and still match."""
    xyz, col = _scene(8, seed=5, z_range=(-8.0, -4.0), spread=3.0)
    ref_fb, ref_dep, fb, dep, nfb = _render_both(xyz, col, 8)
    assert nfb == 0          # multi-block, but under the fallback cap
    _compare(ref_fb, ref_dep, fb, dep, cov_tol=0.006)


def test_splat_giant_goes_to_fallback():
    """A cube filling the screen exceeds max_blocks → fallback set."""
    xyz = jnp.asarray([[0.0, 0.0, -0.9]], jnp.float32)
    col = jnp.ones((1, 4), jnp.float32)
    *_, nfb = _render_both(xyz, col, 1, max_blocks=4)
    assert nfb == 1


def test_splat_compacted_eval_cap():
    """Per-cluster compaction + eval_tris=8 renders identically (a cube
    never has more than ~7 front-facing triangles)."""
    xyz, col = _scene(40, seed=3)
    ref_fb, ref_dep, fb, dep, _ = _render_both(xyz, col, 40, eval_tris=8,
                                               compact=True)
    _compare(ref_fb, ref_dep, fb, dep)


def test_fused_matches_two_pass():
    """fused_eval_composite (in-kernel per-owner record DMA, row/col
    edge decomposition) must match the eval_windows+composite_windows
    pair pixel-for-pixel (winner ids; depth up to the packed id bits the
    two-pass path folds into the mantissa)."""
    from bevy_tpu.ops.raster3d_splat import fused_eval_composite

    n = 40
    xyz, col = _scene(n, seed=3)
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
    clip = jnp.einsum("nij,vj->nvi", mvp, ph).reshape(n * vc, 4)
    tri_verts = (jnp.asarray(m.triangles, jnp.int32)[None] +
                 (jnp.arange(n, dtype=jnp.int32) * vc)[:, None, None]
                 ).reshape(n * tc, 3)
    cc = clip[tri_verts]
    nrm = quat_rotate_vec3(rot[:, None, :], jnp.asarray(m.normals)[None]
                           ).reshape(n * vc, 3)[tri_verts]
    zrec, _, valid = pack_planes_h(cc, nrm, jnp.ones(n * tc, bool), W, H)
    zrec_c, _ = compact_cluster_tris(zrec, tc)
    aabb, cl_valid, _ = cluster_screen_aabbs(
        cc, jnp.ones(n, bool), valid, tc, W, H)
    wins = build_windows(aabb, cl_valid, win_h=WIN_H, width=W, height=H,
                         budget=max(16 * n, 64))

    dep0 = jnp.zeros((H, W), jnp.float32)
    win0 = jnp.full((H, W), -1.0, jnp.float32)
    windows = eval_windows(zrec_c, tc, wins["owner"], wins["meta"],
                           wins["wvalid"], win_h=WIN_H, eval_tris=8)
    dep_a, win_a = composite_windows(dep0, win0, windows, wins["owner"],
                                     wins["meta"], wins["wvalid"],
                                     win_h=WIN_H, cs=tc, interpret=True)
    dep_b, win_b = fused_eval_composite(dep0, win0, zrec_c, wins["owner"],
                                        wins["meta"], wins["wvalid"],
                                        win_h=WIN_H, cs=tc, eval_tris=8,
                                        interpret=True)
    assert np.array_equal(np.asarray(win_a), np.asarray(win_b))
    hit = np.asarray(dep_a) > 0
    assert np.allclose(np.asarray(dep_a)[hit], np.asarray(dep_b)[hit],
                       atol=1e-4)

    # gather-free prebuilt record rows (build_rec_rows, 13-field stride):
    # must be pixel-identical to the in-call ZREC-stride build — note it
    # takes the UNcompacted zrec (it partitions valid-first itself)
    from bevy_tpu.ops.raster3d_splat import build_rec_rows
    rec_rows = build_rec_rows(zrec, tc, 8)
    dep_c, win_c = fused_eval_composite(dep0, win0, zrec_c, wins["owner"],
                                        wins["meta"], wins["wvalid"],
                                        win_h=WIN_H, cs=tc, eval_tris=8,
                                        interpret=True, rec_rows=rec_rows)
    assert np.array_equal(np.asarray(win_b), np.asarray(win_c))
    assert np.array_equal(np.asarray(dep_b), np.asarray(dep_c))



def test_quad_records_match_tri_records():
    """Coplanar-quad records (4-edge windows, half the slots) must cover
    the same pixels as the triangle records: quad boundary edges reuse
    the tris' own lambda planes bit-for-bit, so coverage is identical
    except the vanished interior diagonal; depth differs only by the
    coplanar pair's plane-coefficient rounding."""
    from bevy_tpu.ops.raster3d_splat import (
        build_quad_rec_rows, build_rec_rows, coplanar_quad_pairs,
        fused_eval_composite)
    from bevy_tpu.render.mesh import cuboid

    m = cuboid(1.0, 1.0, 1.0)
    entries = coplanar_quad_pairs(m.positions, m.triangles)
    assert sum(1 for e in entries if e[0] == "pair") == 6  # 6 faces

    n = 24
    xyz, col = _scene(n, seed=11)
    vc, tc = m.num_vertices, m.num_triangles
    view = view_matrix(jnp.zeros(3), jnp.asarray([0.0, 0.0, 0.0, 1.0]),
                       jnp.ones(3))
    proj = perspective_infinite_reverse(jnp.asarray(0.9), W / H,
                                        jnp.asarray(0.1))
    vp = proj @ view
    rot = jnp.tile(jnp.asarray([0.2474, 0.0, 0.3, 0.9689]), (n, 1))
    rot = rot / jnp.linalg.norm(rot, axis=1, keepdims=True)
    mats = trs_to_mat4(TRS(translation=xyz, rotation=rot,
                           scale=jnp.ones((n, 3))))
    mvp = jnp.einsum("ij,njk->nik", vp, mats)
    ph = jnp.concatenate([jnp.asarray(m.positions),
                          jnp.ones((vc, 1), jnp.float32)], 1)
    clip = jnp.einsum("nij,vj->nvi", mvp, ph).reshape(n * vc, 4)
    tri_verts = (jnp.asarray(m.triangles, jnp.int32)[None] +
                 (jnp.arange(n, dtype=jnp.int32) * vc)[:, None, None]
                 ).reshape(n * tc, 3)
    cc = clip[tri_verts]
    nrm = quat_rotate_vec3(rot[:, None, :], jnp.asarray(m.normals)[None]
                           ).reshape(n * vc, 3)[tri_verts]
    zrec, _, valid = pack_planes_h(cc, nrm, jnp.ones(n * tc, bool), W, H)
    aabb, cl_valid, _ = cluster_screen_aabbs(
        cc, jnp.ones(n, bool), valid, tc, W, H)
    wins = build_windows(aabb, cl_valid, win_h=WIN_H, width=W, height=H,
                         budget=max(16 * n, 64))
    dep0 = jnp.zeros((H, W), jnp.float32)
    win0 = jnp.full((H, W), -1.0, jnp.float32)

    tri_rows = build_rec_rows(zrec, tc, 8)
    dep_t, win_t = fused_eval_composite(
        dep0, win0, zrec, wins["owner"], wins["meta"], wins["wvalid"],
        win_h=WIN_H, cs=tc, eval_tris=8, interpret=True,
        rec_rows=tri_rows)
    quad_rows = build_quad_rec_rows(zrec, tc, entries, 4)
    dep_q, win_q = fused_eval_composite(
        dep0, win0, zrec, wins["owner"], wins["meta"], wins["wvalid"],
        win_h=WIN_H, cs=tc, eval_tris=8, interpret=True,
        rec_rows=quad_rows, nedge=4, rec_slots=4)

    hit_t = np.asarray(dep_t) > 0
    hit_q = np.asarray(dep_q) > 0
    assert np.mean(hit_t != hit_q) < 0.002          # coverage identical
    both = hit_t & hit_q
    # winner ids agree up to the face pair (quad id = its A tri): map
    # both to the face index (tri_id // 2 within the cube's 12 tris)
    face_t = (np.asarray(win_t).astype(np.int64) % tc) // 2
    face_q = (np.asarray(win_q).astype(np.int64) % tc) // 2
    assert np.mean(face_t[both] != face_q[both]) < 0.002
    # depth matches wherever the same face won (elsewhere — shared
    # silhouette-edge pixels — either face's depth is a valid winner).
    # The quad reuses tri A's z plane over tri B's half, so depth
    # differs by the coplanar pair's coefficient rounding (measured
    # max 6e-6 reverse-z here — far below the 1e-4 the splat-vs-
    # reference comparisons already allow)
    same = both & (face_t == face_q)
    assert np.allclose(np.asarray(dep_t)[same], np.asarray(dep_q)[same],
                       atol=1e-4)
