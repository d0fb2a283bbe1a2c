"""3D mesh rendering (reference twin: bevy_pbr's mesh pipeline —
MeshUniform/RenderMeshInstance `src/render/mesh.rs:517,839`, GPU
preprocessing transform+cull `src/render/gpu_preprocess.rs`, opaque main
pass; lighting starts as Lambert directional + ambient, the first slice of
`pbr_lighting.wesl`).

TPU design: all mesh instances render in ONE pass. A host-side "expansion"
table (rebuilt only on structural change, via App prepare hooks) flattens
instances to vertices/triangles; the per-frame vertex stage is a batched
matmul + gathers; triangles go through the tile-binned z-buffer kernel
(ops/raster3d_pallas.py, XLA reference in ops/raster3d.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from bevy_tpu.app.main_schedule import Render
from bevy_tpu.app.plugin import Plugin
from bevy_tpu.ecs.component import component, field, resource
from bevy_tpu.ecs.query import Query, Read, Res, ResMut
from bevy_tpu.ecs.system import system
from bevy_tpu.math.affine import TRS, trs_to_mat4
from bevy_tpu.math.quat import quat_rotate_vec3
from bevy_tpu.render.camera import (
    Camera3d, perspective_infinite_reverse, pick_camera, view_matrix,
)
from bevy_tpu.render.mesh import MeshPool
from bevy_tpu.render.plugin import PASS_SET, RenderTarget


@component
class Mesh3d:
    """Handle into the MeshPool slab (ref: Mesh3d component + Handle<Mesh>).
    lod_near/lod_far bound the camera-distance band in which the instance
    renders (ref: VisibilityRange, bevy_camera/src/visibility/range.rs)."""
    mesh = field((), jnp.int32)
    layers = field((), jnp.int32, default=1)  # ref: RenderLayers bitmask
    lod_near = field((), jnp.float32, default=0.0)
    lod_far = field((), jnp.float32, default=3.4e38)


@component
class MeshMaterial:
    """StandardMaterial subset (ref: bevy_pbr/src/pbr_material.rs — base
    color, emissive, metallic/roughness, base_color_texture). Textures
    live in the plugin's atlas (the bindless-array equivalent); uv_min ==
    uv_max (the default) means untextured. Set uv_* from an
    AtlasBuilder handle's uv rect."""
    base_color = field(4, default=(1.0, 1.0, 1.0, 1.0))
    emissive = field(3)
    metallic = field((), jnp.float32)
    perceptual_roughness = field((), jnp.float32, default=0.5)
    clearcoat = field((), jnp.float32)          # ref: clearcoat lobe weight
    clearcoat_roughness = field((), jnp.float32, default=0.5)
    specular_transmission = field((), jnp.float32)   # ref: transmission
    ior = field((), jnp.float32, default=1.5)
    # ref: pbr_material.rs anisotropy_strength / anisotropy_rotation —
    # stretches the specular lobe along the (rotated) mesh tangent
    anisotropy_strength = field((), jnp.float32)
    anisotropy_rotation = field((), jnp.float32)
    # ref: parallax_depth_scale + depth_map (atlas rect; equal = none) +
    # max_parallax_layer_count (static knob on Mesh3dPlugin)
    parallax_depth_scale = field((), jnp.float32)
    dm_min = field(2)
    dm_max = field(2)
    # ref: volumetric transmission — thickness, attenuation_distance
    # (0 = infinite/off), attenuation_color, diffuse_transmission
    thickness = field((), jnp.float32)
    attenuation_distance = field((), jnp.float32)
    attenuation_color = field(3, default=(1.0, 1.0, 1.0))
    diffuse_transmission = field((), jnp.float32)
    # ref: pbr_material.rs reflectance — F0 = 0.16 * r^2 for the
    # dielectric base (0.5 = the 4% default)
    reflectance = field((), jnp.float32, default=0.5)
    # ref: pbr_material.rs specular_tint — modulates the dielectric F0
    # color for non-metals (specular highlights + IBL/SSR reflections).
    # Trace-time specialized: worlds keeping the white default compile
    # the tint-free kernels and the 19-plane G-buffer (unlike the
    # reference, the tint DOES reach the deferred path here — the
    # G-buffer simply grows 3 planes when any material tints)
    specular_tint = field(3, default=(1.0, 1.0, 1.0))
    # ref: pbr_material.rs depth_bias — higher values draw in front of
    # lower ones at equal depth (applied as a clip-space z offset of
    # bias * 1e-3 * w at triangle pack time, so it survives the
    # perspective divide as a constant NDC offset)
    depth_bias = field((), jnp.float32)
    # ref: pbr_material.rs uv_transform (Affine2) — [a00,a01,a10,a11,tx,ty]
    # applied to mesh UVs before the atlas-rect wrap
    uv_transform = field(6, default=(1.0, 0.0, 0.0, 1.0, 0.0, 0.0))
    uv_min = field(2)
    uv_max = field(2)
    nm_min = field(2)       # normal-map atlas rect (equal = no map)
    nm_max = field(2)
    lm_min = field(2)       # lightmap atlas rect (ref: Lightmap uv_rect)
    lm_max = field(2)
    em_min = field(2)       # emissive_texture atlas rect
    em_max = field(2)
    mr_min = field(2)       # metallic_roughness_texture (G=rough, B=met)
    mr_max = field(2)
    oc_min = field(2)       # occlusion_texture (R channel)
    oc_max = field(2)


@component
class DirectionalLight:
    """ref: bevy_light DirectionalLight — direction is the entity's
    -Z axis (GlobalTransform rotation); intensity normalized (the
    reference's physical lux + exposure chain collapses to this factor)."""
    color = field(3, default=(1.0, 1.0, 1.0))
    illuminance = field((), jnp.float32, default=1.0)


@resource
class AmbientLight:
    """ref: bevy_light AmbientLight resource."""
    color = field(3, default=(1.0, 1.0, 1.0))
    brightness = field((), jnp.float32, default=0.08)


EXPANSION = "mesh_expansion"


def _rebuild_expansion(world, pool_host, plugin):
    """Host: flatten mesh instances → vertex/triangle tables (ref position:
    PrepareMeshes / RenderMeshInstances rebuild). Runs only when world
    structure changed. When every instance shares one mesh (the stress-test
    shape), records a *uniform* plan instead: the pass then skips per-vertex
    gathers entirely — vertex transform becomes one batched MXU matmul."""
    rows = world.query_rows(Mesh3d)
    mesh_ids = np.asarray(jax.device_get(world.column(Mesh3d, "mesh")))[rows] \
        if len(rows) else np.zeros(0, np.int32)
    # camera count is structural: one raster pass per camera traces in
    # (ref: Camera::viewport split-screen; single camera = zero overhead)
    cam_rows = world.query_rows(Camera3d)
    plugin._num_cameras = max(1, len(cam_rows))
    # scissor compiles out of the kernels when every camera is full-frame
    custom_vp = False
    if len(cam_rows):
        vmn = np.asarray(jax.device_get(world.column(Camera3d, "vp_min")))
        vmx = np.asarray(jax.device_get(world.column(Camera3d, "vp_max")))
        custom_vp = bool(np.any(vmn[cam_rows] != 0.0) or
                         np.any(vmx[cam_rows] != 1.0))
    plugin._use_viewports = plugin._num_cameras > 1 or custom_vp
    # group instances per mesh: each group renders as a uniform batch
    # (zero per-vertex gathers); mixed-mesh scenes become a few batches
    # (ref: the per-pipeline bins of queue_material_meshes)
    # opaque/transparent split by material alpha (host snapshot; the
    # phase split is structural — alpha edits re-split at next prepare,
    # ref position: the per-frame queue split into Opaque3d/Transparent3d)
    if len(rows):
        alpha = np.asarray(jax.device_get(
            world.column(MeshMaterial, "base_color")))[:, 3]
        trans = np.asarray(jax.device_get(
            world.column(MeshMaterial, "specular_transmission")))
        # diffuse-only translucency routes through the same phase (ref:
        # diffuse_transmission also draws in Transmissive3d)
        trans = np.maximum(trans, np.asarray(jax.device_get(
            world.column(MeshMaterial, "diffuse_transmission"))))
    else:
        alpha = np.zeros(0, np.float32)
        trans = np.zeros(0, np.float32)
    plugin._groups = []
    for mid in np.unique(mesh_ids):
        grows = rows[mesh_ids == mid].astype(np.int32)
        ga = alpha[grows]
        gx = trans[grows] > 0.0         # transmissive phase (ref:
        plugin._groups.append({         # Transmissive3d)
            "rows": grows, "mesh": int(mid),
            "rows_o": grows[(ga >= 0.999) & ~gx],
            "rows_t": grows[(ga < 0.999) & ~gx],
            "rows_x": grows[gx]})
    plugin._uniform = plugin._groups[0] if len(plugin._groups) == 1 else None
    if plugin._groups and getattr(plugin, "_resolved_backend", "pallas") == "pallas":
        # pallas renders per-group uniform batches; the expanded tables are
        # only needed by the XLA reference backend
        world.state["res"][EXPANSION] = {
            "vert_inst": jnp.zeros(3, jnp.int32),
            "vert_pool": jnp.zeros(3, jnp.int32),
            "tri_inst": jnp.full(1, world.capacity - 1, jnp.int32),
            "tri_verts": jnp.zeros((1, 3), jnp.int32),
        }
        world.structure_version += 1
        return
    v_off = np.asarray([m.num_vertices for m in pool_host.meshes]).cumsum() - \
        np.asarray([m.num_vertices for m in pool_host.meshes])
    vert_inst, vert_pool, tri_inst, tri_verts = [], [], [], []
    vbase = 0
    for row, mid in zip(rows, mesh_ids):
        m = pool_host.meshes[int(mid)]
        vc, tc = m.num_vertices, m.num_triangles
        vert_inst.append(np.full(vc, row, np.int32))
        vert_pool.append(np.arange(vc, dtype=np.int32) + int(v_off[int(mid)]))
        tri_inst.append(np.full(tc, row, np.int32))
        tri_verts.append(m.triangles.astype(np.int32) + vbase)
        vbase += vc
    if not rows.size:
        vert_inst = [np.zeros(3, np.int32)]
        vert_pool = [np.zeros(3, np.int32)]
        tri_inst = [np.full(1, world.capacity - 1, np.int32)]
        tri_verts = [np.zeros((1, 3), np.int32)]
    world.state["res"][EXPANSION] = {
        "vert_inst": jnp.asarray(np.concatenate(vert_inst)),
        "vert_pool": jnp.asarray(np.concatenate(vert_pool)),
        "tri_inst": jnp.asarray(np.concatenate(tri_inst)),
        "tri_verts": jnp.asarray(np.concatenate(tri_verts)),
    }
    world.structure_version += 1


def directional_light_vec(light, amb):
    """(16,) light params for the raster kernels: [dir xyz, light rgb,
    ambient rgb, 0…] from the first DirectionalLight entity + AmbientLight."""
    li, has_light = pick_camera(light.mask)
    ldir = quat_rotate_vec3(light.global_transform.rotation[li],
                            jnp.asarray([0.0, 0.0, -1.0]))
    lcol = light.directional_light.color[li] * \
        light.directional_light.illuminance[li] * has_light
    return jnp.concatenate([ldir, lcol, amb.color * amb.brightness,
                            jnp.zeros(7, jnp.float32)])


def _near_clip(cc, cn, valid, eps=1e-3):
    """Vectorized near-plane clipping at w = eps (ref: the hardware clipper
    wgpu relies on). cc (T,3,4) clip-space corners, cn (T,3,3) corner
    normals. Returns doubled arrays (2T, …): slot i = the (possibly
    clipped) triangle, slot T+i = the second triangle of a 1-behind quad
    split (degenerate/invalid otherwise). Cyclic rotations preserve winding.
    """
    w = cc[..., 3]
    behind = w < eps
    nb = jnp.sum(behind.astype(jnp.int32), axis=1)

    def rot(arr, k):
        return jnp.roll(arr, -k, axis=1)

    # rotate so the single behind vertex (nb==1) or the single front vertex
    # (nb==2, rotated to slot 2) lands canonically
    b0, b1 = behind[:, 0], behind[:, 1]
    f0, f1 = ~behind[:, 0], ~behind[:, 1]
    k1 = jnp.where(b0, 0, jnp.where(b1, 1, 2))          # behind-first
    k2 = jnp.where(f0, 1, jnp.where(f1, 2, 0))          # front-last
    k = jnp.where(nb == 1, k1, jnp.where(nb == 2, k2, 0))
    sel = jax.nn.one_hot(k, 3, dtype=cc.dtype)          # (T, 3)
    ccr = (sel[:, 0, None, None] * cc +
           sel[:, 1, None, None] * rot(cc, 1) +
           sel[:, 2, None, None] * rot(cc, 2))
    cnr = (sel[:, 0, None, None] * cn +
           sel[:, 1, None, None] * rot(cn, 1) +
           sel[:, 2, None, None] * rot(cn, 2))

    a, b, c = ccr[:, 0], ccr[:, 1], ccr[:, 2]
    na, nbn, ncn = cnr[:, 0], cnr[:, 1], cnr[:, 2]

    def lerp_to_plane(p, q, np_, nq):
        t = (eps - p[:, 3:4]) / jnp.where(
            jnp.abs(q[:, 3:4] - p[:, 3:4]) > 1e-12,
            q[:, 3:4] - p[:, 3:4], 1.0)
        t = jnp.clip(t, 0.0, 1.0)
        return p + (q - p) * t, np_ + (nq - np_) * t

    # nb==1 (A behind): A1 on AB, A2 on AC → (A1,B,C) + (A1,C,A2)
    a1, na1 = lerp_to_plane(a, b, na, nbn)
    a2, na2 = lerp_to_plane(a, c, na, ncn)
    # nb==2 (A,B behind, C front): A'=on AC, B'=on BC → (A',B',C)
    ap, nap = lerp_to_plane(a, c, na, ncn)
    bp, nbp = lerp_to_plane(b, c, nbn, ncn)

    is1 = (nb == 1)[:, None, None]
    is2 = (nb == 2)[:, None, None]
    slot1_cc = jnp.where(is1, jnp.stack([a1, b, c], 1),
                         jnp.where(is2, jnp.stack([ap, bp, c], 1), ccr))
    slot1_cn = jnp.where(is1, jnp.stack([na1, nbn, ncn], 1),
                         jnp.where(is2, jnp.stack([nap, nbp, ncn], 1), cnr))
    slot2_cc = jnp.stack([a1, c, a2], 1)
    slot2_cn = jnp.stack([na1, ncn, na2], 1)
    valid1 = valid & (nb < 3)
    valid2 = valid & (nb == 1)
    return (jnp.concatenate([slot1_cc, slot2_cc]),
            jnp.concatenate([slot1_cn, slot2_cn]),
            jnp.concatenate([valid1, valid2]))


def _col_nondefault(plugin, name, default):
    """Host-side (trace-time) check: does ANY MeshMaterial row deviate
    from `default` in column `name`? Keeps rarely-used features
    (depth_bias, uv_transform) compiled out of the common program —
    the pattern the anisotropy path established."""
    wref = getattr(plugin, "_world_ref", None)
    if wref is None:
        return True      # can't prove it's unused — keep the feature on
    try:
        col = np.asarray(jax.device_get(wref.column(MeshMaterial, name)))
        return bool(np.any(col != np.asarray(default, col.dtype)))
    except Exception:
        return True


def motion_delta(tp, rp, sp, tc, rc, sc):
    """Per-instance previous→current inverse affine D = M_prev ·
    M_cur^-1 as 12 floats [A row-major 9, b 3]: prev_world = A·world + b
    (ref: the previous-frame MeshUniforms of bevy_pbr's motion-vector
    prepass, bevy_pbr/src/prepass/mod.rs + mesh.rs previous_transform)."""
    from bevy_tpu.math.quat import quat_to_mat3
    mp = quat_to_mat3(rp)                            # (N, 3, 3)
    mc = quat_to_mat3(rc)
    ratio = sp / jnp.maximum(sc, 1e-12)
    a = jnp.einsum("nij,nj,nkj->nik", mp, ratio, mc)
    b = tp - jnp.einsum("nij,nj->ni", a, tc)
    return jnp.concatenate([a.reshape(-1, 9), b], -1)    # (N, 12)


def raster_batched(clip, nrm, triangles, inst_ok, col_i, emi_i, light_vec,
                   target, stats, *, width, height, tile_h=16, tile_w=128,
                   pairs_per_tri=2, max_per_tile=512, interpret=False,
                   deferred=False, met_i=None, rgh_i=None, viewport=None,
                   depth_only=False, cluster_size=12, win_h=32,
                   window_budget=65536, eval_tris=None, corner_uv=None,
                   uvr_i=None, atlas=None, visible_budget=65536,
                   flat_ok=False, vis_state=None, phase_budget=16384,
                   tan_i=None, nmr_i=None, lmr_i=None, cc_i=None,
                   ccr_i=None, aniso_i=None, anrot_i=None,
                   pds_i=None, dmr_i=None, ray=None, parallax_layers=0,
                   material_fn=None, bias_i=None, uvt_i=None,
                   emr_i=None, mrr_i=None, ocr_i=None, refl_i=None,
                   cl_extra=None, mesh_positions=None, tri_mask=None,
                   motd_i=None, prev_vp=None, cur_inv_vp=None,
                   tint_i=None):
    """Visibility-buffer raster of one uniform batch (ref: bevy meshlet sw
    raster, bevy_pbr/src/meshlet/ — cluster cull → visbuffer → material
    resolve). clip (Ni, VC, 4) clip-space positions, nrm (Ni, VC, 3) world
    normals, triangles (TC, 3) STATIC numpy indices, inst_ok (Ni,) bool.

    Pipeline: one-hot corner extraction (MXU matmul, no gathers) →
    clipless homogeneous plane setup (no near-clip pass) → two raster
    paths sharing the depth+id visbuffer (ref: meshlet sw/hw split):
    small clusters splat through fixed windows (ops/raster3d_splat —
    vector-parallel XLA eval + VMEM-resident composite), large clusters
    stream through the binned tile kernel (ops/raster3d_visbuf) → one
    shade-once XLA resolve (forward Lambert or G-buffer write; skipped
    when depth_only)."""
    import numpy as _np

    from bevy_tpu.ops.raster3d_splat import (
        build_windows, coarse_min_depth, compact_cluster_tris,
        composite_windows, eval_windows, occlusion_test)
    from bevy_tpu.ops.raster3d_visbuf import ZREC as ZREC_
    from bevy_tpu.ops.raster3d_visbuf import (
        bin_clusters, build_cluster_meta, cluster_records,
        cluster_screen_aabbs, pack_flat_gbuf, pack_flat_shade,
        pack_planes_h, raster_visbuf, resolve_flat, resolve_forward,
        resolve_gbuf, resolve_gbuf_flat, tile_chunk_records)

    ni, vc = clip.shape[0], clip.shape[1]
    cs = cluster_size
    tc0 = int(triangles.shape[0])
    tcp = (tc0 + cs - 1) // cs * cs
    tris = _np.zeros((tcp, 3), _np.int32)
    tris[:tc0] = _np.asarray(triangles, _np.int32)   # pad = degenerate
    cc_num = tcp // cs                               # clusters per instance
    t = ni * tcp

    quant = jnp.concatenate([jnp.moveaxis(clip, -1, 1),
                             jnp.moveaxis(nrm, -1, 1)], axis=1)  # (Ni,7,VC)
    onehot = _np.zeros((vc, tcp * 3), _np.float32)
    for ti in range(tcp):
        for k in range(3):
            onehot[int(tris[ti, k]), ti * 3 + k] = 1.0
    corners = jnp.einsum("nqv,vc->nqc", quant, jnp.asarray(onehot))
    corners = corners.reshape(ni, 7, tcp, 3)
    cc = jnp.moveaxis(corners[:, 0:4], 1, -1).reshape(t, 3, 4)
    cn = jnp.moveaxis(corners[:, 4:7], 1, -1).reshape(t, 3, 3)

    # padding tris (tc0..tcp) masked STATICALLY: they are degenerate
    # points whose det is only zero up to fp contraction — under jit,
    # FMA noise can make them pass the backface test with garbage
    # planes that cover whole splat windows (the "band" bug).
    # tri_mask additionally kills INTERIOR degenerate padding (the
    # cluster-DAG mesh pads every cluster to cs tris — see
    # meshlet.build_cluster_dag)
    pad_ok = _np.arange(tcp) < tc0
    if tri_mask is not None:
        pad_ok = pad_ok & _np.asarray(tri_mask, bool)
    tri_ok = (inst_ok[:, None] & jnp.asarray(pad_ok)[None, :]).reshape(t)

    def _col(x, default):
        if x is None:
            return jnp.full((ni, 1), default, jnp.float32)
        return x.reshape(ni, 1)

    # -- cull FIRST, pack planes second: cluster screen AABBs + the
    #    conservative frustum cull need only the clip corners; the
    #    expensive per-triangle plane setup then runs on a compacted
    #    visible prefix instead of all Ni*TC triangles (ref position:
    #    the cull-before-setup order of gpu_preprocess.wesl)
    cl_ok = jnp.broadcast_to(inst_ok[:, None], (ni, cc_num)).reshape(ni * cc_num)
    if cl_extra is not None:
        # upstream hierarchical verdicts (the BVH cull — ops/bvh.py)
        cl_ok = cl_ok & cl_extra.reshape(ni * cc_num)
    aabb, cl_valid, zmax = cluster_screen_aabbs(
        cc, cl_ok, jnp.ones((ni * tcp,), bool), cs, width, height,
        viewport=viewport)
    n_cl = ni * cc_num
    aabb_all, zmax_all = aabb, zmax
    # flat-shading fast paths: identical corner normals per tri + no
    # textures — forward shades once per triangle; deferred writes the
    # G-buffer from two 8-wide record tables (both skip the 64-wide
    # varying-plane gather)
    flat = bool(flat_ok) and not deferred and not depth_only and \
        corner_uv is None and material_fn is None
    flat_def = bool(flat_ok) and deferred and not depth_only and \
        corner_uv is None
    if not depth_only:
        mat_inst = jnp.concatenate(
            [col_i, emi_i, _col(met_i, 0.0), _col(rgh_i, 0.5),
             _col(cc_i, 0.0), _col(ccr_i, 0.5),
             _col(aniso_i, 0.0), _col(anrot_i, 0.0),
             _col(pds_i, 0.0), _col(refl_i, 0.5)], axis=1)
        if tint_i is not None:
            # specular tint columns 15:18 (trace-time specialized:
            # absent for white-tint worlds — see MeshMaterial)
            mat_inst = jnp.concatenate([mat_inst, tint_i], axis=1)
    if corner_uv is not None and uvr_i is not None and not depth_only:
        cuv_static = jnp.asarray(_np.concatenate(
            [_np.asarray(corner_uv, _np.float32),
             _np.zeros((tcp - tc0, 3, 2), _np.float32)], 0))
    else:
        cuv_static = None
    cc_cl = cc.reshape(n_cl, cs, 3, 4)
    cn_cl = cn.reshape(n_cl, cs, 3, 3)

    # static coplanar quad pairing (single-cluster meshes): the fused
    # window kernel then evaluates ~half the record slots with 4-edge
    # quads — see ops/raster3d_splat.coplanar_quad_pairs. RIGID geometry
    # only (callers skip it for skinned/morphed meshes).
    import os as _osq
    quad_entries = None
    if mesh_positions is not None and tcp == cs and \
            _osq.environ.get("BEVY_TPU_QUADS", "1") == "1":
        from bevy_tpu.ops.raster3d_splat import coplanar_quad_pairs
        _entries = coplanar_quad_pairs(mesh_positions, triangles)
        _npaired = sum(1 for e in _entries if e[0] == "pair")
        if 2 * _npaired >= tc0:          # mostly-quad meshes only
            quad_entries = _entries

    def run_phase(sel, k, cluster_base, depth, winner, order="index"):
        """Select ≤k clusters from `sel`, pack their planes with ids
        offset by cluster_base, and splat them (window classes +
        streaming-kernel fallback). order="near" sorts nearest-first so
        overflow degrades gracefully (two-phase); "index" compacts with
        a sort-free cumsum scatter. When k covers every cluster the
        selection is the identity and ALL the per-cluster gathers
        compile out (the path instance-compacted scenes take — the
        round-1 profile showed ~18 ms of layout-bound cc/cn gathers
        here). Returns (depth, winner, srec_or_None, flat_rec_or_None)."""
        nsel = jnp.sum(sel.astype(jnp.int32))
        identity = k >= n_cl and order == "index"
        if identity:
            k = n_cl
            ids = jnp.arange(n_cl, dtype=jnp.int32)
            v = sel
        elif order == "near":
            key = jnp.where(sel, 1.0 - zmax_all, 3.4e38)  # nearest first
            ids = jnp.argsort(key)[:k]
            v = sel[ids]
        else:
            pos = jnp.cumsum(sel.astype(jnp.int32)) - 1
            tgt = jnp.where(sel & (pos < k), pos, k)
            ids = jnp.zeros(k + 1, jnp.int32).at[tgt].set(
                jnp.arange(n_cl, dtype=jnp.int32), mode="drop")[:k]
            v = jnp.arange(k, dtype=jnp.int32) < nsel
        if not identity:
            stats.pair_overflow = stats.pair_overflow + jnp.maximum(
                nsel - k, 0)
        # (k, cs, ...) cluster-major shapes all the way into
        # pack_planes_h (batch-agnostic since r5): the flat (k*cs, ...)
        # relayout copies this used to force were ~3.2 ms of the r4
        # many_cubes profile (copy.1556/1610 + reshape.35/36/41).
        # ONLY on the flat-record paths: the srec (textured/skinned)
        # path measured WORSE clustered (many_foxes 14.1 → 16.0 — the
        # 64-wide srec concat + gather-table layout prefers the flat
        # build), so it keeps the old (tv, ...) shapes.
        tv = k * cs
        clustered = flat or flat_def or depth_only
        if identity:
            cc_v = cc_cl if clustered else cc_cl.reshape(tv, 3, 4)
            cn_v = cn_cl if clustered else cn_cl.reshape(tv, 3, 3)
        else:
            cc_v = cc_cl[ids]
            cn_v = cn_cl[ids]
            if not clustered:
                cc_v = cc_v.reshape(tv, 3, 4)
                cn_v = cn_v.reshape(tv, 3, 3)
        tri_ok_v = jnp.broadcast_to(v[:, None], (k, cs))
        if not clustered:
            tri_ok_v = tri_ok_v.reshape(tv)

        def per_inst(src):
            """(Ni, w) per-instance rows → (k, cs, w) (clustered) or
            (tv, w) per-triangle rows (a lazy broadcast — XLA
            materializes it only inside whatever fusion consumes it)."""
            w_ = src.shape[1]
            if identity:
                rep = jnp.broadcast_to(src[:, None, None, :],
                                       (ni, cc_num, cs, w_))
                return rep.reshape(k, cs, w_) if clustered \
                    else rep.reshape(tv, w_)
            inst_v = ids // cc_num
            rep = jnp.broadcast_to(src[inst_v][:, None, :], (k, cs, w_))
            return rep if clustered else rep.reshape(tv, w_)

        if depth_only:
            mat_tri = None
        else:
            # flat-forward shading never reads the clearcoat columns —
            # keep the broadcast/gather at 9 wide on that hot path
            mat_tri = per_inst(mat_inst[:, :9] if flat else mat_inst)
        if bias_i is not None:
            # ref: StandardMaterial::depth_bias — constant reverse-z NDC
            # offset; biasing clip z by b*w keeps it constant after the
            # divide, and the clipless setup needs no other change
            b = per_inst(bias_i.reshape(ni, 1))[..., 0] * 1e-3
            cc_v = cc_v.at[..., 2].add(b[..., None] * cc_v[..., 3])
        if cuv_static is not None:
            cuv_cl = cuv_static.reshape(cc_num, cs, 3, 2)
            cuv_shape = (k, cs, 3, 2) if clustered else (tv, 3, 2)
            if identity:
                cuv = jnp.broadcast_to(cuv_cl[None], (ni, cc_num, cs, 3, 2)
                                       ).reshape(cuv_shape)
            else:
                cuv = cuv_cl[ids % cc_num].reshape(cuv_shape)
            rect_tri = per_inst(uvr_i)
            if uvt_i is not None:
                # ref: StandardMaterial::uv_transform (Affine2) on mesh
                # UVs, before the per-instance atlas-rect wrap
                a = per_inst(uvt_i)                      # (k, cs, 6)
                u, vv = cuv[..., 0], cuv[..., 1]
                cuv = jnp.stack(
                    [a[..., 0:1] * u + a[..., 1:2] * vv + a[..., 4:5],
                     a[..., 2:3] * u + a[..., 3:4] * vv + a[..., 5:6]], -1)
        else:
            cuv = rect_tri = None
        if tan_i is not None:
            tan_tri = tan_i.reshape(n_cl, cs, 3)[ids] \
                if not identity else tan_i.reshape(n_cl, cs, 3)
            if not clustered:
                tan_tri = tan_tri.reshape(tv, 3)
            # no normal map: a zero rect (u1 <= u0) disables sampling at
            # resolve while the tangent still reaches the srec (needed
            # for anisotropy without textures)
            nm_tri = per_inst(nmr_i) \
                if nmr_i is not None and cuv is not None \
                else jnp.zeros((k, cs, 4) if clustered else (tv, 4),
                               jnp.float32)
        else:
            tan_tri = nm_tri = None
        lm_tri = per_inst(lmr_i) \
            if lmr_i is not None and cuv is not None else None
        dm_tri = per_inst(dmr_i) \
            if dmr_i is not None and cuv is not None else None
        em_tri = per_inst(emr_i) \
            if emr_i is not None and cuv is not None else None
        mr_tri = per_inst(mrr_i) \
            if mrr_i is not None and cuv is not None else None
        oc_tri = per_inst(ocr_i) \
            if ocr_i is not None and cuv is not None else None
        id_base = cluster_base * cs
        zrec, srec, valid = pack_planes_h(
            cc_v, cn_v, tri_ok_v, width, height, viewport=viewport,
            materials=mat_tri, cuv=cuv, tex_rect=rect_tri,
            build_srec=not flat and not flat_def and not depth_only,
            id_base=id_base, tangents=tan_tri, nm_rect=nm_tri,
            lm_rect=lm_tri, dm_rect=dm_tri, em_rect=em_tri,
            mr_rect=mr_tri, oc_rect=oc_tri)
        # the resolve gathers row tables by global tri id — flatten the
        # (k, cs, w) records here (a leading-dims merge, layout-free;
        # the PLANE math above ran unflattened)
        if srec is not None:
            srec = srec.reshape(tv, srec.shape[-1])
        frec = pack_flat_shade(cn_v, mat_tri, light_vec, valid
                               ).reshape(tv, 8) if flat else None
        fab = pack_flat_gbuf(cn_v, mat_tri, valid
                             ).reshape(tv, 16) if flat_def else None
        # per-triangle previous-frame affine deltas for motion vectors
        # (gathered by winner id at resolve, like frec)
        mot = per_inst(motd_i).reshape(tv, 12) if motd_i is not None \
            else None
        import os as _os_
        fused = _os_.environ.get("BEVY_TPU_FUSED", "1") == "1"
        if fused:
            # the fused path builds its own gather-free valid-first
            # record rows below (build_rec_rows); compaction of the
            # ZREC-stride table would be dead work
            zrec_c = zrec
        elif _os_.environ.get("BEVY_TPU_COMPACT", "1") == "0":
            # A/B: skip compaction (kernel then evaluates all cs tris;
            # zeroed invalid planes fail the depth test)
            zrec_c = zrec.reshape(tv, ZREC_)
        else:
            zrec_c, _ = compact_cluster_tris(zrec.reshape(tv, ZREC_), cs)
        aabb_p = aabb_all if identity else aabb_all[ids]
        zmax_p = zmax_all if identity else zmax_all[ids]
        # window classes: half-height windows for small footprints.
        # A third win_h//4 class is env-gated (BEVY_TPU_WIN_CLASSES=3)
        # and remains NET-NEGATIVE on many_cubes even with the fused
        # eval+composite kernel (68.5 → 72.5 ms retest; BASELINE.md
        # negative-results log) — the extra launch + class split costs
        # exceed the smaller-window VPU savings on that scene.
        import os as _os
        stream_all = _os.environ.get("BEVY_TPU_STREAM_ALL") == "1"
        h_px = aabb_p[:, 3] - aabb_p[:, 1]
        half_h = max(win_h // 2, 8)
        quarter_h = max(win_h // 4, 8)
        n_classes = int(_os.environ.get("BEVY_TPU_WIN_CLASSES", "2"))
        if stream_all:
            # dev A/B: skip the window path — every cluster goes through
            # the binned streaming tile kernel below
            classes = ()
        elif n_classes >= 3 and quarter_h < half_h:
            classes = ((quarter_h, h_px <= quarter_h - 1.0),
                       (half_h, (h_px > quarter_h - 1.0) &
                        (h_px <= half_h - 1.0)),
                       (win_h, h_px > half_h - 1.0))
        else:
            classes = ((half_h, h_px <= half_h - 1.0),
                       (win_h, h_px > half_h - 1.0))
        wbudget = min(window_budget // 2, 4 * k + 64)
        wbudget = (wbudget + 7) // 8 * 8
        fallback = None
        # fused path (default): evaluate + merge inside one pallas pass —
        # record slot 12 carries global tri ids, so no packed z|id and
        # no (B, win_h, 128) HBM round trip (~20 ms at many_cubes scale)
        if fused and classes:
            # hoist the row<->column relayout OUT of the class loop
            # (it was ~3 ms of 29 MB transposes per many_cubes frame)
            from bevy_tpu.ops.raster3d_splat import (
                build_quad_rec_rows, build_rec_rows, from_col_major,
                fused_eval_composite, to_col_major)
            dcol = to_col_major(depth)
            wcol = to_col_major(winner, pad_value=-1.0)
            # gather-free valid-first record rows, built ONCE for all
            # window classes (replaces compact_cluster_tris + the
            # in-call relayout: ~9.4 ms of the round-2 profile)
            ntri_f = cs if eval_tris is None else min(eval_tris, cs)
            if quad_entries is not None:
                # coplanar-quad records: ~half the slots at 13 ops each
                nq = min(len(quad_entries), max(2, (ntri_f + 1) // 2))
                rec_rows = build_quad_rec_rows(zrec, cs, quad_entries, nq)
                nedge_f, rslots = 4, nq
            else:
                rec_rows = build_rec_rows(zrec, cs, ntri_f)
                nedge_f, rslots = 3, None
            for class_h, cmask in classes:
                wins = build_windows(aabb_p, v & cmask, win_h=class_h,
                                     width=width, height=height,
                                     budget=wbudget)
                dcol, wcol = fused_eval_composite(
                    dcol, wcol, zrec_c, wins["owner"], wins["meta"],
                    wins["wvalid"], win_h=class_h, cs=cs,
                    eval_tris=eval_tris, viewport=viewport,
                    interpret=interpret, col_major=True, width=width,
                    rec_rows=rec_rows, nedge=nedge_f, rec_slots=rslots)
                stats.pair_overflow = stats.pair_overflow + wins["overflow"]
                fallback = wins["fallback"] if fallback is None else \
                    (fallback | wins["fallback"])
            depth = from_col_major(dcol, width)
            winner = from_col_major(wcol, width)
            classes = ()
        for class_h, cmask in classes:    # non-fused (BEVY_TPU_FUSED=0)
            wins = build_windows(aabb_p, v & cmask, win_h=class_h,
                                 width=width, height=height,
                                 budget=wbudget)
            windows = eval_windows(zrec_c, cs, wins["owner"],
                                   wins["meta"], wins["wvalid"],
                                   win_h=class_h, viewport=viewport,
                                   eval_tris=eval_tris,
                                   id_base=id_base)
            depth, winner = composite_windows(
                depth, winner, windows, wins["owner"] + cluster_base,
                wins["meta"], wins["wvalid"], win_h=class_h, cs=cs,
                interpret=interpret)
            stats.pair_overflow = stats.pair_overflow + wins["overflow"]
            fallback = wins["fallback"] if fallback is None else \
                (fallback | wins["fallback"])
        if fallback is None:          # stream_all: everything falls back
            fallback = v
        # fallback: giant footprints + near-plane straddlers through the
        # binned streaming tile kernel (rare; ids in zrec are global).
        # Compact the fallback set to a small static budget FIRST — the
        # record-table layout change + pair expansion otherwise run over
        # ALL k*cs triangles every frame (~9 ms of the round-2 many_cubes
        # profile for a usually-EMPTY set)
        kfb = k if stream_all else min(2048, k)
        nfb = jnp.sum(fallback.astype(jnp.int32))
        posf = jnp.cumsum(fallback.astype(jnp.int32)) - 1
        tgtf = jnp.where(fallback & (posf < kfb), posf, kfb)
        idsf = jnp.zeros(kfb + 1, jnp.int32).at[tgtf].set(
            jnp.arange(k, dtype=jnp.int32), mode="drop")[:kfb]
        vfb = jnp.arange(kfb, dtype=jnp.int32) < nfb
        stats.pair_overflow = stats.pair_overflow + \
            jnp.maximum(nfb - kfb, 0)
        aabb_f = aabb_p[idsf]
        zmax_f = zmax_p[idsf]
        zrec_f = zrec.reshape(k, cs, ZREC_)[idsf].reshape(kfb * cs, ZREC_)
        hp_t = (height + tile_h - 1) // tile_h
        wp_t = (width + tile_w - 1) // tile_w
        budget = 4 * kfb + hp_t * wp_t + 1024
        max_cl = max(256, max_per_tile // cs)
        qz = jnp.clip((1.0 - zmax_f) * 65535.0, 0, 65535).astype(jnp.int32)
        cl_table, cl_counts, st = bin_clusters(
            aabb_f, vfb, ntx=wp_t, nty=hp_t, tile_w=tile_w,
            tile_h=tile_h, max_clusters_per_tile=max_cl,
            pair_budget=budget, order_key=qz)
        meta = build_cluster_meta(cl_table, zmax_f)
        recs = tile_chunk_records(cluster_records(zrec_f, cs), cl_table)
        depth, winner = raster_visbuf(
            depth, winner, recs, meta, cl_counts, scissor=viewport,
            tile_h=tile_h, tile_w=tile_w, cs=cs, interpret=interpret)
        stats.pair_overflow = stats.pair_overflow + st["pair_overflow"]
        stats.tile_overflow = stats.tile_overflow + st["tile_overflow"]
        return depth, winner, srec, frec, fab, mot

    winner = jnp.full_like(target.depth, -1.0)
    depth = target.depth
    two_phase = vis_state is not None and not depth_only
    if two_phase:
        # -- two-phase occlusion culling (ref: bevy meshlet's two-pass
        #    cull + the occlusion_culling types of bevy_render): phase 1
        #    renders last frame's visible set nearest-first; its hi-z
        #    then culls the remainder; phase 2 renders the survivors;
        #    the final hi-z becomes next frame's visibility mask
        k1 = min(phase_budget, n_cl)
        k2 = min(phase_budget, n_cl)
        prev = vis_state["mask"]
        depth, winner, srec1, frec1, fab1, mot1 = run_phase(
            cl_valid & prev, k1, 0, depth, winner, order="near")
        coarse = coarse_min_depth(depth)
        occ = occlusion_test(aabb_all, zmax_all, coarse)
        depth, winner, srec2, frec2, fab2, mot2 = run_phase(
            cl_valid & ~prev & ~occ, k2, k1, depth, winner, order="near")
        srec = None if srec1 is None else jnp.concatenate([srec1, srec2])
        flat_rec = None if frec1 is None else \
            jnp.concatenate([frec1, frec2])
        fab = None if fab1 is None else jnp.concatenate([fab1, fab2])
        mot_rec = None if mot1 is None else jnp.concatenate([mot1, mot2])
        coarse2 = coarse_min_depth(depth)
        vis_state["mask"] = cl_valid & \
            ~occlusion_test(aabb_all, zmax_all, coarse2)
    else:
        kvis = min(visible_budget, n_cl)
        depth, winner, srec, flat_rec, fab, mot_rec = run_phase(
            cl_valid, kvis, 0, depth, winner)
    target.depth = depth
    if depth_only:
        return
    win_i = winner.astype(jnp.int32)
    if flat_def:
        target.gbuffer = resolve_gbuf_flat(win_i, fab, target.gbuffer)
    elif deferred:
        target.gbuffer = resolve_gbuf(win_i, srec, target.gbuffer,
                                      atlas=atlas, ray=ray,
                                      parallax_layers=parallax_layers)
    elif flat:
        target.color = resolve_flat(win_i, flat_rec, target.color)
    elif material_fn is not None:
        # custom material (ref: the Material trait + custom shader
        # examples — user shading code in the resolve position): fn
        # receives (normal (H,W,3), mat (H,W,11), ok (H,W), light_vec)
        # and returns (H,W,4) rgba
        from bevy_tpu.ops.raster3d_visbuf import resolve_shade
        n_pl, mat_pl, ok_pl = resolve_shade(
            win_i, srec, atlas, ray=ray, parallax_layers=parallax_layers)
        rgba = material_fn(n_pl, mat_pl, ok_pl, light_vec)
        target.color = jnp.where(ok_pl[None],
                                 jnp.moveaxis(rgba, -1, 0), target.color)
    else:
        target.color = resolve_forward(win_i, srec, light_vec, target.color,
                                       atlas=atlas, ray=ray,
                                       parallax_layers=parallax_layers)

    if mot_rec is not None and prev_vp is not None and \
            cur_inv_vp is not None:
        # per-object motion vectors (ref: the motion-vector prepass,
        # bevy_core_pipeline/src/prepass/mod.rs:10 + bevy_pbr's
        # previous-frame transforms): winner id → instance affine delta
        # D = M_prev·M_cur^-1 → previous clip position → pixel offset.
        # Written only at pixels this batch won; TAA/motion blur fall
        # back to camera reprojection where plane 2 (validity) is 0.
        ok = win_i >= 0
        dmat = mot_rec[jnp.maximum(win_i, 0)]          # (H, W, 12)
        hh, ww = depth.shape
        ysf = (jnp.arange(hh, dtype=jnp.float32) + 0.5)[:, None]
        xsf = (jnp.arange(ww, dtype=jnp.float32) + 0.5)[None, :]
        ndx = jnp.broadcast_to(2.0 * xsf / ww - 1.0, depth.shape)
        ndy = jnp.broadcast_to(1.0 - 2.0 * ysf / hh, depth.shape)
        ndc = jnp.stack([ndx, ndy, depth, jnp.ones_like(depth)], -1)
        wh_ = jnp.einsum("ij,hwj->hwi", cur_inv_vp, ndc)
        wpx = wh_[..., :3] / jnp.where(jnp.abs(wh_[..., 3:4]) > 1e-9,
                                       wh_[..., 3:4], 1.0)
        a_ = dmat[..., 0:9].reshape(hh, ww, 3, 3)
        pw = jnp.einsum("hwij,hwj->hwi", a_, wpx) + dmat[..., 9:12]
        pc = jnp.einsum("ij,hwj->hwi", prev_vp, jnp.concatenate(
            [pw, jnp.ones((hh, ww, 1), jnp.float32)], -1))
        pcw = jnp.where(jnp.abs(pc[..., 3]) > 1e-8, pc[..., 3], 1.0)
        px_prev = (pc[..., 0] / pcw * 0.5 + 0.5) * ww - 0.5
        py_prev = (0.5 - pc[..., 1] / pcw * 0.5) * hh - 0.5
        dyx = jnp.stack([py_prev - (ysf - 0.5),
                         px_prev - (xsf - 0.5)], 0)
        dyx = jnp.broadcast_to(dyx, (2, hh, ww))
        planes = jnp.concatenate(
            [dyx, jnp.ones((1, hh, ww), jnp.float32)], 0)
        target.motion = jnp.where(ok[None], planes, target.motion)


def extended_material(extension_fn):
    """ExtendedMaterial twin (ref: bevy_pbr/src/extended_material.rs —
    `ExtendedMaterial<StandardMaterial, E>` runs the standard PBR
    fragment logic, then the extension shader modifies the result).

    Returns a `material_fn` for `Mesh3dPlugin(material_fn=...)`: the
    StandardMaterial forward shade (same directional+ambient+emissive
    math as `resolve_forward`) runs first, and `extension_fn(base_rgba,
    n, mat, ok, light_vec)` post-processes it. Passing
    `lambda base, *a: base` reproduces the standard material exactly."""

    def fn(n, mat, ok, light_vec):
        lam = jnp.maximum(0.0, -(n[..., 0] * light_vec[0] +
                                 n[..., 1] * light_vec[1] +
                                 n[..., 2] * light_vec[2]))
        rgb = mat[..., 0:3] * (light_vec[6:9] +
                               light_vec[3:6] * lam[..., None]) + \
            mat[..., 4:7]
        base = jnp.concatenate([rgb, mat[..., 3:4]], -1)
        return extension_fn(base, n, mat, ok, light_vec)

    return fn


def raster_transparent(clip, nrm, triangles, inst_ok, col_i, emi_i,
                       light_vec, depth, oit, *, width, height, win_h=32,
                       window_budget=8192, visible_budget=8192,
                       cluster_size=12, viewport=None):
    """Weighted-blended OIT pass for transparent instances (ref: the
    Transparent3d phase + bevy_core_pipeline/src/oit — order-independent
    so no per-pixel sort). Flat per-tri Lambert shading; fragments test
    against (but never write) the opaque depth. Returns (oit, overflow)."""
    import numpy as _np

    from bevy_tpu.ops.raster3d_splat import (
        accumulate_oit, build_windows, eval_oit_windows)
    from bevy_tpu.ops.raster3d_visbuf import (
        cluster_screen_aabbs, pack_flat_shade, pack_planes_h)

    ni, vc = clip.shape[0], clip.shape[1]
    cs = cluster_size
    tc0 = int(triangles.shape[0])
    tcp = (tc0 + cs - 1) // cs * cs
    tris = _np.zeros((tcp, 3), _np.int32)
    tris[:tc0] = _np.asarray(triangles, _np.int32)
    cc_num = tcp // cs
    t = ni * tcp
    quant = jnp.concatenate([jnp.moveaxis(clip, -1, 1),
                             jnp.moveaxis(nrm, -1, 1)], axis=1)
    onehot = _np.zeros((vc, tcp * 3), _np.float32)
    for ti in range(tcp):
        for k in range(3):
            onehot[int(tris[ti, k]), ti * 3 + k] = 1.0
    corners = jnp.einsum("nqv,vc->nqc", quant, jnp.asarray(onehot))
    corners = corners.reshape(ni, 7, tcp, 3)
    cc = jnp.moveaxis(corners[:, 0:4], 1, -1).reshape(t, 3, 4)
    cn = jnp.moveaxis(corners[:, 4:7], 1, -1).reshape(t, 3, 3)
    cl_ok = jnp.broadcast_to(inst_ok[:, None], (ni, cc_num)).reshape(ni * cc_num)
    if cl_extra is not None:
        # upstream hierarchical verdicts (the BVH cull — ops/bvh.py)
        cl_ok = cl_ok & cl_extra.reshape(ni * cc_num)
    aabb, cl_valid, zmax = cluster_screen_aabbs(
        cc, cl_ok, jnp.ones((t,), bool), cs, width, height,
        viewport=viewport)
    n_cl = ni * cc_num
    k = min(visible_budget, n_cl)
    pos = jnp.cumsum(cl_valid.astype(jnp.int32)) - 1
    tgt = jnp.where(cl_valid & (pos < k), pos, k)
    ids = jnp.zeros(k + 1, jnp.int32).at[tgt].set(
        jnp.arange(n_cl, dtype=jnp.int32), mode="drop")[:k]
    v = jnp.arange(k, dtype=jnp.int32) < jnp.sum(cl_valid.astype(jnp.int32))
    overflow = jnp.maximum(jnp.sum(cl_valid.astype(jnp.int32)) - k, 0)
    inst_v = ids // cc_num
    tv = k * cs
    cc_v = cc.reshape(n_cl, cs, 3, 4)[ids].reshape(tv, 3, 4)
    cn_v = cn.reshape(n_cl, cs, 3, 3)[ids].reshape(tv, 3, 3)
    tri_ok_v = jnp.broadcast_to(v[:, None], (k, cs)).reshape(tv)
    mat_inst = jnp.concatenate(
        [col_i, emi_i, jnp.zeros((ni, 2), jnp.float32)], axis=1)
    mat_tri = jnp.broadcast_to(mat_inst[inst_v][:, None, :],
                               (k, cs, 9)).reshape(tv, 9)
    zrec, _, valid = pack_planes_h(cc_v, cn_v, tri_ok_v, width, height,
                                   viewport=viewport, build_srec=False)
    frec = pack_flat_shade(cn_v, mat_tri, light_vec, valid)
    wb = (min(window_budget, 4 * k + 64) + 7) // 8 * 8
    wins = build_windows(aabb[ids], v, win_h=win_h, width=width,
                         height=height, budget=wb)
    windows = eval_oit_windows(zrec, frec, cs, wins["owner"],
                               wins["meta"], wins["wvalid"], depth,
                               win_h=win_h)
    oit = accumulate_oit(oit, windows, wins["meta"], wins["wvalid"])
    return oit, overflow + wins["overflow"]


def raster_batched_legacy(clip, nrm, triangles, inst_ok, col_i, emi_i,
                          light_vec, target, stats, *, width, height,
                          tile_h, tile_w, pairs_per_tri, max_per_tile,
                          interpret, deferred=False, met_i=None, rgh_i=None,
                          viewport=None):
    """Shared gather-free raster tail for batched-uniform geometry (plain
    meshes AND skinned meshes): clip (Ni, VC, 4) clip-space positions,
    nrm (Ni, VC, 3) world normals, triangles (TC, 3) STATIC numpy indices,
    inst_ok (Ni,) bool, per-instance colors/emissive. Corner extraction is a
    constant one-hot matmul; near-plane clipping is exact (quad splits use a
    second table half); setup is plane math; kernel is pure FMA."""
    from bevy_tpu.ops.raster3d_pallas import (
        pack_tri_planes, raster_tris_pallas)
    ni, vc = clip.shape[0], clip.shape[1]
    tc = triangles.shape[0]
    quant = jnp.concatenate([jnp.moveaxis(clip, -1, 1),
                             jnp.moveaxis(nrm, -1, 1)], axis=1)  # (Ni,7,VC)
    onehot = np.zeros((vc, tc * 3), np.float32)
    for ti in range(tc):
        for k in range(3):
            onehot[int(triangles[ti, k]), ti * 3 + k] = 1.0
    corners = jnp.einsum("nqv,vc->nqc", quant, jnp.asarray(onehot))
    corners = corners.reshape(ni, 7, tc, 3)
    t_half = ni * tc
    cc = jnp.moveaxis(corners[:, 0:4], 1, -1).reshape(t_half, 3, 4)
    cn = jnp.moveaxis(corners[:, 4:7], 1, -1).reshape(t_half, 3, 3)
    valid0 = jnp.broadcast_to(inst_ok[:, None], (ni, tc)).reshape(t_half)
    cc, cn, valid = _near_clip(cc, cn, valid0)
    t_all = 2 * t_half

    w = cc[..., 3]
    inv_w = 1.0 / jnp.maximum(w, 1e-6)
    # NDC maps onto the camera's viewport pixel rect; the kernels scissor
    # edge-straddling triangles per pixel (ref: Camera::viewport)
    scissor = viewport
    if viewport is None:
        viewport = (0.0, 0.0, float(width), float(height))
    vx0, vy0, vx1, vy1 = viewport
    sx = vx0 + (cc[..., 0] * inv_w * 0.5 + 0.5) * (vx1 - vx0)
    sy = vy0 + (0.5 - cc[..., 1] * inv_w * 0.5) * (vy1 - vy0)
    cxy = jnp.stack([sx, sy], axis=-1)                 # (2T, 3, 2)
    depth_c = cc[..., 2] * inv_w
    invw_c = inv_w
    normals_c = cn
    ax, ay = cxy[:, 0, 0], cxy[:, 0, 1]
    bx, by = cxy[:, 1, 0], cxy[:, 1, 1]
    cx2, cy2 = cxy[:, 2, 0], cxy[:, 2, 1]
    area2 = (bx - ax) * (cy2 - ay) - (by - ay) * (cx2 - ax)
    valid = valid & (area2 < -1e-12)
    aabb = jnp.stack([
        jnp.min(cxy[:, :, 0], 1), jnp.min(cxy[:, :, 1], 1),
        jnp.max(cxy[:, :, 0], 1), jnp.max(cxy[:, :, 1], 1)], axis=1)
    colors = jnp.tile(
        jnp.broadcast_to(col_i[:, None, :], (ni, tc, 4)).reshape(t_half, 4),
        (2, 1))
    emissive = jnp.tile(
        jnp.broadcast_to(emi_i[:, None, :], (ni, tc, 3)).reshape(t_half, 3),
        (2, 1))

    def _tile_scalar(x, default):
        if x is None:
            return jnp.full(t_all, default, jnp.float32)
        return jnp.tile(jnp.broadcast_to(x[:, None], (ni, tc)
                                         ).reshape(t_half), (2,))

    metallic = _tile_scalar(met_i, 0.0)
    roughness = _tile_scalar(rgh_i, 0.5)
    table = pack_tri_planes(cxy, depth_c, invw_c, area2, valid,
                            normals_c, colors, emissive, metallic, roughness)
    fb_in = target.gbuffer if deferred else target.color
    # pair capacity ∝ every cost in binning (scan/gather/sort all run over
    # capacity, not actual work). Budget on the REALISTIC pair rate —
    # ~half the tris are backface-culled and most hit one tile — instead of
    # the worst case; overflow is counted in render_stats, never silent.
    # (`pairs_per_tri` remains the per-tri worst-case knob for the budget.)
    hp_t = (height + tile_h - 1) // tile_h
    wp_t = (width + tile_w - 1) // tile_w
    budget = int(t_half * min(pairs_per_tri, 2) * 0.4) + hp_t * wp_t + 8192
    fb, dep, st = raster_tris_pallas(
        fb_in, target.depth, table, valid, aabb, light_vec,
        scissor=scissor,
        tile_h=tile_h, tile_w=tile_w, pairs_per_tri=pairs_per_tri,
        max_per_tile=max_per_tile, interpret=interpret,
        layout="planes_gbuf" if deferred else "planes",
        pair_budget=budget)
    if deferred:
        target.gbuffer = fb
    else:
        target.color = fb
    target.depth = dep
    stats.pair_overflow = stats.pair_overflow + st["pair_overflow"]
    stats.tile_overflow = stats.tile_overflow + st["tile_overflow"]


def make_mesh_pass(width, height, plugin=None, tile_h=32, tile_w=128,
                   pairs_per_tri=2, max_per_tile=256, backend="auto",
                   deferred=False, win_h=32, window_budget=65536,
                   eval_tris=None, visible_budget=65536,
                   occlusion_cull=False, phase_budget=16384,
                   material_fn=None, cull_budget=None, parallax_layers=8):
    from bevy_tpu.transform import GlobalTransform

    if backend == "auto":
        # sharding lives in the pallas groups path — with shards set,
        # "auto" MUST NOT fall back to the xla path (that silently
        # renders single-device and makes sharded tests vacuous)
        shards_on = plugin is not None and \
            getattr(plugin, "_shards", None) is not None
        backend = "pallas" if jax.default_backend() not in ("cpu", "gpu") \
            else ("pallas_interpret" if deferred or shards_on else "xla")
    interpret = backend == "pallas_interpret"
    if interpret:
        backend = "pallas"
    if plugin is not None:
        plugin._resolved_backend = backend

    @system(name="mesh_pass")
    def mesh_pass(q=Query(Read(Mesh3d), Read(MeshMaterial), Read(GlobalTransform)),
                  cam=Query(Read(Camera3d), Read(GlobalTransform)),
                  light=Query(Read(DirectionalLight), Read(GlobalTransform)),
                  amb=Res(AmbientLight),
                  pool=Res(MeshPool.RESOURCE),
                  exp=Res(EXPANSION),
                  matlas=Res("mesh_atlas"),
                  target=ResMut(RenderTarget.RESOURCE),
                  vism=ResMut("mesh_vis"),
                  mot=ResMut("mesh_motion"),
                  stats=ResMut("render_stats")):
        use_motion = plugin is not None and \
            getattr(plugin, "_motion_vectors", False)
        if use_motion:
            # reset validity: only pixels won this frame carry motion
            target.motion = jnp.zeros_like(target.motion)
        def render_view(ci, has_cam, view_idx):
            cam_gt = cam.global_transform
            # viewport pixel rect + aspect from this camera's rect
            # fractions; full-frame single-camera apps keep viewport=None so
            # the kernels' scissor test compiles out entirely
            if plugin is not None and getattr(plugin, "_use_viewports", False):
                vx0 = cam.camera3d.vp_min[ci, 0] * width
                vy0 = cam.camera3d.vp_min[ci, 1] * height
                vx1 = cam.camera3d.vp_max[ci, 0] * width
                vy1 = cam.camera3d.vp_max[ci, 1] * height
                viewport = (vx0, vy0, vx1, vy1)
                aspect = (vx1 - vx0) / jnp.maximum(vy1 - vy0, 1e-6)
            else:
                viewport = None
                aspect = width / height
            view = view_matrix(cam_gt.translation[ci], cam_gt.rotation[ci],
                               cam_gt.scale[ci])
            proj = perspective_infinite_reverse(
                cam.camera3d.fov[ci], aspect, cam.camera3d.near[ci])
            vp = proj @ view
            # per-row visibility for this camera: RenderLayers bitmask +
            # LOD distance band (ref: check_visibility / RenderLayers)
            distr = jnp.linalg.norm(
                q.global_transform.translation - cam_gt.translation[ci],
                axis=-1)
            visrow = ((q.mesh3d.layers & cam.camera3d.layers[ci]) != 0) & \
                (distr >= q.mesh3d.lod_near) & (distr < q.mesh3d.lod_far)

            groups = plugin._groups if plugin is not None else None
            if deferred and not (groups and backend == "pallas"):
                raise RuntimeError(
                    "deferred lighting requires the pallas backend")
            if groups is not None and backend == "pallas":
                # gather-free per-mesh uniform batches (see raster_batched);
                # mixed scenes render as a few sequential batches sharing the
                # depth buffer (ref: queue_material_meshes per-pipeline bins)
                lv = directional_light_vec(light, amb)
                has_tex = getattr(plugin, "_has_atlas", False)
                # parallax occlusion specialization: trace-time HOST read
                # (mirrors the clearcoat/aniso gates — compiles the POM
                # march out of scenes with no depth-mapped material)
                wref = getattr(plugin, "_world_ref", None)
                try:
                    has_pom = has_tex and wref is not None and bool(
                        np.any(np.asarray(jax.device_get(
                            wref.column(MeshMaterial,
                                        "parallax_depth_scale"))) > 0.0))
                except Exception:
                    has_pom = False
                try:
                    # unset pool rows are ZEROS (field defaults apply at
                    # spawn) — a row tints only when set AND non-white
                    _t = np.asarray(jax.device_get(wref.column(
                        MeshMaterial, "specular_tint")))
                    has_tint = wref is not None and bool(np.any(
                        (np.abs(_t - 1.0).max(-1) > 1e-6) &
                        (np.abs(_t).sum(-1) > 1e-6)))
                except Exception:
                    has_tint = False
                if has_pom:
                    # camera pixel-ray planes: world ray dir =
                    # ray[0] + px*ray[1] + py*ray[2] (px/py absolute
                    # framebuffer pixels; perspective, looks -z in view)
                    tf_r = jnp.tan(cam.camera3d.fov[ci] * 0.5)
                    ta_r = tf_r * aspect
                    if viewport is None:
                        rvx0, rvy0 = 0.0, 0.0
                        rvw, rvh = float(width), float(height)
                    else:
                        rvx0, rvy0 = viewport[0], viewport[1]
                        rvw = viewport[2] - viewport[0]
                        rvh = viewport[3] - viewport[1]
                    a_v = jnp.stack([ta_r * (-2.0 * rvx0 / rvw - 1.0),
                                     tf_r * (1.0 + 2.0 * rvy0 / rvh),
                                     -jnp.ones_like(tf_r)])
                    b_v = jnp.stack([2.0 * ta_r / rvw,
                                     jnp.zeros_like(tf_r),
                                     jnp.zeros_like(tf_r)])
                    c_v = jnp.stack([jnp.zeros_like(tf_r),
                                     -2.0 * tf_r / rvh,
                                     jnp.zeros_like(tf_r)])
                    camq = cam_gt.rotation[ci]
                    ray = jnp.stack([
                        quat_rotate_vec3(camq, a_v),
                        quat_rotate_vec3(camq, b_v),
                        quat_rotate_vec3(camq, c_v)])
                else:
                    ray = None
                # flatten (group, lod-level) draw items: auto-LOD meshes
                # draw once per level with a per-instance screen-error
                # mask (ref: the meshlet LOD cut — see render/meshlet.py)
                draw_items = []
                for gi, grp in enumerate(groups):
                    chain = plugin._lod_chains.get(grp["mesh"]) \
                        if plugin is not None else None
                    if chain is not None:
                        for li, mid_l in enumerate(chain["ids"]):
                            draw_items.append((gi, grp, mid_l, li, chain))
                    else:
                        draw_items.append((gi, grp, grp["mesh"], 0, None))
                for gi, grp, mesh_id, lod_li, chain in draw_items:
                    m = plugin.pool.meshes[mesh_id]
                    vc = m.num_vertices
                    rows_np = grp.get("rows_o", grp["rows"])
                    if len(rows_np) == 0:
                        continue
                    rows = jnp.asarray(rows_np)
                    if chain is not None:
                        from bevy_tpu.render.meshlet import select_lod
                        lvl_full = select_lod(
                            distr, chain["errors"], cam.camera3d.fov[ci],
                            height, chain["threshold_px"])
                        visrow_g = visrow & (lvl_full == lod_li)
                    else:
                        visrow_g = visrow
                    # two-phase occlusion: per (group, view) persistent
                    # visibility mask (ref: meshlet second-pass state)
                    vkey = f"g{gi}v{view_idx}" if chain is None else \
                        f"g{gi}l{lod_li}v{view_idx}"
                    vs = {"mask": getattr(vism, vkey)} \
                        if occlusion_cull and hasattr(vism, vkey) else None
                    # -- instance-level sphere-frustum cull + compaction
                    #    (ref: the GPU frustum cull of mesh_preprocess.wesl
                    #    + check_visibility_cpu_culling): every downstream
                    #    stage — vertex transform, corner extraction,
                    #    cluster AABBs, plane packing, window build — then
                    #    runs on <=cull_budget instances instead of the
                    #    whole group (many_cubes: ~55k of 160k visible)
                    use_cull = (cull_budget is not None and vs is None
                                and len(rows_np) > cull_budget)
                    if use_cull:
                        gt_t_f = q.global_transform.translation[rows]
                        gt_s_f = q.global_transform.scale[rows]
                        pos_np = np.asarray(m.positions, np.float32)
                        cen_np = (pos_np.min(0) + pos_np.max(0)) * 0.5
                        rad_np = float(np.linalg.norm(
                            pos_np - cen_np, axis=1).max())
                        # NOTE round-4 A/B: deferring the rotation
                        # gather past the compaction measured WORSE
                        # (33.2 -> 37.0 ms): [rows] here is a STATIC
                        # index array (compiles to overlapped async
                        # slices), while a post-cull [rows[ids]] gather
                        # is dynamic and runs on the scalar core
                        gt_r_f = q.global_transform.rotation[rows]
                        wc = gt_t_f + quat_rotate_vec3(
                            gt_r_f, jnp.asarray(cen_np)[None] * gt_s_f)
                        r_i = rad_np * jnp.max(jnp.abs(gt_s_f), axis=1)
                        vch = wc @ view[:3, :3].T + view[:3, 3]
                        tf_ = jnp.tan(cam.camera3d.fov[ci] * 0.5)
                        ta_ = tf_ * aspect
                        vz = vch[:, 2]
                        inside = -vz > cam.camera3d.near[ci] - r_i
                        inside &= (-vz * ta_ - jnp.abs(vch[:, 0])) > \
                            -r_i * jnp.sqrt(1.0 + ta_ * ta_)
                        inside &= (-vz * tf_ - jnp.abs(vch[:, 1])) > \
                            -r_i * jnp.sqrt(1.0 + tf_ * tf_)
                        # pred gathers at capacity scale run as slow
                        # bit-packed-layout fusions (r4 profile: 1.2 ms
                        # EACH); routed through i32 they compile to the
                        # same overlapped async slices as the float
                        # columns (~0.2 ms)
                        inside &= (q.mask.astype(jnp.int32)[rows] &
                                   visrow_g.astype(jnp.int32)[rows]) > 0
                        kb = min(cull_budget, len(rows_np))
                        nin = rows_np.shape[0]
                        posc = jnp.cumsum(inside.astype(jnp.int32)) - 1
                        tgt = jnp.where(inside & (posc < kb), posc, kb)
                        ids = jnp.zeros(kb + 1, jnp.int32).at[tgt].set(
                            jnp.arange(nin, dtype=jnp.int32),
                            mode="drop")[:kb]
                        nvis = jnp.sum(inside.astype(jnp.int32))
                        stats.pair_overflow = stats.pair_overflow + \
                            jnp.maximum(nvis - kb, 0)
                        rows = rows[ids]
                        gt_t, gt_r, gt_s = gt_t_f[ids], gt_r_f[ids], \
                            gt_s_f[ids]
                        inst_ok = (jnp.arange(kb, dtype=jnp.int32) < nvis) \
                            & has_cam
                    else:
                        gt_t = q.global_transform.translation[rows]
                        gt_r = q.global_transform.rotation[rows]
                        gt_s = q.global_transform.scale[rows]
                        inst_ok = q.mask[rows] & has_cam & visrow_g[rows]
                    mats = trs_to_mat4(TRS(
                        translation=gt_t, rotation=gt_r, scale=gt_s))
                    mvp = jnp.einsum("ij,njk->nik", vp, mats)
                    ph = jnp.concatenate([jnp.asarray(m.positions),
                                          jnp.ones((vc, 1), jnp.float32)], 1)
                    clip = jnp.einsum("nij,vj->nvi", mvp, ph)       # (Ni, VC, 4)
                    nrm = quat_rotate_vec3(gt_r[:, None, :],
                                           jnp.asarray(m.normals)[None])
                    if has_tex:
                        uvr = jnp.concatenate(
                            [q.mesh_material.uv_min[rows],
                             q.mesh_material.uv_max[rows]], 1)
                        cuv = np.asarray(m.uvs, np.float32)[
                            np.asarray(m.triangles, np.int64)]
                        nmr = jnp.concatenate(
                            [q.mesh_material.nm_min[rows],
                             q.mesh_material.nm_max[rows]], 1)
                        lmr = jnp.concatenate(
                            [q.mesh_material.lm_min[rows],
                             q.mesh_material.lm_max[rows]], 1)
                        dmr = jnp.concatenate(
                            [q.mesh_material.dm_min[rows],
                             q.mesh_material.dm_max[rows]], 1)
                        # channel textures (ref: StandardMaterial
                        # emissive/metallic_roughness/occlusion textures);
                        # trace-time gated so untextured worlds compile
                        # the same program
                        emr = jnp.concatenate(
                            [q.mesh_material.em_min[rows],
                             q.mesh_material.em_max[rows]], 1) \
                            if _col_nondefault(plugin, "em_max",
                                               (0.0, 0.0)) else None
                        mrr = jnp.concatenate(
                            [q.mesh_material.mr_min[rows],
                             q.mesh_material.mr_max[rows]], 1) \
                            if _col_nondefault(plugin, "mr_max",
                                               (0.0, 0.0)) else None
                        ocr = jnp.concatenate(
                            [q.mesh_material.oc_min[rows],
                             q.mesh_material.oc_max[rows]], 1) \
                            if _col_nondefault(plugin, "oc_max",
                                               (0.0, 0.0)) else None
                        # mesh-space per-tri tangents rotate with the
                        # instance exactly like normals
                        tcp_m = (m.num_triangles + 11) // 12 * 12
                        tan_l = np.zeros((tcp_m, 3), np.float32)
                        tan_l[:m.num_triangles] = m.tri_tangents()
                        tan = quat_rotate_vec3(gt_r[:, None, :],
                                               jnp.asarray(tan_l)[None])
                    else:
                        dmr = emr = mrr = ocr = None
                        uvr = cuv = nmr = tan = lmr = None
                        # anisotropy needs a tangent frame even without
                        # textures: trace-time gate via a HOST read of the
                        # world column (mirrors the deferred clearcoat
                        # specialization; the query fields here are
                        # tracers). Data-only edits after trace need a
                        # structural bump to re-specialize.
                        wref = getattr(plugin, "_world_ref", None)
                        try:
                            has_aniso = wref is not None and bool(
                                np.any(np.asarray(jax.device_get(
                                    wref.column(MeshMaterial,
                                                "anisotropy_strength")))
                                    > 0.0))
                        except Exception:
                            has_aniso = False
                        if has_aniso:
                            tcp_m = (m.num_triangles + 11) // 12 * 12
                            tan_l = np.zeros((tcp_m, 3), np.float32)
                            tan_l[:m.num_triangles] = m.tri_tangents()
                            tan = quat_rotate_vec3(gt_r[:, None, :],
                                                   jnp.asarray(tan_l)[None])
                    # static flat-mesh detection: identical corner
                    # normals per tri ⇒ Gouraud == flat EXACTLY, so the
                    # narrow flat-shade resolve is image-identical
                    nrm_np = np.asarray(m.normals, np.float32)[
                        np.asarray(m.triangles, np.int64)]
                    flat_ok = bool(np.all(nrm_np[:, 0] == nrm_np[:, 1]) and
                                   np.all(nrm_np[:, 0] == nrm_np[:, 2]))
                    # -- multi-chip: flat-opaque groups raster sharded
                    #    over the plugin's device mesh (instance-axis
                    #    shard_map, band all_to_all merge — see
                    #    parallel/raster.py; ref position:
                    #    gpu_preprocessing.rs scaled past one device)
                    shm = getattr(plugin, "shard_mesh", None)
                    if (shm is not None and flat_ok and not has_tex
                            and vs is None and viewport is None
                            and not deferred and material_fn is None):
                        from bevy_tpu.parallel.raster import (
                            sharded_instance_raster)
                        nsh = shm.devices.size
                        padn = (-clip.shape[0]) % nsh
                        mat9 = jnp.concatenate(
                            [q.mesh_material.base_color[rows],
                             q.mesh_material.emissive[rows],
                             q.mesh_material.metallic[rows][:, None],
                             q.mesh_material.perceptual_roughness[rows][
                                 :, None]], axis=1)
                        okp = inst_ok
                        if padn:
                            clip = jnp.pad(clip, ((0, padn), (0, 0), (0, 0)))
                            nrm = jnp.pad(nrm, ((0, padn), (0, 0), (0, 0)))
                            okp = jnp.pad(inst_ok, (0, padn))
                            mat9 = jnp.pad(mat9, ((0, padn), (0, 0)))
                        sh_interp = interpret or \
                            jax.default_backend() == "cpu"
                        colr, dep, ovf = sharded_instance_raster(
                            shm, clip, nrm, m.triangles, okp, mat9, lv,
                            target.color, target.depth,
                            width=width, height=height,
                            win_h=win_h,
                            window_budget=max(window_budget // nsh, 1024),
                            eval_tris=eval_tris, interpret=sh_interp)
                        target.color = colr
                        target.depth = dep
                        stats.pair_overflow = stats.pair_overflow + ovf
                        continue
                    # hierarchical cluster cull (opt-in; ref: the BVH
                    # cull of meshlet cull_bvh.wesl) — worthwhile only
                    # for cluster-heavy meshes, where interior nodes
                    # gate whole subtrees for 8 corners each
                    cl_extra = None
                    dag = plugin._dags.get(grp["mesh"]) \
                        if plugin is not None else None
                    if dag is not None:
                        # cluster-DAG LOD cut (ref: the meshlet runtime
                        # cut of cull_bvh.wesl): per instance, pick the
                        # one DAG level-slice whose projected group
                        # error brackets the pixel threshold — a dense
                        # hero mesh renders with a mixed-level cut
                        from bevy_tpu.math.quat import quat_conjugate
                        from bevy_tpu.render.meshlet import select_dag_cut
                        cam_w = cam_gt.translation[ci]
                        smax = jnp.max(gt_s, axis=-1, keepdims=True)
                        cam_local = quat_rotate_vec3(
                            quat_conjugate(gt_r),
                            cam_w[None] - gt_t) / jnp.maximum(smax, 1e-8)
                        cl_extra = jax.vmap(lambda cp: select_dag_cut(
                            cp, dag["info"], cam.camera3d.fov[ci],
                            height, dag["threshold_px"]))(cam_local)
                    if plugin._bvh_cull and m.num_triangles >= 12 * 64:
                        from bevy_tpu.ops.bvh import (
                            build_cluster_bvh, bvh_cull,
                            cluster_local_aabbs)
                        key = grp["mesh"]
                        if key not in plugin._bvh:
                            plugin._bvh[key] = build_cluster_bvh(
                                cluster_local_aabbs(
                                    m.positions, m.triangles, 12))
                        lv_b, order_b = plugin._bvh[key]
                        ncl_m = (m.num_triangles + 11) // 12
                        bvh_ok = bvh_cull(lv_b, order_b, mvp, ncl_m)
                        cl_extra = bvh_ok if cl_extra is None \
                            else (cl_extra & bvh_ok)
                    motd = motion_delta(
                        mot.t[rows], mot.r[rows], mot.s[rows],
                        gt_t, gt_r, gt_s) if use_motion else None
                    raster_batched(
                        clip, nrm, m.triangles, inst_ok,
                        q.mesh_material.base_color[rows],
                        q.mesh_material.emissive[rows],
                        lv, target, stats,
                        width=width, height=height, tile_h=tile_h, tile_w=tile_w,
                        pairs_per_tri=pairs_per_tri, max_per_tile=max_per_tile,
                        interpret=interpret, deferred=deferred,
                        met_i=q.mesh_material.metallic[rows],
                        rgh_i=q.mesh_material.perceptual_roughness[rows],
                        cc_i=q.mesh_material.clearcoat[rows],
                        ccr_i=q.mesh_material.clearcoat_roughness[rows],
                        aniso_i=q.mesh_material.anisotropy_strength[rows],
                        anrot_i=q.mesh_material.anisotropy_rotation[rows],
                        pds_i=q.mesh_material.parallax_depth_scale[rows],
                        refl_i=q.mesh_material.reflectance[rows],
                        bias_i=q.mesh_material.depth_bias[rows]
                        if _col_nondefault(plugin, "depth_bias", 0.0)
                        else None,
                        uvt_i=q.mesh_material.uv_transform[rows]
                        if _col_nondefault(plugin, "uv_transform",
                                           (1.0, 0.0, 0.0, 1.0, 0.0, 0.0))
                        else None,
                        dmr_i=dmr, emr_i=emr, mrr_i=mrr, ocr_i=ocr,
                        ray=ray,
                        parallax_layers=parallax_layers if has_pom else 0,
                        viewport=viewport, win_h=win_h,
                        window_budget=window_budget, eval_tris=eval_tris,
                        corner_uv=cuv, uvr_i=uvr, visible_budget=visible_budget,
                        atlas=matlas.data if has_tex else None,
                        cl_extra=cl_extra,
                        tri_mask=dag["info"]["tri_valid"]
                        if dag is not None else None,
                        flat_ok=flat_ok, vis_state=vs,
                        phase_budget=phase_budget, tan_i=tan, nmr_i=nmr,
                        lmr_i=lmr, material_fn=material_fn,
                        mesh_positions=m.positions,
                        tint_i=q.mesh_material.specular_tint[rows]
                        if has_tint else None,
                        motd_i=motd,
                        prev_vp=mot.vp if use_motion else None,
                        cur_inv_vp=jnp.linalg.inv(vp)
                        if use_motion else None)
                    if vs is not None:
                        setattr(vism, vkey, vs["mask"])
                # transparent phase: weighted-blended OIT over the opaque
                # result (forward path; ref: Transparent3d + oit/)
                t_groups = [g for g in groups if len(g.get("rows_t", []))]
                if t_groups and not deferred:
                    from bevy_tpu.ops.raster3d_splat import oit_blend
                    oit = jnp.zeros((5, height, width), jnp.float32)
                    oit = oit.at[4].set(1.0)
                    for grp in t_groups:
                        m = plugin.pool.meshes[grp["mesh"]]
                        vc = m.num_vertices
                        rows = jnp.asarray(grp["rows_t"])
                        gt_r = q.global_transform.rotation[rows]
                        mats = trs_to_mat4(TRS(
                            translation=q.global_transform.translation[rows],
                            rotation=gt_r,
                            scale=q.global_transform.scale[rows]))
                        mvp = jnp.einsum("ij,njk->nik", vp, mats)
                        ph = jnp.concatenate(
                            [jnp.asarray(m.positions),
                             jnp.ones((vc, 1), jnp.float32)], 1)
                        clip = jnp.einsum("nij,vj->nvi", mvp, ph)
                        nrm = quat_rotate_vec3(gt_r[:, None, :],
                                               jnp.asarray(m.normals)[None])
                        vis = visrow[rows]
                        oit, tovf = raster_transparent(
                            clip, nrm, m.triangles,
                            q.mask[rows] & has_cam & vis,
                            q.mesh_material.base_color[rows],
                            q.mesh_material.emissive[rows],
                            lv, target.depth, oit, width=width,
                            height=height, win_h=win_h,
                            viewport=viewport)
                        stats.pair_overflow = stats.pair_overflow + tovf
                    target.color = oit_blend(target.color, oit)
                return
            uni = plugin._uniform if plugin is not None else None
            if uni is not None:
                # uniform-mesh fast path: all instances share one mesh, so the
                # vertex stage is (Ni,4,4)@(VC,4) batched matmuls — zero
                # per-vertex gathers (ref: the instanced draw this mirrors)
                m = plugin.pool.meshes[uni["mesh"]]
                vc, tc = m.num_vertices, m.num_triangles
                rows = jnp.asarray(uni["rows"])
                ni = rows.shape[0]
                gt_t = q.global_transform.translation[rows]
                gt_r = q.global_transform.rotation[rows]
                gt_s = q.global_transform.scale[rows]
                mats = trs_to_mat4(TRS(translation=gt_t, rotation=gt_r, scale=gt_s))
                mvp = jnp.einsum("ij,njk->nik", vp, mats)
                mesh_pos = jnp.asarray(m.positions)
                ph = jnp.concatenate([mesh_pos, jnp.ones((vc, 1), jnp.float32)], 1)
                clip = jnp.einsum("nij,vj->nvi", mvp, ph).reshape(ni * vc, 4)
                nrm = quat_rotate_vec3(gt_r[:, None, :],
                                       jnp.asarray(m.normals)[None]).reshape(ni * vc, 3)
                tri_verts = (jnp.asarray(m.triangles, jnp.int32)[None] +
                             (jnp.arange(ni, dtype=jnp.int32) * vc)[:, None, None]
                             ).reshape(ni * tc, 3)
                tri_rows = jnp.repeat(rows, tc)
                tri_active = q.mask[tri_rows] & visrow[tri_rows] & has_cam
                colors = q.mesh_material.base_color[tri_rows]
                emissive = q.mesh_material.emissive[tri_rows]
            else:
                # general path: expanded gathers (mixed meshes)
                mats = trs_to_mat4(TRS(translation=q.global_transform.translation,
                                       rotation=q.global_transform.rotation,
                                       scale=q.global_transform.scale))
                mvp = jnp.einsum("ij,njk->nik", vp, mats)
                vi = exp.vert_inst
                pos = pool.positions[exp.vert_pool]
                ph = jnp.concatenate([pos, jnp.ones((pos.shape[0], 1), jnp.float32)], 1)
                clip = jnp.einsum("vij,vj->vi", mvp[vi], ph)
                # world-space normals (uniform-scale assumption; ref: inverse
                # transpose for non-uniform, mesh.rs MeshUniform inverse_transpose)
                nrm = quat_rotate_vec3(q.global_transform.rotation[vi],
                                       pool.normals[exp.vert_pool])
                tri_verts = exp.tri_verts
                tri_active = q.mask[exp.tri_inst] & visrow[exp.tri_inst] & has_cam
                colors = q.mesh_material.base_color[exp.tri_inst]
                emissive = q.mesh_material.emissive[exp.tri_inst]

            # near-plane clip before setup (the reference clipper's role;
            # ref: bevy's raster is hardware-clipped — the Pallas
            # visbuf/splat paths are clipless homogeneous and skip this)
            from bevy_tpu.ops.raster3d import (
                clip_near_corners, triangle_setup_corners)
            clip_c, corner_n, tri_active, src = clip_near_corners(
                clip[tri_verts], nrm[tri_verts], tri_active)
            colors = colors[src]
            emissive = emissive[src]
            setup = triangle_setup_corners(clip_c, tri_active, width,
                                           height, viewport=viewport)

            li, has_light = pick_camera(light.mask)
            ldir = quat_rotate_vec3(light.global_transform.rotation[li],
                                    jnp.asarray([0.0, 0.0, -1.0]))
            lcol = light.directional_light.color[li] * \
                light.directional_light.illuminance[li] * has_light
            light_vec = jnp.concatenate([
                ldir, lcol, amb.color * amb.brightness,
                jnp.zeros(7, jnp.float32)])

            if backend == "pallas":
                from bevy_tpu.ops.raster3d_pallas import (
                    pack_tri_table, raster_tris_pallas)
                table = pack_tri_table(setup, corner_n, colors, emissive)
                fb, dep, st = raster_tris_pallas(
                    target.color, target.depth, table, setup["valid"],
                    setup["aabb"], light_vec, scissor=viewport,
                    tile_h=tile_h, tile_w=tile_w,
                    pairs_per_tri=pairs_per_tri, max_per_tile=max_per_tile,
                    interpret=interpret)
            else:
                from bevy_tpu.ops.raster3d import raster_triangles
                varyings = jnp.concatenate(
                    [corner_n,
                     jnp.broadcast_to(colors[:, None, :], colors.shape[:1] + (3, 4)),
                     jnp.broadcast_to(emissive[:, None, :], emissive.shape[:1] + (3, 3)),
                     ], axis=2)                            # (T, 3, 10)

                def shade(interp, ti, bary):
                    n = interp[..., 0:3]
                    n = n * jax.lax.rsqrt(jnp.maximum(
                        jnp.sum(n * n, -1, keepdims=True), 1e-12))
                    lam = jnp.maximum(0.0, -jnp.sum(n * light_vec[:3], -1))
                    rgb = interp[..., 3:6] * (light_vec[6:9] +
                                              light_vec[3:6] * lam[..., None]) \
                        + interp[..., 7:10]
                    return jnp.concatenate([rgb, interp[..., 6:7]], -1)

                fbi, dep, st = raster_triangles(
                    target.color.transpose(1, 2, 0), target.depth, setup,
                    varyings, shade, scissor=viewport,
                    tile_h=tile_h, tile_w=tile_w,
                    pairs_per_tri=pairs_per_tri, max_per_tile=max_per_tile,
                    num_varyings=10)
                fb = fbi.transpose(2, 0, 1)
            target.color = fb
            target.depth = dep
            stats.pair_overflow = stats.pair_overflow + st["pair_overflow"]
            stats.tile_overflow = stats.tile_overflow + st["tile_overflow"]

        # one pass per camera, ascending `order` (ref: camera driver
        # sorted_camera_index_for_target); camera count is structural —
        # the prepare hook re-counts and retraces on change
        n_cams = getattr(plugin, "_num_cameras", 1) if plugin is not None else 1
        if n_cams > 1:
            okey = jnp.where(cam.mask, cam.camera3d.order, jnp.int32(2 ** 30))
            cam_rows = jnp.argsort(okey)
            for k in range(n_cams):
                render_view(cam_rows[k], cam.mask[cam_rows[k]], k)
        else:
            ci0, has0 = pick_camera(cam.mask)
            render_view(ci0, has0, 0)

        if use_motion:
            # retain this frame's transforms + primary-camera VP for the
            # next frame's deltas (ref: bevy_pbr previous_transform
            # update in PostUpdate)
            mot.t = q.global_transform.translation
            mot.r = q.global_transform.rotation
            mot.s = q.global_transform.scale
            ci0, _ = pick_camera(cam.mask)
            cam_gt0 = cam.global_transform
            view0 = view_matrix(cam_gt0.translation[ci0],
                                cam_gt0.rotation[ci0],
                                cam_gt0.scale[ci0])
            proj0 = perspective_infinite_reverse(
                cam.camera3d.fov[ci0], width / height,
                cam.camera3d.near[ci0])
            mot.vp = proj0 @ view0

    return mesh_pass


class Mesh3dPlugin(Plugin):
    """ref: MeshPlugin + PbrPlugin's pipeline half. Owns the MeshPool;
    call `plugin.pool.add(mesh)` before App.run (meshes are startup-baked;
    runtime mesh streaming goes through pool rebuild + retrace)."""

    def __init__(self, pool: MeshPool = None, tile_h=32, tile_w=128,
                 pairs_per_tri=2, max_per_tile=256, backend="auto",
                 deferred=False, win_h=32, window_budget=65536,
                 eval_tris=None, atlas=None, visible_budget=65536,
                 occlusion_cull=False, phase_budget=16384,
                 material_fn=None, cull_budget=None, shards=None,
                 parallax_layers=8, bvh_cull=False, motion_vectors=False):
        self.pool = pool or MeshPool()
        self._uniform = None
        self._groups = None
        self._lod_chains = {}      # mesh id -> {ids, errors, threshold}
        self._dags = {}            # mesh id -> {info, threshold_px} (DAG LOD)
        self._bvh = {}             # mesh id -> (levels, order) bvh cache
        self._bvh_cull = bvh_cull  # opt-in hierarchical cluster cull
        # per-object motion vectors (ref: the motion-vector prepass,
        # bevy_core_pipeline/src/prepass/mod.rs): retains previous-frame
        # instance transforms + camera VP and emits target.motion
        # (dy, dx, valid) planes at the winner resolve. Opt-in: costs
        # one (T,12) table + one per-pixel row gather per frame.
        self._motion_vectors = motion_vectors
        # shards: None, a device count, or a jax.sharding.Mesh — flat
        # opaque groups then raster multi-chip (parallel/raster.py)
        self._shards = shards
        self.shard_mesh = None
        # atlas: an AtlasBuilder (or prebuilt (AH, AW, 4) array) holding
        # material base-color textures (ref: the bindless material
        # texture arrays of material_bind_groups.rs)
        self.atlas = atlas
        self._has_atlas = atlas is not None
        self.cfg = dict(tile_h=tile_h, tile_w=tile_w,
                        pairs_per_tri=pairs_per_tri,
                        max_per_tile=max_per_tile, backend=backend,
                        deferred=deferred, win_h=win_h,
                        window_budget=window_budget, eval_tris=eval_tris,
                        visible_budget=visible_budget,
                        occlusion_cull=occlusion_cull,
                        phase_budget=phase_budget,
                        material_fn=material_fn, cull_budget=cull_budget,
                        parallax_layers=parallax_layers)

    def build(self, app):
        from bevy_tpu.render.plugin import RenderPlugin
        from bevy_tpu.render.sprite import Sprite  # noqa: F401 (pass order)
        rp = next((p for p in app._plugins if isinstance(p, RenderPlugin)), None)
        if rp is None:
            raise RuntimeError("Mesh3dPlugin requires RenderPlugin")
        self._world_ref = app.world     # trace-time material specialization
        if self._shards is not None:
            from jax.sharding import Mesh as _Mesh
            if isinstance(self._shards, _Mesh):
                self.shard_mesh = self._shards
            else:
                from bevy_tpu.parallel import make_mesh
                self.shard_mesh = make_mesh(int(self._shards))
        from bevy_tpu.transform import GlobalTransform, Transform
        for c in (Mesh3d, MeshMaterial, DirectionalLight, Camera3d,
                  Transform, GlobalTransform):
            app.world.register_component(c)
        app.init_resource(AmbientLight())
        if "render_stats" not in app.world.state["res"]:
            app.insert_resource("render_stats", {
                "pair_overflow": jnp.asarray(0, jnp.int32),
                "tile_overflow": jnp.asarray(0, jnp.int32),
            })
        pool_host = self.pool
        plugin = self

        def finish_pool(world):
            world.state["res"][MeshPool.RESOURCE] = pool_host.build()
            if plugin._has_atlas:
                a = plugin.atlas
                data = a.build() if hasattr(a, "build") else jnp.asarray(a)
            else:
                data = jnp.zeros((1, 1, 4), jnp.float32)
            world.state["res"]["mesh_atlas"] = {"data": data}
            _rebuild_expansion(world, pool_host, plugin)
            # persistent per-(group, view) cluster visibility masks for
            # the two-phase occlusion cull (init all-visible: frame 1
            # renders everything, later frames converge to the true set)
            vis = {}
            if plugin.cfg.get("occlusion_cull", False):
                n_views = max(1, getattr(plugin, "_num_cameras", 1))
                for gi, grp in enumerate(plugin._groups or []):
                    m = pool_host.meshes[grp["mesh"]]
                    tcp = (m.num_triangles + 11) // 12 * 12
                    n_cl = max(1, len(grp["rows"])) * (tcp // 12)
                    for v in range(n_views):
                        vis[f"g{gi}v{v}"] = jnp.ones(n_cl, bool)
            world.state["res"]["mesh_vis"] = vis
            gtf = world.state["comp"]["global_transform"]["f"]
            if plugin._motion_vectors:
                # `+ 0` forces FRESH buffers — aliasing the live columns
                # would donate the same buffer twice in the jitted
                # segment (same rule as the observer tick-window init)
                world.state["res"]["mesh_motion"] = {
                    "t": gtf["translation"] + 0,
                    "r": gtf["rotation"] + 0,
                    "s": gtf["scale"] + 0,
                    "vp": jnp.eye(4, dtype=jnp.float32)}
                world.state["res"][RenderTarget.RESOURCE]["motion"] = \
                    jnp.zeros((3, rp.height, rp.width), jnp.float32)
            else:
                world.state["res"]["mesh_motion"] = {
                    "t": jnp.zeros((1, 3)), "r": jnp.zeros((1, 4)),
                    "s": jnp.zeros((1, 3)),
                    "vp": jnp.eye(4, dtype=jnp.float32)}

        app.add_prepare_hook(finish_pool)
        # opaque 3D draws in PASS_SET; 2D overlay composes later (set order)
        app.add_systems(Render,
                        make_mesh_pass(rp.width, rp.height, plugin=self,
                                       **self.cfg),
                        in_set=PASS_SET)

    # expose for examples
    def add_mesh(self, mesh, lods: int = 1, lod_ratio: float = 0.35,
                 lod_threshold_px: float = 1.0) -> int:
        """Register a mesh. lods > 1 builds a QEM-simplified LOD chain
        (render/meshlet.py; ref: bevy_pbr/src/meshlet/from_mesh.rs) —
        the mesh pass then auto-selects the coarsest level whose
        projected geometric error stays under lod_threshold_px per
        instance per frame."""
        mid = self.pool.add(mesh)
        if lods > 1:
            from bevy_tpu.render.meshlet import build_lod_chain
            meshes, errors = build_lod_chain(mesh, levels=lods,
                                             ratio=lod_ratio)
            ids = [mid] + [self.pool.add(m) for m in meshes[1:]]
            self._lod_chains[mid] = {
                "ids": ids, "errors": errors,
                "threshold_px": lod_threshold_px}
        return mid

    def add_mesh_dag(self, mesh, threshold_px: float = 1.0,
                     group_size: int = 4, max_levels: int = 16) -> int:
        """Register a dense mesh with cluster-DAG LOD (ref:
        bevy_pbr/src/meshlet/from_mesh.rs — per-cluster-group QEM
        simplification building a DAG; the mesh pass selects a
        mixed-level cut WITHIN the mesh each frame via the projected
        group-error test). The registered mesh holds every DAG level's
        clusters; typically ~2x the source triangle count, of which one
        cut's worth draws per frame."""
        from bevy_tpu.render.meshlet import build_cluster_dag
        cs = 12                      # the pipeline's cluster unit
        dag_mesh, info = build_cluster_dag(
            mesh, cs=cs, group_size=group_size, max_levels=max_levels)
        mid = self.pool.add(dag_mesh)
        self._dags[mid] = {"info": info, "threshold_px": threshold_px}
        return mid
