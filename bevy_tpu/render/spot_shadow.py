"""Spot-light shadow mapping (reference twin: the spot-shadow half of
bevy_pbr/src/render/light.rs — one perspective depth view per
shadow-casting spot, sampled during shading).

One spot light with `SpotLight(shadows=1)` renders a perspective
depth-only pass from its pose (fov = 2x outer angle); the binned shade
kernel skips it (deferred.py masks it out) and this plugin's XLA pass
adds its full Cook-Torrance GGX contribution with the shadow factor —
same math as ops/shade_pallas so shadowed and unshadowed spots match.
Requires the deferred G-buffer."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from bevy_tpu.app.main_schedule import Render
from bevy_tpu.app.plugin import Plugin
from bevy_tpu.ecs.query import Query, Read, ResMut
from bevy_tpu.ecs.system import system
from bevy_tpu.math.affine import TRS, trs_to_mat4
from bevy_tpu.math.quat import quat_rotate_vec3
from bevy_tpu.render.camera import (
    Camera3d, perspective_infinite_reverse, pick_camera, view_matrix,
)
from bevy_tpu.render.deferred import SpotLight
from bevy_tpu.render.mesh3d import Mesh3d, MeshMaterial
from bevy_tpu.render.plugin import (
    CLEAR_SET, PASS_SET, SHADE_SET, RenderTarget,
)
from bevy_tpu.transform import GlobalTransform


def _pick_shadow_spot(slight):
    """Row index + mask of the first shadow-casting spot."""
    sel = slight.mask & (slight.spot_light.shadows > 0)
    idx = jnp.argmax(sel)
    return idx, jnp.any(sel)


@system(name="clear_spot_shadow")
def clear_spot_shadow(target=ResMut(RenderTarget.RESOURCE)):
    target.spot_shadow_depth = jnp.zeros_like(target.spot_shadow_depth)


def ggx_light(albedo, n, metallic, rough, view_dir, ldir, lcol,
              cc=None, ccr=None):
    """Cook-Torrance GGX matching ops/shade_pallas.py shade_light.
    All (..., 3)/(...,) planes; ldir points TOWARD the light. Optional
    clearcoat weight/roughness planes add the second lobe (Kelemen
    visibility) with base-layer fresnel attenuation."""
    rough = jnp.clip(rough, 0.045, 1.0)
    alpha = rough * rough
    a2 = alpha * alpha
    nov = jnp.maximum(jnp.sum(n * view_dir, -1), 1e-4)
    nol = jnp.maximum(jnp.sum(n * ldir, -1), 0.0)
    h = ldir + view_dir
    h = h * jax.lax.rsqrt(jnp.maximum(jnp.sum(h * h, -1, keepdims=True),
                                      1e-9))
    noh = jnp.maximum(jnp.sum(n * h, -1), 0.0)
    loh = jnp.maximum(jnp.sum(ldir * h, -1), 0.0)
    den = noh * noh * (a2 - 1.0) + 1.0
    dist = a2 / jnp.maximum(jnp.pi * den * den, 1e-9)
    vis = 0.5 / jnp.maximum(
        nol * (nov * (1.0 - alpha) + alpha) +
        nov * (nol * (1.0 - alpha) + alpha), 1e-4)
    f0 = 0.04 * (1.0 - metallic[..., None]) + albedo * metallic[..., None]
    fres = (1.0 - loh[..., None]) ** 5
    spec = (dist * vis)[..., None] * (f0 + (1.0 - f0) * fres)
    diff = albedo * (1.0 - metallic[..., None])
    base = diff + spec
    if cc is not None:
        ccr_c = jnp.clip(ccr, 0.045, 1.0)
        cc_a2 = (ccr_c * ccr_c) ** 2
        ccden = noh * noh * (cc_a2 - 1.0) + 1.0
        ccdist = cc_a2 / jnp.maximum(jnp.pi * ccden * ccden, 1e-9)
        ccvis = 0.25 / jnp.maximum(loh * loh, 1e-4)
        fc = ((0.04 + 0.96 * fres[..., 0]) * cc)[..., None]
        base = base * (1.0 - fc) + (ccdist * ccvis)[..., None] * fc
    return base * lcol * nol[..., None]


class SpotShadowPlugin(Plugin):
    """Shadow map + shaded contribution for the first SpotLight with
    shadows=1. Requires Mesh3dPlugin(deferred=True) + DeferredLightingPlugin."""

    def __init__(self, mesh_plugin, size=512, near=0.1, bias=2e-3,
                 backend="auto"):
        self.mesh_plugin = mesh_plugin
        self.size = size
        self.near = near
        self.bias = bias
        self.backend = backend

    def build(self, app):
        import jax as _jax

        from bevy_tpu.render.mesh3d import raster_batched
        from bevy_tpu.render.plugin import RenderPlugin

        backend = self.backend
        if backend == "auto":
            backend = "pallas" \
                if _jax.default_backend() not in ("cpu", "gpu") \
                else "pallas_interpret"
        interpret = backend == "pallas_interpret"
        rp = next(p for p in app._plugins
                  if type(p).__name__ == "RenderPlugin")
        width, height = rp.width, rp.height
        size, near, bias = self.size, self.near, self.bias
        mesh_plugin = self.mesh_plugin
        store = app.world.state["res"][RenderTarget.RESOURCE]
        store["spot_shadow_depth"] = jnp.zeros((size, size), jnp.float32)
        store["spot_shadow_vp"] = jnp.eye(4, dtype=jnp.float32)
        app.world.structure_version += 1

        class _Stats:
            pair_overflow = jnp.zeros((), jnp.int32)
            tile_overflow = jnp.zeros((), jnp.int32)

        class _Target:
            pass

        @system(name="spot_shadow_pass")
        def spot_shadow_pass(q=Query(Read(Mesh3d), Read(MeshMaterial),
                                     Read(GlobalTransform)),
                             slight=Query(Read(SpotLight),
                                          Read(GlobalTransform)),
                             target=ResMut(RenderTarget.RESOURCE)):
            li, has = _pick_shadow_spot(slight)
            lgt = slight.global_transform
            lview = view_matrix(lgt.translation[li], lgt.rotation[li],
                                jnp.ones(3))
            fov = jnp.maximum(slight.spot_light.outer_angle[li] * 2.0, 0.1)
            proj = perspective_infinite_reverse(fov, 1.0,
                                                jnp.asarray(near))
            lvp = proj @ lview
            t = _Target()
            t.color = jnp.zeros((4, size, size), jnp.float32)
            t.depth = target.spot_shadow_depth
            st = _Stats()
            for grp in (mesh_plugin._groups or []):
                m = mesh_plugin.pool.meshes[grp["mesh"]]
                vc = m.num_vertices
                rows = jnp.asarray(grp["rows"])
                gt_r = q.global_transform.rotation[rows]
                mats = trs_to_mat4(TRS(
                    translation=q.global_transform.translation[rows],
                    rotation=gt_r, scale=q.global_transform.scale[rows]))
                mvp = jnp.einsum("ij,njk->nik", lvp, mats)
                ph = jnp.concatenate([jnp.asarray(m.positions),
                                      jnp.ones((vc, 1), jnp.float32)], 1)
                clip = jnp.einsum("nij,vj->nvi", mvp, ph)
                nrm = quat_rotate_vec3(gt_r[:, None, :],
                                       jnp.asarray(m.normals)[None])
                raster_batched(
                    clip, nrm, m.triangles, q.mask[rows] & has,
                    q.mesh_material.base_color[rows],
                    q.mesh_material.emissive[rows],
                    jnp.zeros(16, jnp.float32), t, st, depth_only=True,
                    width=size, height=size, interpret=interpret)
            target.spot_shadow_depth = t.depth
            target.spot_shadow_vp = lvp

        @system(name="spot_shadow_shade")
        def spot_shadow_shade(cam=Query(Read(Camera3d),
                                        Read(GlobalTransform)),
                              slight=Query(Read(SpotLight),
                                           Read(GlobalTransform)),
                              target=ResMut(RenderTarget.RESOURCE)):
            li, has = _pick_shadow_spot(slight)
            c = target.color
            g = target.gbuffer
            ci, has_cam = pick_camera(cam.mask)
            cam_gt = cam.global_transform
            view = view_matrix(cam_gt.translation[ci], cam_gt.rotation[ci],
                               cam_gt.scale[ci])
            proj = perspective_infinite_reverse(
                cam.camera3d.fov[ci], width / height, cam.camera3d.near[ci])
            inv_vp = jnp.linalg.inv(proj @ view)
            z = target.depth
            ys = 1.0 - 2.0 * (jnp.arange(height, dtype=jnp.float32) + 0.5) \
                / height
            xs = 2.0 * (jnp.arange(width, dtype=jnp.float32) + 0.5) / width \
                - 1.0
            ndc = jnp.stack([jnp.broadcast_to(xs[None, :], z.shape),
                             jnp.broadcast_to(ys[:, None], z.shape), z,
                             jnp.ones_like(z)], -1)
            wh = jnp.einsum("ij,hwj->hwi", inv_vp, ndc)
            world = wh[..., :3] / jnp.where(jnp.abs(wh[..., 3:4]) > 1e-9,
                                            wh[..., 3:4], 1.0)
            lgt = slight.global_transform
            lpos = lgt.translation[li]
            ldirv = lpos[None, None, :] - world
            d2 = jnp.sum(ldirv * ldirv, -1)
            inv_d = jax.lax.rsqrt(jnp.maximum(d2, 1e-9))
            ldir = ldirv * inv_d[..., None]
            rng = slight.spot_light.range[li]
            win = jnp.clip(1.0 - (d2 / jnp.maximum(rng * rng, 1e-9)) ** 2,
                           0.0, 1.0)
            atten = win * win / (d2 + 1.0)
            axis = quat_rotate_vec3(lgt.rotation[li],
                                    jnp.asarray([0.0, 0.0, -1.0]))
            cos_to = -jnp.sum(ldir * axis[None, None, :], -1)
            cos_o = jnp.cos(slight.spot_light.outer_angle[li])
            inv_co = 1.0 / jnp.maximum(
                jnp.cos(slight.spot_light.inner_angle[li]) - cos_o, 1e-4)
            cone = jnp.clip((cos_to - cos_o) * inv_co, 0.0, 1.0)
            atten = atten * cone * cone
            # perspective shadow lookup (reverse-z like the main pass)
            ph = jnp.concatenate([world, jnp.ones(z.shape + (1,),
                                                  jnp.float32)], -1)
            lc = jnp.einsum("ij,hwj->hwi", target.spot_shadow_vp, ph)
            lw = jnp.where(jnp.abs(lc[..., 3]) > 1e-8, lc[..., 3], 1.0)
            sx = lc[..., 0] / lw
            sy = lc[..., 1] / lw
            lz = lc[..., 2] / lw
            ix = jnp.clip(((sx * 0.5 + 0.5) * size).astype(jnp.int32),
                          0, size - 1)
            iy = jnp.clip(((0.5 - sy * 0.5) * size).astype(jnp.int32),
                          0, size - 1)
            inside = (jnp.abs(sx) < 1.0) & (jnp.abs(sy) < 1.0) & \
                (lc[..., 3] > 0)
            occ = target.spot_shadow_depth[iy, ix]
            lit = ((occ <= lz + bias) | ~inside).astype(jnp.float32)
            albedo = jnp.moveaxis(g[0:3], 0, -1)
            n = jnp.moveaxis(g[4:7], 0, -1)
            vdir = cam_gt.translation[ci][None, None, :] - world
            vdir = vdir * jax.lax.rsqrt(jnp.maximum(
                jnp.sum(vdir * vdir, -1, keepdims=True), 1e-9))
            lcol = (slight.spot_light.color[li] *
                    slight.spot_light.intensity[li])[None, None, :] * \
                (atten * lit)[..., None]
            add = ggx_light(albedo, n, g[10], g[11], vdir, ldir, lcol,
                            cc=g[12], ccr=g[13])
            geom = (z > 0) & has & has_cam
            rgb = jnp.where(geom[None],
                            c[:3] + jnp.moveaxis(add, -1, 0), c[:3])
            target.color = jnp.concatenate([rgb, c[3:4]], 0)

        app.add_systems(Render, clear_spot_shadow, in_set=CLEAR_SET)
        app.add_systems(Render, spot_shadow_pass, in_set=PASS_SET,
                        before="mesh_pass")
        app.add_systems(Render, spot_shadow_shade, in_set=SHADE_SET,
                        after="deferred_shade")
