"""Specular transmission (reference twin: the Transmissive3d phase of
bevy_pbr — `StandardMaterial::specular_transmission` + the screen-space
transmission texture the main pass copies and samples with
roughness-dependent blur, `bevy_core_pipeline` transmission steps).

TPU form: transmissive instances leave the opaque/transparent phases
(`_rebuild_expansion` rows_x) and raster here into a TEMP 14-channel
G-buffer whose depth starts as the opaque depth (opaque occludes
transmissive for free). A full-screen XLA pass then refracts: the
screen-space tangential component of the surface normal offsets the
background sample (scaled by ior-1, the thin-surface refraction
approximation bevy's own screen-space path makes), roughness widens a
small tap ring, fresnel splits transmitted vs reflected energy, and a
GGX highlight from the directional light sits on top. The per-pixel
transmission weight and ior ride the temp G-buffer's clearcoat
channels (clearcoat is ignored on transmissive surfaces)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from bevy_tpu.app.main_schedule import Render
from bevy_tpu.app.plugin import Plugin
from bevy_tpu.ecs.query import Query, Read, Res, ResMut
from bevy_tpu.ecs.system import system
from bevy_tpu.math.affine import TRS, trs_to_mat4
from bevy_tpu.math.quat import quat_rotate_vec3
from bevy_tpu.render.camera import (
    Camera3d, perspective_infinite_reverse, pick_camera, view_matrix,
)
from bevy_tpu.render.mesh3d import (
    AmbientLight, DirectionalLight, Mesh3d, MeshMaterial,
)
from bevy_tpu.render.plugin import SHADE_SET, RenderTarget
from bevy_tpu.render.spot_shadow import ggx_light
from bevy_tpu.transform import GlobalTransform


class TransmissionPlugin(Plugin):
    """Screen-space transmission for materials with
    specular_transmission > 0. Works with the forward or deferred
    pallas mesh path."""

    def __init__(self, mesh_plugin, strength=60.0, backend="auto"):
        self.mesh_plugin = mesh_plugin
        self.strength = strength      # px offset per unit of (ior-1)
        self.backend = backend

    def build(self, app):
        from bevy_tpu.render.mesh3d import raster_batched
        from bevy_tpu.render.plugin import RenderPlugin

        backend = self.backend
        if backend == "auto":
            backend = "pallas" \
                if jax.default_backend() not in ("cpu", "gpu") \
                else "pallas_interpret"
        interpret = backend == "pallas_interpret"
        rp = next(p for p in app._plugins
                  if type(p).__name__ == "RenderPlugin")
        width, height = rp.width, rp.height
        strength = self.strength
        mesh_plugin = self.mesh_plugin

        class _Stats:
            pair_overflow = jnp.zeros((), jnp.int32)
            tile_overflow = jnp.zeros((), jnp.int32)

        class _Target:
            pass

        @system(name="transmission_pass")
        def transmission_pass(q=Query(Read(Mesh3d), Read(MeshMaterial),
                                      Read(GlobalTransform)),
                              cam=Query(Read(Camera3d),
                                        Read(GlobalTransform)),
                              light=Query(Read(DirectionalLight),
                                          Read(GlobalTransform)),
                              amb=Res(AmbientLight),
                              target=ResMut(RenderTarget.RESOURCE)):
            groups = [g for g in (mesh_plugin._groups or [])
                      if len(g.get("rows_x", []))]
            if not groups:
                return
            c = target.color
            ci, has_cam = pick_camera(cam.mask)
            cam_gt = cam.global_transform
            view = view_matrix(cam_gt.translation[ci], cam_gt.rotation[ci],
                               cam_gt.scale[ci])
            proj = perspective_infinite_reverse(
                cam.camera3d.fov[ci], width / height, cam.camera3d.near[ci])
            vp = proj @ view

            # raster transmissive groups into a temp G-buffer, depth
            # seeded with the opaque depth (ref: Transmissive3d draws
            # after the transmission-texture copy, depth-tested)
            t = _Target()
            t.gbuffer = jnp.zeros((14, height, width), jnp.float32)
            t.depth = target.depth
            st_mark = _Stats()
            for grp in groups:
                m = mesh_plugin.pool.meshes[grp["mesh"]]
                vc = m.num_vertices
                rows = jnp.asarray(grp["rows_x"])
                gt_r = q.global_transform.rotation[rows]
                mats = trs_to_mat4(TRS(
                    translation=q.global_transform.translation[rows],
                    rotation=gt_r, scale=q.global_transform.scale[rows]))
                mvp = jnp.einsum("ij,njk->nik", vp, mats)
                ph = jnp.concatenate([jnp.asarray(m.positions),
                                      jnp.ones((vc, 1), jnp.float32)], 1)
                clip = jnp.einsum("nij,vj->nvi", mvp, ph)
                nrm = quat_rotate_vec3(gt_r[:, None, :],
                                       jnp.asarray(m.normals)[None])
                # volume params ride TEMP-buffer channels the composite
                # below owns (ref: StandardMaterial thickness /
                # attenuation_distance / attenuation_color /
                # diffuse_transmission — the volumetric transmission set
                # of pbr_material.rs): alpha slot = diffuse_transmission,
                # emissive slots = attenuation_color, metallic slot =
                # Beer-Lambert exponent thickness/attenuation_distance
                # (attenuation_distance == 0 disables, matching the
                # field's off default)
                att_d = q.mesh_material.attenuation_distance[rows]
                att_exp = jnp.where(
                    att_d > 0.0,
                    q.mesh_material.thickness[rows] /
                    jnp.maximum(att_d, 1e-6), 0.0)
                raster_batched(
                    clip, nrm, m.triangles, q.mask[rows] & has_cam,
                    jnp.concatenate(
                        [q.mesh_material.base_color[rows][:, :3],
                         q.mesh_material.diffuse_transmission[rows][:, None]],
                        1),
                    q.mesh_material.attenuation_color[rows],
                    jnp.zeros(16, jnp.float32), t, st_mark,
                    width=width, height=height, interpret=interpret,
                    deferred=True,
                    met_i=att_exp,
                    rgh_i=q.mesh_material.perceptual_roughness[rows],
                    # per-pixel transmission weight + ior ride the
                    # clearcoat channels of the TEMP buffer only
                    cc_i=q.mesh_material.specular_transmission[rows],
                    ccr_i=q.mesh_material.ior[rows])
            g = t.gbuffer
            covered = t.depth > target.depth

            n = jnp.moveaxis(g[4:7], 0, -1)
            tint = jnp.moveaxis(g[0:3], 0, -1)
            rough = g[11]
            stw = jnp.clip(g[12], 0.0, 1.0)
            ior = jnp.maximum(g[13], 1.0)

            # screen-space refraction offset from the tangential normal
            rightv = quat_rotate_vec3(cam_gt.rotation[ci],
                                      jnp.asarray([1.0, 0.0, 0.0]))
            upv = quat_rotate_vec3(cam_gt.rotation[ci],
                                   jnp.asarray([0.0, 1.0, 0.0]))
            nsx = jnp.einsum("hwj,j->hw", n, rightv)
            nsy = jnp.einsum("hwj,j->hw", n, upv)
            off = strength * (ior - 1.0)
            yy = jnp.arange(height, dtype=jnp.float32)[:, None]
            xx = jnp.arange(width, dtype=jnp.float32)[None, :]

            def bg_at(scale):
                sx = jnp.clip(jnp.round(xx - nsx * off * scale)
                              .astype(jnp.int32), 0, width - 1)
                sy = jnp.clip(jnp.round(yy + nsy * off * scale)
                              .astype(jnp.int32), 0, height - 1)
                return jnp.moveaxis(c[:3, sy, sx], 0, -1)

            # roughness ring blur: center + 4 spread taps
            spread = 1.0 + rough * 3.0
            bg = bg_at(1.0)
            for s in (0.85, 0.95, 1.05, 1.15):
                bg = bg + bg_at(((s - 1.0) * spread + 1.0))
            bg = bg / 5.0
            # Beer-Lambert volume attenuation (ref: attenuation_color ^
            # (thickness / attenuation_distance), the volume absorption
            # of bevy's transmission shading)
            att_exp = g[10]
            att_col = jnp.moveaxis(g[7:10], 0, -1)
            t_att = jnp.exp(att_exp[..., None] *
                            jnp.log(jnp.clip(att_col, 1e-4, 1.0)))
            transmitted = tint * bg * t_att

            # fresnel split + lit surface for the reflected fraction;
            # view dir approximated per-pixel from the camera forward
            # (full reconstruction is unnecessary for the fresnel term)
            fwd = quat_rotate_vec3(cam_gt.rotation[ci],
                                   jnp.asarray([0.0, 0.0, 1.0]))
            vdirs = jnp.broadcast_to(fwd, n.shape)
            nov = jnp.clip(jnp.sum(n * vdirs, -1), 0.0, 1.0)
            fres = 0.04 + 0.96 * (1.0 - nov) ** 5

            li, has_light = pick_camera(light.mask)
            ldir = -quat_rotate_vec3(light.global_transform.rotation[li],
                                     jnp.asarray([0.0, 0.0, -1.0]))
            lcol = (light.directional_light.color[li] *
                    light.directional_light.illuminance[li] *
                    has_light)[None, None, :]
            spec = ggx_light(jnp.zeros_like(tint), n, jnp.zeros_like(rough),
                             rough, vdirs, jnp.broadcast_to(ldir, n.shape),
                             lcol)
            lam = jnp.maximum(jnp.sum(n * ldir[None, None, :], -1), 0.0)
            # diffuse transmission (translucency — light arriving from
            # BEHIND the surface, flipped-normal Lambert; ref:
            # StandardMaterial::diffuse_transmission): lerps the diffuse
            # lobe between front- and back-lit
            dtw = jnp.clip(g[3], 0.0, 1.0)
            lam_back = jnp.maximum(-jnp.sum(n * ldir[None, None, :], -1),
                                   0.0)
            lam_mix = lam * (1.0 - dtw) + lam_back * dtw
            surface = tint * (amb.color * amb.brightness +
                              lcol * lam_mix[..., None])
            mixw = (stw * (1.0 - fres))[..., None]
            out = surface * (1.0 - mixw) + transmitted * mixw + spec
            rgb = jnp.where(covered[None], jnp.moveaxis(out, -1, 0), c[:3])
            target.color = jnp.concatenate([rgb, c[3:4]], 0)
            target.depth = jnp.where(covered, t.depth, target.depth)

        app.add_systems(Render, transmission_pass, in_set=SHADE_SET,
                        after="mesh_pass")
