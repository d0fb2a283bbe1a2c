"""Point-light shadow cubemaps (reference twin: the point-shadow half of
bevy_pbr/src/render/light.rs — six 90° depth views per shadow-casting
point light, sampled by face during shading).

TPU form: the six faces are six perspective depth-only raster passes
into one (6, size, size) array. The shade pass never gathers per-pixel
view-projection matrices — each pixel picks its face as the argmax of
dot(light→fragment, face_forward) over a static (6,3) basis table, and
screen coords come from the analytic 90°-fov mapping x/z, y/z in that
face's (right, up, forward) frame. Depth comparison stays in reverse-z
(near/z) exactly like the raster pass, so acne behavior matches the
spot/directional paths. The binned deferred kernel masks the light out
(PointLight.shadows=1); this plugin adds its full GGX contribution.
Requires Mesh3dPlugin(deferred=True) + DeferredLightingPlugin."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from bevy_tpu.app.main_schedule import Render
from bevy_tpu.app.plugin import Plugin
from bevy_tpu.ecs.query import Query, Read, ResMut
from bevy_tpu.ecs.system import system
from bevy_tpu.math.affine import TRS, trs_to_mat4
from bevy_tpu.render.camera import (
    Camera3d, perspective_infinite_reverse, pick_camera, view_matrix,
)
from bevy_tpu.render.deferred import PointLight
from bevy_tpu.render.mesh3d import Mesh3d, MeshMaterial
from bevy_tpu.render.plugin import (
    CLEAR_SET, PASS_SET, SHADE_SET, RenderTarget,
)
from bevy_tpu.render.spot_shadow import ggx_light
from bevy_tpu.transform import GlobalTransform

# Per-face orthonormal camera frames (right, up, forward), chosen so
# right x up = -forward (camera looks down -z in view space).
_FWD = np.asarray([[1, 0, 0], [-1, 0, 0], [0, 1, 0],
                   [0, -1, 0], [0, 0, 1], [0, 0, -1]], np.float32)
_UP = np.asarray([[0, 1, 0], [0, 1, 0], [0, 0, 1],
                  [0, 0, -1], [0, 1, 0], [0, 1, 0]], np.float32)
_RIGHT = np.asarray([[0, 0, 1], [0, 0, -1], [1, 0, 0],
                     [1, 0, 0], [-1, 0, 0], [1, 0, 0]], np.float32)


def _face_view(face: int, lpos):
    """World→view matrix for one cube face at light position `lpos`."""
    r, u, f = (jnp.asarray(v[face]) for v in (_RIGHT, _UP, _FWD))
    rot = jnp.stack([r, u, -f])                  # rows
    t = -rot @ lpos
    return jnp.concatenate([
        jnp.concatenate([rot, t[:, None]], 1),
        jnp.asarray([[0.0, 0.0, 0.0, 1.0]])], 0)


def _pick_shadow_point(plight):
    sel = plight.mask & (plight.point_light.shadows > 0)
    idx = jnp.argmax(sel)
    return idx, jnp.any(sel)


@system(name="clear_point_shadow")
def clear_point_shadow(target=ResMut(RenderTarget.RESOURCE)):
    target.point_shadow_depth = jnp.zeros_like(target.point_shadow_depth)


class PointShadowPlugin(Plugin):
    """Cubemap + shaded contribution for the first PointLight with
    shadows=1 (ref: point_light_shadow_map + shadow sampling in
    bevy_pbr shadows.wesl)."""

    def __init__(self, mesh_plugin, size=256, near=0.05, bias=2e-3,
                 backend="auto"):
        self.mesh_plugin = mesh_plugin
        self.size = size
        self.near = near
        self.bias = bias
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
        size, near, bias = self.size, self.near, self.bias
        mesh_plugin = self.mesh_plugin
        store = app.world.state["res"][RenderTarget.RESOURCE]
        store["point_shadow_depth"] = jnp.zeros((6, size, size), jnp.float32)
        app.world.structure_version += 1

        class _Stats:
            pair_overflow = jnp.zeros((), jnp.int32)
            tile_overflow = jnp.zeros((), jnp.int32)

        class _Target:
            pass

        proj = perspective_infinite_reverse(
            jnp.asarray(np.pi / 2), 1.0, jnp.asarray(near))

        @system(name="point_shadow_pass")
        def point_shadow_pass(q=Query(Read(Mesh3d), Read(MeshMaterial),
                                      Read(GlobalTransform)),
                              plight=Query(Read(PointLight),
                                           Read(GlobalTransform)),
                              target=ResMut(RenderTarget.RESOURCE)):
            li, has = _pick_shadow_point(plight)
            lpos = plight.global_transform.translation[li]
            faces = []
            for face in range(6):
                lvp = proj @ _face_view(face, lpos)
                t = _Target()
                t.color = jnp.zeros((4, size, size), jnp.float32)
                t.depth = target.point_shadow_depth[face]
                st = _Stats()
                for grp in (mesh_plugin._groups or []):
                    m = mesh_plugin.pool.meshes[grp["mesh"]]
                    vc = m.num_vertices
                    rows = jnp.asarray(grp["rows"])
                    gt_r = q.global_transform.rotation[rows]
                    mats = trs_to_mat4(TRS(
                        translation=q.global_transform.translation[rows],
                        rotation=gt_r,
                        scale=q.global_transform.scale[rows]))
                    mvp = jnp.einsum("ij,njk->nik", lvp, mats)
                    ph = jnp.concatenate(
                        [jnp.asarray(m.positions),
                         jnp.ones((vc, 1), jnp.float32)], 1)
                    clip = jnp.einsum("nij,vj->nvi", mvp, ph)
                    from bevy_tpu.math.quat import quat_rotate_vec3
                    nrm = quat_rotate_vec3(gt_r[:, None, :],
                                           jnp.asarray(m.normals)[None])
                    raster_batched(
                        clip, nrm, m.triangles, q.mask[rows] & has,
                        q.mesh_material.base_color[rows],
                        q.mesh_material.emissive[rows],
                        jnp.zeros(16, jnp.float32), t, st,
                        depth_only=True, width=size, height=size,
                        interpret=interpret)
                faces.append(t.depth)
            target.point_shadow_depth = jnp.stack(faces)

        @system(name="point_shadow_shade")
        def point_shadow_shade(cam=Query(Read(Camera3d),
                                         Read(GlobalTransform)),
                               plight=Query(Read(PointLight),
                                            Read(GlobalTransform)),
                               target=ResMut(RenderTarget.RESOURCE)):
            li, has = _pick_shadow_point(plight)
            c = target.color
            g = target.gbuffer
            ci, has_cam = pick_camera(cam.mask)
            cam_gt = cam.global_transform
            view = view_matrix(cam_gt.translation[ci], cam_gt.rotation[ci],
                               cam_gt.scale[ci])
            cproj = perspective_infinite_reverse(
                cam.camera3d.fov[ci], width / height, cam.camera3d.near[ci])
            inv_vp = jnp.linalg.inv(cproj @ view)
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
            lpos = plight.global_transform.translation[li]
            to_frag = world - lpos[None, None, :]       # light → fragment
            d2 = jnp.sum(to_frag * to_frag, -1)
            inv_d = jax.lax.rsqrt(jnp.maximum(d2, 1e-9))
            ldir = -to_frag * inv_d[..., None]          # toward the light
            rng = plight.point_light.range[li]
            win = jnp.clip(1.0 - (d2 / jnp.maximum(rng * rng, 1e-9)) ** 2,
                           0.0, 1.0)
            atten = win * win / (d2 + 1.0)
            # face pick + analytic 90° projection in that face's frame
            fwd = jnp.asarray(_FWD)
            scores = jnp.einsum("hwj,fj->hwf", to_frag, fwd)
            face = jnp.argmax(scores, -1)
            r = jnp.asarray(_RIGHT)[face]
            u = jnp.asarray(_UP)[face]
            zf = jnp.max(scores, -1)                    # dot(to_frag, fwd)
            zf = jnp.maximum(zf, 1e-6)
            sx = jnp.sum(to_frag * r, -1) / zf
            sy = jnp.sum(to_frag * u, -1) / zf
            ix = jnp.clip(((sx * 0.5 + 0.5) * size).astype(jnp.int32),
                          0, size - 1)
            iy = jnp.clip(((0.5 - sy * 0.5) * size).astype(jnp.int32),
                          0, size - 1)
            lz = near / zf                              # reverse-z depth
            occ = target.point_shadow_depth[face, iy, ix]
            lit = (occ <= lz + bias).astype(jnp.float32)
            albedo = jnp.moveaxis(g[0:3], 0, -1)
            n = jnp.moveaxis(g[4:7], 0, -1)
            vdir = cam_gt.translation[ci][None, None, :] - world
            vdir = vdir * jax.lax.rsqrt(jnp.maximum(
                jnp.sum(vdir * vdir, -1, keepdims=True), 1e-9))
            lcol = (plight.point_light.color[li] *
                    plight.point_light.intensity[li])[None, None, :] * \
                (atten * lit)[..., None]
            add = ggx_light(albedo, n, g[10], g[11], vdir, ldir, lcol,
                            cc=g[12], ccr=g[13])
            geom = (z > 0) & has & has_cam
            rgb = jnp.where(geom[None],
                            c[:3] + jnp.moveaxis(add, -1, 0), c[:3])
            target.color = jnp.concatenate([rgb, c[3:4]], 0)

        app.add_systems(Render, clear_point_shadow, in_set=CLEAR_SET)
        app.add_systems(Render, point_shadow_pass, in_set=PASS_SET,
                        before="mesh_pass")
        app.add_systems(Render, point_shadow_shade, in_set=SHADE_SET,
                        after="deferred_shade")
