"""Screen-space reflections (reference twin: bevy_pbr/src/ssr — a
raymarch against the depth buffer in the deferred path, blended by
fresnel and roughness).

TPU form: a fixed-step XLA march — every pixel advances its reflected
ray in lockstep (the vectorized equivalent of the per-pixel loop in
ssr.wesl), sampling the (packed) reverse-z depth each step; the first
step whose ray depth falls behind the buffer is the hit. Requires the
deferred G-buffer; runs after the shade so the color buffer holds the
lit scene to reflect."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from bevy_tpu.app.main_schedule import Render
from bevy_tpu.app.plugin import Plugin
from bevy_tpu.ecs.query import Query, Read, ResMut
from bevy_tpu.ecs.system import system
from bevy_tpu.render.camera import (
    Camera3d, perspective_infinite_reverse, pick_camera, view_matrix,
)
from bevy_tpu.render.plugin import SHADE_SET, RenderTarget
from bevy_tpu.transform import GlobalTransform


class SsrPlugin(Plugin):
    """ref: ScreenSpaceReflections component — global here. `steps` is
    the march length; `max_roughness` gates which surfaces reflect."""

    def __init__(self, steps=24, stride=6.0, thickness=0.35,
                 max_roughness=0.4, intensity=1.0):
        self.steps = steps
        self.stride = stride
        self.thickness = thickness
        self.max_roughness = max_roughness
        self.intensity = intensity

    def build(self, app):
        steps, stride = self.steps, self.stride
        thickness, max_rough = self.thickness, self.max_roughness
        inten = self.intensity

        @system(name="ssr_pass")
        def ssr_pass(target=ResMut(RenderTarget.RESOURCE),
                     cam=Query(Read(Camera3d), Read(GlobalTransform))):
            c = target.color
            g = target.gbuffer
            z = target.depth
            h, w = z.shape
            ci, has_cam = pick_camera(cam.mask)
            cam_gt = cam.global_transform
            view = view_matrix(cam_gt.translation[ci], cam_gt.rotation[ci],
                               cam_gt.scale[ci])
            near = cam.camera3d.near[ci]
            proj = perspective_infinite_reverse(cam.camera3d.fov[ci],
                                                w / h, near)
            vp = proj @ view
            inv_vp = jnp.linalg.inv(vp)
            # world position per pixel
            ys = 1.0 - 2.0 * (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
            xs = 2.0 * (jnp.arange(w, dtype=jnp.float32) + 0.5) / w - 1.0
            ndc = jnp.stack([jnp.broadcast_to(xs[None, :], z.shape),
                             jnp.broadcast_to(ys[:, None], z.shape), z,
                             jnp.ones_like(z)], -1)
            wh = jnp.einsum("ij,hwj->hwi", inv_vp, ndc)
            world = wh[..., :3] / jnp.where(jnp.abs(wh[..., 3:4]) > 1e-9,
                                            wh[..., 3:4], 1.0)
            n = jnp.moveaxis(g[4:7], 0, -1)
            vdir = world - cam_gt.translation[ci][None, None, :]
            vdir = vdir * jax.lax.rsqrt(jnp.maximum(
                jnp.sum(vdir * vdir, -1, keepdims=True), 1e-9))
            refl = vdir - 2.0 * jnp.sum(vdir * n, -1, keepdims=True) * n
            rough = g[11]
            metallic = g[10]
            albedo = jnp.moveaxis(g[0:3], 0, -1)
            eligible = (z > 0) & (rough < max_rough) & has_cam

            # lockstep march: world-space steps projected each iteration
            hit_uvx = jnp.zeros(z.shape, jnp.float32)
            hit_uvy = jnp.zeros(z.shape, jnp.float32)
            hit = jnp.zeros(z.shape, bool)
            for s in range(1, steps + 1):
                p = world + refl * (stride * s)
                ph = jnp.concatenate([p, jnp.ones(z.shape + (1,),
                                                  jnp.float32)], -1)
                cl = jnp.einsum("ij,hwj->hwi", vp, ph)
                cw = jnp.where(jnp.abs(cl[..., 3]) > 1e-8, cl[..., 3], 1.0)
                sx = (cl[..., 0] / cw * 0.5 + 0.5) * w
                sy = (0.5 - cl[..., 1] / cw * 0.5) * h
                ray_z = cl[..., 2] / cw                 # reverse-z
                ix = jnp.clip(sx.astype(jnp.int32), 0, w - 1)
                iy = jnp.clip(sy.astype(jnp.int32), 0, h - 1)
                buf_z = z[iy, ix]
                inb = (sx >= 0) & (sx < w) & (sy >= 0) & (sy < h) & \
                    (cl[..., 3] > 0)
                # hit: the buffer surface is nearer than the ray point,
                # but within `thickness` (in view-depth units)
                dv_ray = near / jnp.maximum(ray_z, 1e-6)
                dv_buf = near / jnp.maximum(buf_z, 1e-6)
                crossed = (buf_z > ray_z) & (dv_ray - dv_buf < thickness) \
                    & (buf_z > 0) & inb
                new = crossed & ~hit
                hit_uvx = jnp.where(new, ix.astype(jnp.float32), hit_uvx)
                hit_uvy = jnp.where(new, iy.astype(jnp.float32), hit_uvy)
                hit = hit | crossed
            hx = hit_uvx.astype(jnp.int32)
            hy = hit_uvy.astype(jnp.int32)
            refl_col = jnp.stack([c[0][hy, hx], c[1][hy, hx],
                                  c[2][hy, hx]], -1)
            tint = jnp.moveaxis(g[19:22], 0, -1) if g.shape[0] >= 22 \
                else 1.0      # ref: specular_tint modulates dielectric F0
            f0 = 0.04 * tint * (1.0 - metallic[..., None]) + \
                albedo * metallic[..., None]
            nov = jnp.maximum(-jnp.sum(vdir * n, -1), 0.0)
            fres = f0 + (1.0 - f0) * ((1.0 - nov[..., None]) ** 5)
            wgt = jnp.where((hit & eligible)[..., None],
                            fres * (1.0 - rough[..., None] / max_rough) *
                            inten, 0.0)
            out = jnp.moveaxis(c[:3], 0, -1) * (1.0 - wgt) + refl_col * wgt
            target.color = jnp.concatenate(
                [jnp.moveaxis(out, -1, 0), c[3:4]], 0)

        app.add_systems(Render, ssr_pass, in_set=SHADE_SET,
                        after="deferred_shade")
