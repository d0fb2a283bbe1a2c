"""Contact shadows (reference twin: bevy_pbr's screen-space contact
shadows — a short depth-buffer raymarch toward the light that catches
the small-scale occlusion shadow maps miss).

TPU form: N lockstep steps along the light direction per pixel; if any
step's projected depth is occluded by the buffer within a thickness
tolerance, the pixel's direct light attenuates. Runs on the deferred
targets before/alongside the shade (we darken color post-shade, scaled
by how much of it is direct light — an approximation noted for parity
review)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from bevy_tpu.app.main_schedule import Render
from bevy_tpu.app.plugin import Plugin
from bevy_tpu.ecs.query import Query, Read, ResMut
from bevy_tpu.ecs.system import system
from bevy_tpu.math.quat import quat_rotate_vec3
from bevy_tpu.render.camera import (
    Camera3d, perspective_infinite_reverse, pick_camera, view_matrix,
)
from bevy_tpu.render.mesh3d import DirectionalLight
from bevy_tpu.render.plugin import SHADE_SET, RenderTarget
from bevy_tpu.transform import GlobalTransform


class ContactShadowsPlugin(Plugin):
    def __init__(self, steps=8, length=0.6, thickness=0.15, strength=0.7,
                 near=0.1):
        self.steps = steps
        self.length = length
        self.thickness = thickness
        self.strength = strength
        self.near = near

    def build(self, app):
        steps, length = self.steps, self.length
        thickness, strength, near = self.thickness, self.strength, self.near

        @system(name="contact_shadows_pass")
        def contact_shadows(target=ResMut(RenderTarget.RESOURCE),
                            cam=Query(Read(Camera3d), Read(GlobalTransform)),
                            light=Query(Read(DirectionalLight),
                                        Read(GlobalTransform))):
            c = target.color
            z = target.depth
            h, w = z.shape
            ci, has_cam = pick_camera(cam.mask)
            cam_gt = cam.global_transform
            view = view_matrix(cam_gt.translation[ci], cam_gt.rotation[ci],
                               cam_gt.scale[ci])
            proj = perspective_infinite_reverse(
                cam.camera3d.fov[ci], w / h, cam.camera3d.near[ci])
            vp = proj @ view
            inv_vp = jnp.linalg.inv(vp)
            ys = 1.0 - 2.0 * (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
            xs = 2.0 * (jnp.arange(w, dtype=jnp.float32) + 0.5) / w - 1.0
            ndc = jnp.stack([jnp.broadcast_to(xs[None, :], z.shape),
                             jnp.broadcast_to(ys[:, None], z.shape), z,
                             jnp.ones_like(z)], -1)
            wh4 = jnp.einsum("ij,hwj->hwi", inv_vp, ndc)
            world = wh4[..., :3] / jnp.where(jnp.abs(wh4[..., 3:4]) > 1e-9,
                                             wh4[..., 3:4], 1.0)
            li, has_l = pick_camera(light.mask)
            ldir = quat_rotate_vec3(light.global_transform.rotation[li],
                                    jnp.asarray([0.0, 0.0, -1.0]))
            to_light = -ldir
            occluded = jnp.zeros(z.shape, bool)
            for s in range(1, steps + 1):
                p = world + to_light[None, None, :] * (length * s / steps)
                ph = jnp.concatenate([p, jnp.ones(z.shape + (1,),
                                                  jnp.float32)], -1)
                cl = jnp.einsum("ij,hwj->hwi", vp, ph)
                cw = jnp.where(jnp.abs(cl[..., 3]) > 1e-8, cl[..., 3], 1.0)
                sx = (cl[..., 0] / cw * 0.5 + 0.5) * w
                sy = (0.5 - cl[..., 1] / cw * 0.5) * h
                ray_z = cl[..., 2] / cw
                ix = jnp.clip(sx.astype(jnp.int32), 0, w - 1)
                iy = jnp.clip(sy.astype(jnp.int32), 0, h - 1)
                buf_z = z[iy, ix]
                inb = (sx >= 0) & (sx < w) & (sy >= 0) & (sy < h)
                dv_ray = near / jnp.maximum(ray_z, 1e-6)
                dv_buf = near / jnp.maximum(buf_z, 1e-6)
                occluded = occluded | (
                    (buf_z > ray_z) & (dv_ray - dv_buf < thickness) &
                    (buf_z > 0) & inb)
            factor = jnp.where(occluded & (z > 0) & has_cam & (has_l > 0),
                               1.0 - strength, 1.0)
            target.color = jnp.concatenate(
                [c[:3] * factor[None], c[3:4]], 0)

        app.add_systems(Render, contact_shadows, in_set=SHADE_SET,
                        after="deferred_shade")
