"""Decals (reference twin: bevy_pbr's clustered decals — `src/decal/`:
box projectors that stamp a texture/color onto whatever G-buffer
surface they intersect).

TPU form: decals are entities with a `Decal` component; one XLA pass
after the geometry reconstructs world positions from the depth buffer,
transforms them into each decal's unit-box space, and blends the decal
color (optionally an atlas texture via its uv rect) into the G-buffer
albedo before shading. Decal counts are expected small (the reference
clusters them; a vectorized all-pixels x all-decals pass is fine for
dozens)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from bevy_tpu.app.main_schedule import Render
from bevy_tpu.app.plugin import Plugin
from bevy_tpu.ecs.component import component, field
from bevy_tpu.ecs.query import Query, Read, ResMut
from bevy_tpu.ecs.system import system
from bevy_tpu.math.quat import quat_conjugate, quat_rotate_vec3
from bevy_tpu.render.camera import (
    Camera3d, perspective_infinite_reverse, pick_camera, view_matrix,
)
from bevy_tpu.render.plugin import PASS_SET, RenderTarget
from bevy_tpu.transform import GlobalTransform


@component
class Decal:
    """A box projector (entity's transform = the box): color multiplies
    into the surface albedo inside the unit box (ref: ClusteredDecal)."""
    color = field(4, default=(1.0, 1.0, 1.0, 1.0))
    uv_min = field(2)         # optional atlas rect (equal = untextured)
    uv_max = field(2)


class DecalPlugin(Plugin):
    """ref: the decal half of bevy_pbr. Requires the deferred G-buffer;
    runs after the mesh pass, before shading."""

    def __init__(self, near=0.1, atlas=None):
        self.near = near
        self.atlas = atlas

    def build(self, app):
        near = self.near
        atlas = None if self.atlas is None else jnp.asarray(self.atlas)

        @system(name="decal_pass")
        def decal_pass(target=ResMut(RenderTarget.RESOURCE),
                       decals=Query(Read(Decal), Read(GlobalTransform)),
                       cam=Query(Read(Camera3d), Read(GlobalTransform))):
            g = target.gbuffer
            z = target.depth
            h, w = z.shape
            ci, has_cam = pick_camera(cam.mask)
            cam_gt = cam.global_transform
            view = view_matrix(cam_gt.translation[ci], cam_gt.rotation[ci],
                               cam_gt.scale[ci])
            proj = perspective_infinite_reverse(
                cam.camera3d.fov[ci], w / h, cam.camera3d.near[ci])
            inv_vp = jnp.linalg.inv(proj @ view)
            ys = 1.0 - 2.0 * (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
            xs = 2.0 * (jnp.arange(w, dtype=jnp.float32) + 0.5) / w - 1.0
            ndc = jnp.stack([jnp.broadcast_to(xs[None, :], z.shape),
                             jnp.broadcast_to(ys[:, None], z.shape), z,
                             jnp.ones_like(z)], -1)
            wh4 = jnp.einsum("ij,hwj->hwi", inv_vp, ndc)
            world = wh4[..., :3] / jnp.where(jnp.abs(wh4[..., 3:4]) > 1e-9,
                                             wh4[..., 3:4], 1.0)
            albedo = jnp.moveaxis(g[0:4], 0, -1)          # (H, W, 4)
            geom = (z > 0) & has_cam
            n = decals.mask.shape[0]
            gt = decals.global_transform
            inv_rot = quat_conjugate(gt.rotation)              # (N, 4)
            for i in range(min(n, 64)):                   # small counts
                local = quat_rotate_vec3(
                    inv_rot[i][None, None, :],
                    world - gt.translation[i][None, None, :])
                local = local / jnp.maximum(gt.scale[i][None, None, :],
                                            1e-6)
                inside = (jnp.max(jnp.abs(local), -1) <= 0.5) & geom & \
                    decals.mask[i]
                col = decals.decal.color[i]
                if atlas is not None:
                    u0 = decals.decal.uv_min[i]
                    u1 = decals.decal.uv_max[i]
                    textured = u1[0] > u0[0]
                    uv = jnp.stack(
                        [u0[0] + (local[..., 0] + 0.5) * (u1[0] - u0[0]),
                         u0[1] + (0.5 - local[..., 2]) * (u1[1] - u0[1])],
                        -1)
                    from bevy_tpu.ops.raster3d_visbuf import sample_atlas
                    tex = sample_atlas(atlas, uv)
                    dcol = jnp.where(textured, col[None, None] * tex,
                                     jnp.broadcast_to(col, tex.shape))
                else:
                    dcol = jnp.broadcast_to(col[None, None],
                                            albedo.shape[:2] + (4,))
                a = dcol[..., 3] * inside.astype(jnp.float32)
                albedo = jnp.concatenate([
                    albedo[..., :3] * (1 - a[..., None]) +
                    dcol[..., :3] * a[..., None], albedo[..., 3:4]], -1)
            target.gbuffer = jnp.concatenate(
                [jnp.moveaxis(albedo, -1, 0), g[4:]], 0)

        app.add_systems(Render, decal_pass, in_set=PASS_SET,
                        after="mesh_pass")
