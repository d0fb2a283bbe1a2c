"""Irradiance volumes (reference twin: bevy_pbr's light-probe
irradiance volumes — `bevy_pbr/src/light_probe/irradiance_volume.rs`:
a 3D grid of ambient cubes adding baked diffuse indirect light by
world position; the voxel format is the same ±x/±y/±z ambient cube).

TPU form: one XLA pass over the deferred G-buffer — world positions
reconstruct from depth, the grid trilinearly interpolates (8 corner
gathers), and the six axis colors blend by the squared world normal
(the ambient-cube basis). Requires Mesh3dPlugin(deferred=True)."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from bevy_tpu.app.main_schedule import Render
from bevy_tpu.app.plugin import Plugin
from bevy_tpu.ecs.query import Query, Read, ResMut
from bevy_tpu.ecs.system import system
from bevy_tpu.render.camera import (
    Camera3d, perspective_infinite_reverse, pick_camera, view_matrix,
)
from bevy_tpu.render.plugin import SHADE_SET, RenderTarget
from bevy_tpu.transform import GlobalTransform


def _trilinear_cube(volume, u, v, w):
    """volume (nx, ny, nz, 6, 3); u/v/w (H, W) in [0, n-1] texel space.
    Returns (H, W, 6, 3)."""
    nx, ny, nz = volume.shape[:3]
    i0 = jnp.clip(jnp.floor(u).astype(jnp.int32), 0, nx - 1)
    j0 = jnp.clip(jnp.floor(v).astype(jnp.int32), 0, ny - 1)
    k0 = jnp.clip(jnp.floor(w).astype(jnp.int32), 0, nz - 1)
    i1 = jnp.minimum(i0 + 1, nx - 1)
    j1 = jnp.minimum(j0 + 1, ny - 1)
    k1 = jnp.minimum(k0 + 1, nz - 1)
    fu = jnp.clip(u - i0, 0.0, 1.0)[..., None, None]
    fv = jnp.clip(v - j0, 0.0, 1.0)[..., None, None]
    fw = jnp.clip(w - k0, 0.0, 1.0)[..., None, None]
    flat = volume.reshape(nx * ny * nz, 6, 3)

    def at(i, j, k):
        return flat[(i * ny + j) * nz + k]

    c000, c100 = at(i0, j0, k0), at(i1, j0, k0)
    c010, c110 = at(i0, j1, k0), at(i1, j1, k0)
    c001, c101 = at(i0, j0, k1), at(i1, j0, k1)
    c011, c111 = at(i0, j1, k1), at(i1, j1, k1)
    c00 = c000 * (1 - fu) + c100 * fu
    c10 = c010 * (1 - fu) + c110 * fu
    c01 = c001 * (1 - fu) + c101 * fu
    c11 = c011 * (1 - fu) + c111 * fu
    c0 = c00 * (1 - fv) + c10 * fv
    c1 = c01 * (1 - fv) + c11 * fv
    return c0 * (1 - fw) + c1 * fw


class IrradianceVolumePlugin(Plugin):
    """Adds a baked diffuse-irradiance grid over the deferred result.

    volume: (nx, ny, nz, 6, 3) float ambient-cube colors, axis order
    [+x, -x, +y, -y, +z, -z]; min_corner/max_corner: the world AABB the
    grid spans (voxel centers at the usual half-texel insets);
    intensity scales the contribution (ref: IrradianceVolume
    { voxels, intensity })."""

    def __init__(self, volume, min_corner, max_corner, intensity=1.0):
        self.volume = np.asarray(volume, np.float32)
        assert self.volume.ndim == 5 and self.volume.shape[3:] == (6, 3)
        self.min_corner = np.asarray(min_corner, np.float32)
        self.max_corner = np.asarray(max_corner, np.float32)
        self.intensity = float(intensity)

    def build(self, app):
        vol = jnp.asarray(self.volume)
        lo = jnp.asarray(self.min_corner)
        span = jnp.asarray(np.maximum(
            self.max_corner - self.min_corner, 1e-6))
        inten = self.intensity
        nx, ny, nz = self.volume.shape[:3]

        @system(name="irradiance_volume_pass")
        def irradiance_pass(target=ResMut(RenderTarget.RESOURCE),
                            cam=Query(Read(Camera3d),
                                      Read(GlobalTransform))):
            g = target.gbuffer
            c = target.color
            z = target.depth
            _, h, w = c.shape
            ci, has_cam = pick_camera(cam.mask)
            gt = cam.global_transform
            view = view_matrix(gt.translation[ci], gt.rotation[ci],
                               gt.scale[ci])
            proj = perspective_infinite_reverse(
                cam.camera3d.fov[ci], w / h, cam.camera3d.near[ci])
            inv_vp = jnp.linalg.inv(proj @ view)
            ys = (jnp.arange(h, dtype=jnp.float32) + 0.5)[:, None]
            xs = (jnp.arange(w, dtype=jnp.float32) + 0.5)[None, :]
            ndc = jnp.stack(
                [jnp.broadcast_to(2.0 * xs / w - 1.0, z.shape),
                 jnp.broadcast_to(1.0 - 2.0 * ys / h, z.shape),
                 z, jnp.ones_like(z)], -1)
            wh = jnp.einsum("ij,hwj->hwi", inv_vp, ndc)
            wp = wh[..., :3] / jnp.where(jnp.abs(wh[..., 3:4]) > 1e-9,
                                         wh[..., 3:4], 1.0)

            # normalized grid coords; pixels outside the AABB take none
            t = (wp - lo) / span
            inside = jnp.all((t >= 0.0) & (t <= 1.0), -1) & \
                (z > 0.0) & has_cam
            cube = _trilinear_cube(vol, t[..., 0] * (nx - 1),
                                   t[..., 1] * (ny - 1),
                                   t[..., 2] * (nz - 1))  # (H, W, 6, 3)
            n = jnp.moveaxis(g[4:7], 0, -1)
            w2 = n * n                                     # (H, W, 3)
            pos = (n > 0.0).astype(jnp.float32)
            # ambient cube: per-axis pick +/- face, weight by n_i^2
            irr = (cube[..., 0, :] * (w2[..., 0:1] * pos[..., 0:1]) +
                   cube[..., 1, :] * (w2[..., 0:1] * (1 - pos[..., 0:1])) +
                   cube[..., 2, :] * (w2[..., 1:2] * pos[..., 1:2]) +
                   cube[..., 3, :] * (w2[..., 1:2] * (1 - pos[..., 1:2])) +
                   cube[..., 4, :] * (w2[..., 2:3] * pos[..., 2:3]) +
                   cube[..., 5, :] * (w2[..., 2:3] * (1 - pos[..., 2:3])))
            albedo = jnp.moveaxis(g[0:3], 0, -1)
            metallic = g[10]
            add = albedo * (1.0 - metallic[..., None]) * irr * inten
            rgb = jnp.where(inside[None],
                            c[:3] + jnp.moveaxis(add, -1, 0), c[:3])
            target.color = jnp.concatenate([rgb, c[3:4]], 0)

        app.add_systems(Render, irradiance_pass, in_set=SHADE_SET,
                        after="deferred_shade")
