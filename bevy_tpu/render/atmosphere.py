"""Physically-based atmosphere (reference twin: bevy_pbr's atmosphere —
`src/atmosphere/`: Rayleigh + Mie single scattering driving the sky).

TPU form: a small fixed-sample single-scattering integral evaluated per
background pixel in XLA (the reference precomputes LUTs with compute
shaders; at one ray per pixel and 8 samples the direct integral is
cheap enough to skip the LUT stage). Sun direction comes from the first
DirectionalLight; writes background (depth == 0) before tonemapping."""

from __future__ import annotations

import jax.numpy as jnp

from bevy_tpu.app.main_schedule import Render
from bevy_tpu.app.plugin import Plugin
from bevy_tpu.ecs.query import Query, Read, ResMut
from bevy_tpu.ecs.system import system
from bevy_tpu.math.quat import quat_rotate_vec3
from bevy_tpu.render.camera import Camera3d, pick_camera
from bevy_tpu.render.mesh3d import DirectionalLight
from bevy_tpu.render.plugin import POST_SET, RenderTarget
from bevy_tpu.render.skybox import view_rays
from bevy_tpu.transform import GlobalTransform

# per-meter scattering coefficients (standard earth values)
RAYLEIGH = jnp.asarray([5.802e-6, 13.558e-6, 33.1e-6])
MIE = 3.996e-6
PLANET_R = 6_360e3
ATMO_R = 6_460e3
H_RAYLEIGH = 8_000.0
H_MIE = 1_200.0


def _ray_sphere_exit(o_y, d_y, radius):
    """Distance to the atmosphere shell along (0, o_y, 0) + t*d for a
    vertical-offset-only origin (flat-horizon approximation)."""
    b = o_y * d_y
    c = o_y * o_y - radius * radius
    disc = jnp.maximum(b * b - c, 0.0)
    return jnp.maximum(-b + jnp.sqrt(disc), 0.0)


def sky_radiance(rays, sun_dir, sun_intensity=20.0, samples=8,
                 altitude=500.0):
    """(3, H, W) single-scattered radiance (ref: the sky-view LUT math
    of atmosphere/functions.wesl, collapsed to a direct integral)."""
    d = jnp.moveaxis(rays, 0, -1)                  # (H, W, 3)
    o_y = PLANET_R + altitude
    # clamp downward rays to the horizon glow
    dy = jnp.maximum(d[..., 1], 0.015)
    dist = _ray_sphere_exit(o_y, dy, ATMO_R)
    mu = -jnp.sum(d * sun_dir[None, None, :], -1)  # cos(view, sun)
    # phases
    ph_r = 3.0 / (16.0 * jnp.pi) * (1.0 + mu * mu)
    g = 0.8
    ph_m = 3.0 / (8.0 * jnp.pi) * ((1.0 - g * g) * (1.0 + mu * mu)) / \
        ((2.0 + g * g) * jnp.maximum(
            (1.0 + g * g - 2.0 * g * mu) ** 1.5, 1e-4))
    sun_up = jnp.maximum(-sun_dir[1], 0.0)
    # sun transmittance: flat-atmosphere Chapman approximation — optical
    # depth along the sun path ≈ β * H * density(h) / cos(zenith)
    inv_cos_sun = 1.0 / jnp.maximum(sun_up, 0.02)
    acc_r = jnp.zeros(d.shape[:2] + (3,))
    acc_m = jnp.zeros(d.shape[:2])
    od_r = jnp.zeros(d.shape[:2] + (3,))
    od_m = jnp.zeros(d.shape[:2])
    dt = dist / samples
    for s in range(samples):
        t = dt * (s + 0.5)
        h = jnp.sqrt(o_y * o_y + t * t + 2.0 * o_y * t * dy) - PLANET_R
        dens_r = jnp.exp(-jnp.maximum(h, 0.0) / H_RAYLEIGH)
        dens_m = jnp.exp(-jnp.maximum(h, 0.0) / H_MIE)
        od_r = od_r + RAYLEIGH[None, None] * (dens_r * dt)[..., None]
        od_m = od_m + MIE * dens_m * dt
        sun_od = (RAYLEIGH[None, None] * H_RAYLEIGH *
                  (dens_r * inv_cos_sun)[..., None] +
                  (MIE * H_MIE * dens_m * inv_cos_sun)[..., None])
        trans = jnp.exp(-(od_r + od_m[..., None] + sun_od))
        acc_r = acc_r + trans * (dens_r * dt)[..., None]
        acc_m = acc_m + jnp.mean(trans, -1) * dens_m * dt
    rgb = sun_intensity * (acc_r * RAYLEIGH[None, None] * ph_r[..., None] +
                           (acc_m * MIE * ph_m)[..., None])
    # sun disc through the final transmittance
    disc = jnp.clip((mu - 0.9995) / 0.0002, 0.0, 1.0)
    rgb = rgb + (sun_intensity * disc)[..., None] * \
        jnp.exp(-(od_r + od_m[..., None]))
    return jnp.moveaxis(rgb, -1, 0)


class AtmospherePlugin(Plugin):
    """ref: the Atmosphere component — global here; pairs naturally with
    TonemappingPlugin (radiance is HDR)."""

    def __init__(self, sun_intensity=20.0, samples=8, altitude=500.0):
        self.sun_intensity = sun_intensity
        self.samples = samples
        self.altitude = altitude

    def build(self, app):
        inten, samples, alt = self.sun_intensity, self.samples, self.altitude

        @system(name="atmosphere_pass")
        def atmosphere_pass(target=ResMut(RenderTarget.RESOURCE),
                            cam=Query(Read(Camera3d), Read(GlobalTransform)),
                            light=Query(Read(DirectionalLight),
                                        Read(GlobalTransform))):
            c = target.color
            _, h, w = c.shape
            ci, has_cam = pick_camera(cam.mask)
            rays = view_rays(cam.global_transform.rotation[ci],
                             cam.camera3d.fov[ci], w / h, h, w)
            li, _ = pick_camera(light.mask)
            sun_dir = quat_rotate_vec3(light.global_transform.rotation[li],
                                       jnp.asarray([0.0, 0.0, -1.0]))
            sky = sky_radiance(rays, sun_dir, inten, samples, alt)
            bg = (target.depth <= 0.0) & has_cam
            rgb = jnp.where(bg[None], sky, c[:3])
            target.color = jnp.concatenate([rgb, c[3:4]], 0)

        app.add_systems(Render, atmosphere_pass, in_set=POST_SET,
                        before="tonemap_pass")
