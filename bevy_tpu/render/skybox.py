"""Skybox (reference twin: bevy_core_pipeline/src/skybox — a cubemap
drawn behind everything in the main pass; plus the gradient/sun flavor
of bevy_pbr's atmosphere for the procedural mode).

TPU form: one XLA pass over background pixels (reverse-z depth == 0 ⇒
nothing rasterized there). Per-pixel world-space view rays come from the
camera's inverse view-projection; the sky is either a procedural
horizon/zenith gradient with a sun disc from the first DirectionalLight,
or an equirectangular environment texture sampled by ray direction.
Runs in POST before tonemapping so sky radiance grades with the scene.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from bevy_tpu.app.main_schedule import Render
from bevy_tpu.app.plugin import Plugin
from bevy_tpu.ecs.query import Query, Read, ResMut
from bevy_tpu.ecs.system import system
from bevy_tpu.math.quat import quat_rotate_vec3
from bevy_tpu.render.camera import Camera3d, pick_camera
from bevy_tpu.render.mesh3d import DirectionalLight
from bevy_tpu.render.plugin import POST_SET, RenderTarget
from bevy_tpu.transform import GlobalTransform


def view_rays(cam_rot, fov, aspect, h, w):
    """(3, H, W) unit world-space rays through each pixel center."""
    f = 1.0 / jnp.tan(fov * 0.5)
    xs = ((jnp.arange(w, dtype=jnp.float32) + 0.5) / w * 2.0 - 1.0) * \
        aspect / f
    ys = (1.0 - (jnp.arange(h, dtype=jnp.float32) + 0.5) / h * 2.0) / f
    d = jnp.stack([jnp.broadcast_to(xs[None, :], (h, w)),
                   jnp.broadcast_to(ys[:, None], (h, w)),
                   jnp.full((h, w), -1.0, jnp.float32)], -1)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    world = quat_rotate_vec3(cam_rot[None, None, :], d)
    return jnp.moveaxis(world, -1, 0)


def procedural_sky(rays, sun_dir, horizon, zenith, ground, sun_color,
                   sun_size=0.02):
    """(3, H, W) radiance: horizon→zenith gradient above, ground color
    below, additive sun disc with a soft edge."""
    up = rays[1]
    t = jnp.clip(up, 0.0, 1.0) ** 0.7
    sky = (jnp.asarray(horizon)[:, None, None] * (1.0 - t) +
           jnp.asarray(zenith)[:, None, None] * t)
    below = jnp.asarray(ground)[:, None, None] * jnp.ones_like(sky)
    col = jnp.where(up[None] >= 0.0, sky, below)
    cosang = -(rays[0] * sun_dir[0] + rays[1] * sun_dir[1] +
               rays[2] * sun_dir[2])
    disc = jnp.clip((cosang - (1.0 - sun_size)) / (sun_size * 0.3), 0.0, 1.0)
    return col + jnp.asarray(sun_color)[:, None, None] * disc[None]


def sample_equirect(env, rays):
    """Sample an equirectangular (He, We, 3|4) environment map by ray
    direction (ref: the cubemap fetch of skybox.wesl, lat-long form)."""
    he, we = env.shape[0], env.shape[1]
    u = (jnp.arctan2(rays[0], -rays[2]) / (2.0 * jnp.pi) + 0.5)
    v = 0.5 - jnp.arcsin(jnp.clip(rays[1], -1.0, 1.0)) / jnp.pi
    ix = jnp.clip((u * we).astype(jnp.int32), 0, we - 1)
    iy = jnp.clip((v * he).astype(jnp.int32), 0, he - 1)
    texel = env[iy, ix]                              # (H, W, C)
    return jnp.moveaxis(texel[..., :3], -1, 0)


class SkyboxPlugin(Plugin):
    """Procedural sky (default) or `environment=` equirect image array.
    ref: Skybox component + EnvironmentMapLight's background role."""

    def __init__(self, horizon=(0.35, 0.55, 0.85), zenith=(0.08, 0.18, 0.45),
                 ground=(0.18, 0.15, 0.13), sun_color=(2.5, 2.2, 1.8),
                 sun_size=0.02, environment=None, brightness=1.0):
        self.horizon = horizon
        self.zenith = zenith
        self.ground = ground
        self.sun_color = sun_color
        self.sun_size = sun_size
        self.environment = (None if environment is None
                            else jnp.asarray(np.asarray(environment),
                                             jnp.float32))
        self.brightness = brightness

    def build(self, app):
        horizon, zenith, ground = self.horizon, self.zenith, self.ground
        sun_color, sun_size = self.sun_color, self.sun_size
        env = self.environment
        brightness = self.brightness

        @system(name="skybox_pass")
        def skybox_pass(target=ResMut(RenderTarget.RESOURCE),
                        cam=Query(Read(Camera3d), Read(GlobalTransform)),
                        light=Query(Read(DirectionalLight),
                                    Read(GlobalTransform))):
            c = target.color
            _, h, w = c.shape
            ci, has_cam = pick_camera(cam.mask)
            rays = view_rays(cam.global_transform.rotation[ci],
                             cam.camera3d.fov[ci], w / h, h, w)
            if env is not None:
                sky = sample_equirect(env, rays) * brightness
            else:
                li, _ = pick_camera(light.mask)
                sun_dir = quat_rotate_vec3(
                    light.global_transform.rotation[li],
                    jnp.asarray([0.0, 0.0, -1.0]))
                sky = procedural_sky(rays, sun_dir, horizon, zenith,
                                     ground, sun_color, sun_size) * \
                    brightness
            bg = (target.depth <= 0.0) & has_cam
            rgb = jnp.where(bg[None], sky, c[:3])
            target.color = jnp.concatenate([rgb, c[3:4]], 0)

        app.add_systems(Render, skybox_pass, in_set=POST_SET,
                        before="tonemap_pass")
