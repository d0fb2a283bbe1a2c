"""Fog (reference twins: bevy_pbr's DistanceFog — `src/fog.rs`
linear/exponential falloff — and the volumetric fog + lights of
`src/volumetric_fog/`: a raymarched scattering pass that reads the
directional shadow map, producing god rays).

TPU form: both are XLA screen passes. Distance fog blends by view
depth. Volumetric fog marches N lockstep samples along each pixel's
ray, accumulating in-scattering gated by the cascaded shadow map
(requires ShadowPlugin for the light-shaft look; without it the medium
is uniformly lit)."""

from __future__ import annotations

import jax
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


class DistanceFogPlugin(Plugin):
    """ref: DistanceFog component (exponential-squared falloff here)."""

    def __init__(self, color=(0.6, 0.65, 0.75), density=0.02, near=0.1):
        self.color = color
        self.density = density
        self.near = near

    def build(self, app):
        color = jnp.asarray(self.color, jnp.float32)
        density, near = self.density, self.near

        @system(name="distance_fog_pass")
        def distance_fog(target=ResMut(RenderTarget.RESOURCE)):
            c = target.color
            z = target.depth
            dist = near / jnp.maximum(z, 1e-7)
            t = jnp.exp(-(density * dist) ** 2)
            t = jnp.where(z > 0, t, 1.0)       # background untouched
            rgb = c[:3] * t[None] + color[:, None, None] * (1.0 - t)[None]
            target.color = jnp.concatenate([rgb, c[3:4]], 0)

        app.add_systems(Render, distance_fog, in_set=POST_SET,
                        before="tonemap_pass")


class VolumetricFogPlugin(Plugin):
    """ref: VolumetricFog + FogVolume — a global medium here; god rays
    come from sampling the directional shadow cascades along the ray."""

    def __init__(self, density=0.03, steps=16, max_distance=40.0,
                 scatter_color=(0.8, 0.85, 1.0), anisotropy=0.4,
                 near=0.1):
        self.density = density
        self.steps = steps
        self.max_distance = max_distance
        self.scatter_color = scatter_color
        self.anisotropy = anisotropy
        self.near = near

    def build(self, app):
        density, steps = self.density, self.steps
        max_d, g = self.max_distance, self.anisotropy
        scol = jnp.asarray(self.scatter_color, jnp.float32)
        near = self.near

        @system(name="volumetric_fog_pass")
        def volumetric_fog(target=ResMut(RenderTarget.RESOURCE),
                           cam=Query(Read(Camera3d), Read(GlobalTransform)),
                           light=Query(Read(DirectionalLight),
                                       Read(GlobalTransform))):
            c = target.color
            z = target.depth
            h, w = z.shape
            ci, has_cam = pick_camera(cam.mask)
            eye = cam.global_transform.translation[ci]
            rays = view_rays(cam.global_transform.rotation[ci],
                             cam.camera3d.fov[ci], w / h, h, w)
            rdir = jnp.moveaxis(rays, 0, -1)           # (H, W, 3)
            li, has_l = pick_camera(light.mask)
            ldir = quat_rotate_vec3(light.global_transform.rotation[li],
                                    jnp.asarray([0.0, 0.0, -1.0]))
            lcol = (light.directional_light.color[li] *
                    light.directional_light.illuminance[li])
            # Henyey-Greenstein phase (ref: volumetric_fog.wesl)
            cosang = -jnp.sum(rdir * ldir[None, None, :], -1)
            phase = (1.0 - g * g) / jnp.maximum(
                4.0 * jnp.pi * (1.0 + g * g - 2.0 * g * cosang) ** 1.5,
                1e-4)
            surf = jnp.where(z > 0, near / jnp.maximum(z, 1e-7), max_d)
            march_end = jnp.minimum(surf, max_d)
            dt = march_end / steps                      # (H, W)
            has_shadow = hasattr(target, "shadow_depth")
            if has_shadow:
                from bevy_tpu.render.shadow import shadow_factor
            trans = jnp.ones_like(z)
            scatter = jnp.zeros((h, w), jnp.float32)
            for s in range(steps):
                d = dt * (s + 0.5)
                p = eye[None, None, :] + rdir * d[..., None]
                lit = shadow_factor(p, target.shadow_depth,
                                    target.shadow_vp) if has_shadow \
                    else jnp.ones_like(z)
                step_od = density * dt
                scatter = scatter + trans * lit * step_od * phase
                trans = trans * jnp.exp(-step_od)
            fog_rgb = (scol * lcol)[:, None, None] * scatter[None] * \
                4.0 * jnp.pi
            rgb = c[:3] * trans[None] + fog_rgb
            rgb = jnp.where(has_cam & (has_l > 0), rgb, c[:3])
            target.color = jnp.concatenate([rgb, c[3:4]], 0)

        app.add_systems(Render, volumetric_fog, in_set=POST_SET,
                        before="tonemap_pass")
