"""Environment-map lighting (reference twin: bevy_pbr's
light_probe/environment_map — `EnvironmentMapLight`: prefiltered diffuse
irradiance + roughness-mipped specular radiance applied as image-based
ambient light).

TPU form: the equirect environment prefilters HOST-side at build (a
cosine-lobe convolution for irradiance, progressive blurs for the
specular roughness chain), uploads as small device arrays, and one XLA
pass over the G-buffer adds the IBL term — normals, albedo,
metallic/roughness all come from the deferred targets, view rays from
the camera (requires Mesh3dPlugin(deferred=True))."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from bevy_tpu.app.main_schedule import Render
from bevy_tpu.app.plugin import Plugin
from bevy_tpu.ecs.query import Query, Read, Res, ResMut
from bevy_tpu.ecs.system import system
from bevy_tpu.render.camera import Camera3d, pick_camera
from bevy_tpu.render.plugin import SHADE_SET, RenderTarget
from bevy_tpu.render.skybox import sample_equirect, view_rays
from bevy_tpu.transform import GlobalTransform


def _dirs_equirect(h, w):
    """(h, w, 3) unit directions for equirect texel centers."""
    v = (np.arange(h) + 0.5) / h
    u = (np.arange(w) + 0.5) / w
    theta = np.pi * v                      # 0 (up) .. pi (down)
    phi = 2.0 * np.pi * (u - 0.5)
    st = np.sin(theta)[:, None]
    y = np.cos(theta)[:, None] * np.ones((1, w))
    x = st * np.sin(phi)[None, :]
    z = -st * np.cos(phi)[None, :]
    return np.stack([x, y, z], -1)


def prefilter_environment(env, irr_size=(16, 32), spec_levels=4):
    """Host-side prefilter: cosine-convolved irradiance + progressively
    blurred specular chain (ref: the environment map preprocessing the
    reference does offline / via bevy's prefilter shaders)."""
    env = np.asarray(env, np.float32)[..., :3]
    sh, sw = 32, 64
    # downsample source for the convolution
    ys = (np.linspace(0, env.shape[0] - 1, sh)).astype(int)
    xs = (np.linspace(0, env.shape[1] - 1, sw)).astype(int)
    src = env[ys][:, xs]                              # (sh, sw, 3)
    sdirs = _dirs_equirect(sh, sw).reshape(-1, 3)
    sweight = np.repeat(np.sin(np.pi * (np.arange(sh) + 0.5) / sh), sw)
    srgb = src.reshape(-1, 3)
    ih, iw = irr_size
    idirs = _dirs_equirect(ih, iw).reshape(-1, 3)
    cos = np.clip(idirs @ sdirs.T, 0.0, None)         # (ihw, shw)
    wsum = cos * sweight[None, :]
    irr = (wsum @ srgb) / np.maximum(wsum.sum(1, keepdims=True), 1e-8)
    irradiance = irr.reshape(ih, iw, 3).astype(np.float32)
    # specular chain: level 0 = sharp, later = blurred (roughness ↑)
    spec = [env]
    cur = env
    for _ in range(spec_levels - 1):
        h2, w2 = max(cur.shape[0] // 2, 4), max(cur.shape[1] // 2, 8)
        ys = (np.linspace(0, cur.shape[0] - 1, h2)).astype(int)
        xs = (np.linspace(0, cur.shape[1] - 1, w2)).astype(int)
        ds = cur[ys][:, xs]
        k = np.asarray([0.25, 0.5, 0.25])
        ds = (np.roll(ds, 1, 0) * k[0] + ds * k[1] + np.roll(ds, -1, 0) * k[2])
        ds = (np.roll(ds, 1, 1) * k[0] + ds * k[1] + np.roll(ds, -1, 1) * k[2])
        spec.append(ds.astype(np.float32))
        cur = ds
    return irradiance, spec


class EnvironmentLightPlugin(Plugin):
    """ref: EnvironmentMapLight. Requires the deferred G-buffer."""

    def __init__(self, environment, intensity=1.0):
        self.irradiance, self.spec = prefilter_environment(environment)
        self.intensity = intensity

    def build(self, app):
        irr = jnp.asarray(self.irradiance)
        specs = [jnp.asarray(s) for s in self.spec]
        inten = self.intensity
        nlev = len(specs)

        @system(name="environment_light_pass")
        def env_light_pass(target=ResMut(RenderTarget.RESOURCE),
                           cam=Query(Read(Camera3d), Read(GlobalTransform))):
            g = target.gbuffer                 # (12, H, W)
            c = target.color
            _, h, w = c.shape
            ci, has_cam = pick_camera(cam.mask)
            rays = view_rays(cam.global_transform.rotation[ci],
                             cam.camera3d.fov[ci], w / h, h, w)  # (3,H,W)
            albedo = jnp.moveaxis(g[0:3], 0, -1)
            n = jnp.moveaxis(g[4:7], 0, -1)
            metallic = g[10]
            rough = jnp.clip(g[11], 0.0, 1.0)
            nrm3 = jnp.moveaxis(n, -1, 0)
            diffuse = sample_equirect(irr, nrm3)            # (3, H, W)
            # reflection vector for specular
            d = jnp.moveaxis(rays, 0, -1)
            r = d - 2.0 * jnp.sum(d * n, -1, keepdims=True) * n
            r3 = jnp.moveaxis(r, -1, 0)
            lev = rough * (nlev - 1)
            spec_acc = jnp.zeros((3, h, w), jnp.float32)
            for li in range(nlev):
                wgt = jnp.clip(1.0 - jnp.abs(lev - li), 0.0, 1.0)
                spec_acc = spec_acc + sample_equirect(specs[li], r3) * \
                    wgt[None]
            tint = jnp.moveaxis(g[19:22], 0, -1) if g.shape[0] >= 22 \
                else 1.0      # ref: specular_tint modulates dielectric F0
            f0 = 0.04 * tint * (1.0 - metallic[..., None]) + \
                albedo * metallic[..., None]
            ibl = (jnp.moveaxis(diffuse, 0, -1) * albedo *
                   (1.0 - metallic[..., None]) +
                   jnp.moveaxis(spec_acc, 0, -1) * f0) * inten
            hit = (target.depth > 0) & has_cam
            rgb = jnp.where(hit[None],
                            c[:3] + jnp.moveaxis(ibl, -1, 0), c[:3])
            target.color = jnp.concatenate([rgb, c[3:4]], 0)

        app.add_systems(Render, env_light_pass, in_set=SHADE_SET,
                        after="deferred_shade")

    @staticmethod
    def gradient_environment(horizon=(0.5, 0.6, 0.8), zenith=(0.2, 0.3, 0.6),
                             ground=(0.25, 0.2, 0.15), size=(32, 64)):
        """Convenience: a procedural gradient equirect array."""
        h, w = size
        dirs = _dirs_equirect(h, w)
        up = dirs[..., 1]
        t = np.clip(up, 0.0, 1.0) ** 0.7
        sky = (np.asarray(horizon) * (1 - t[..., None]) +
               np.asarray(zenith) * t[..., None])
        out = np.where(up[..., None] >= 0, sky, np.asarray(ground))
        return out.astype(np.float32)