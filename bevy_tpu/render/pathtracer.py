"""Reference pathtracer (reference twin: bevy_solari's pathtracer mode —
`bevy_solari/src/pathtracer/`: a progressive, unbiased reference
renderer used to validate the realtime GI).

TPU form: per frame, one sample per pixel traces through the whole
triangle soup with batched Möller-Trumbore intersection — rays process
in pixel chunks via `lax.map` so the (rays x tris) distance matrix stays
bounded, and every bounce is a lockstep vectorized step (no BVH: the MXU
-era answer to divergence is brute-force coherence; scene sizes that
need one should use the realtime path). Samples accumulate across
frames into a running mean (ref: the pathtracer's accumulation buffer);
the world is snapshotted at build time (static scenes, like the
reference's pathtracer examples)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from bevy_tpu.app.main_schedule import Render
from bevy_tpu.app.plugin import Plugin
from bevy_tpu.ecs.query import Query, Read, ResMut
from bevy_tpu.ecs.system import system
from bevy_tpu.math.quat import quat_rotate_vec3
from bevy_tpu.render.camera import Camera3d, pick_camera
from bevy_tpu.render.plugin import POST_SET, RenderTarget
from bevy_tpu.render.skybox import view_rays
from bevy_tpu.transform import GlobalTransform


def _rng01(key, shape):
    """Counter-based uniform [0,1): cheap threefry-lite hash (the
    deterministic-under-jit pattern used across the engine)."""
    x = key.astype(jnp.uint32)
    for c in (0x9E3779B9, 0x85EBCA6B, 0xC2B2AE35):
        x = (x ^ (x >> 16)) * jnp.uint32(c)
    return (x >> jnp.uint32(8)).astype(jnp.float32) / float(1 << 24)


def intersect_chunk(orig, dirs, v0, e1, e2):
    """Möller-Trumbore: orig/dirs (P, 3); v0/e1/e2 (T, 3).
    Returns (t (P,), tri (P,) int32) with t = inf on miss."""
    p = jnp.cross(dirs[:, None, :], e2[None])            # (P, T, 3)
    det = jnp.sum(e1[None] * p, -1)
    inv = jnp.where(jnp.abs(det) > 1e-9, 1.0 / det, 0.0)
    s = orig[:, None, :] - v0[None]
    u = jnp.sum(s * p, -1) * inv
    q = jnp.cross(s, e1[None])
    v = jnp.sum(dirs[:, None, :] * q, -1) * inv
    t = jnp.sum(e2[None] * q, -1) * inv
    okm = (jnp.abs(det) > 1e-9) & (u >= 0) & (v >= 0) & (u + v <= 1) & \
        (t > 1e-3)
    t = jnp.where(okm, t, 3.4e38)
    tri = jnp.argmin(t, -1)
    return jnp.min(t, -1), tri.astype(jnp.int32)


def bake_triangle_soup(world, plugin):
    """Flatten Mesh3d instances to a world-space triangle soup (host;
    shared by the pathtracer and the realtime solari shadow rays — ref:
    the BLAS build of bevy_solari/src/scene/). Returns device arrays
    {v0, e1, e2, n, alb, emi}."""
    from bevy_tpu.render.mesh3d import Mesh3d, MeshMaterial
    rows = world.query_rows(Mesh3d)
    mesh_ids = np.asarray(jax.device_get(
        world.column(Mesh3d, "mesh")))[rows]
    tr = np.asarray(jax.device_get(
        world.column(GlobalTransform, "translation")))[rows]
    sc = np.asarray(jax.device_get(
        world.column(GlobalTransform, "scale")))[rows]
    ro = np.asarray(jax.device_get(
        world.column(GlobalTransform, "rotation")))[rows]
    bc = np.asarray(jax.device_get(
        world.column(MeshMaterial, "base_color")))[rows]
    em = np.asarray(jax.device_get(
        world.column(MeshMaterial, "emissive")))[rows]
    v0s, e1s, e2s, ns, als, ems = [], [], [], [], [], []
    for i, row in enumerate(rows):
        m = plugin.pool.meshes[int(mesh_ids[i])]
        p = np.asarray(m.positions) * sc[i]
        q = ro[i]
        # rotate host-side (numpy quat)
        x, y, zq, wq = q
        rot = np.array([
            [1 - 2 * (y * y + zq * zq), 2 * (x * y - zq * wq),
             2 * (x * zq + y * wq)],
            [2 * (x * y + zq * wq), 1 - 2 * (x * x + zq * zq),
             2 * (y * zq - x * wq)],
            [2 * (x * zq - y * wq), 2 * (y * zq + x * wq),
             1 - 2 * (x * x + y * y)]], np.float32)
        pw = p @ rot.T + tr[i]
        tv = pw[np.asarray(m.triangles, np.int64)]   # (tc, 3, 3)
        v0s.append(tv[:, 0])
        e1s.append(tv[:, 1] - tv[:, 0])
        e2s.append(tv[:, 2] - tv[:, 0])
        fn = np.cross(e1s[-1], e2s[-1])
        fn /= np.maximum(np.linalg.norm(fn, axis=-1,
                                        keepdims=True), 1e-9)
        ns.append(fn)
        als.append(np.tile(bc[i][:3], (len(tv), 1)))
        ems.append(np.tile(em[i], (len(tv), 1)))
    return {
        "v0": jnp.asarray(np.concatenate(v0s), jnp.float32),
        "e1": jnp.asarray(np.concatenate(e1s), jnp.float32),
        "e2": jnp.asarray(np.concatenate(e2s), jnp.float32),
        "n": jnp.asarray(np.concatenate(ns), jnp.float32),
        "alb": jnp.asarray(np.concatenate(als), jnp.float32),
        "emi": jnp.asarray(np.concatenate(ems), jnp.float32),
    }


class PathtracerPlugin(Plugin):
    """Replaces the frame color with the progressive pathtrace (ref:
    solari's pathtracer camera mode). Scene = the Mesh3dPlugin's
    instances, snapshotted host-side at startup."""

    def __init__(self, mesh_plugin, bounces=3, chunk=4096,
                 sky=(0.4, 0.55, 0.8), sky_strength=1.0):
        self.mesh_plugin = mesh_plugin
        self.bounces = bounces
        self.chunk = chunk
        self.sky = sky
        self.sky_strength = sky_strength

    def build(self, app):
        plugin = self.mesh_plugin
        bounces, chunk = self.bounces, self.chunk
        sky = jnp.asarray(self.sky, jnp.float32) * self.sky_strength
        holder = {}

        def bake(world):
            holder.update(bake_triangle_soup(world, plugin))
            if "pt_accum" not in world.state["res"]:
                from bevy_tpu.render.plugin import RenderPlugin
                rp = next(p for p in app._plugins
                          if type(p).__name__ == "RenderPlugin")
                world.state["res"]["pt_accum"] = {
                    "sum": jnp.zeros((3, rp.height, rp.width), jnp.float32),
                    "count": jnp.zeros((), jnp.float32),
                }

        app.add_prepare_hook(bake)

        @system(name="pathtrace_pass")
        def pathtrace_pass(target=ResMut(RenderTarget.RESOURCE),
                           acc=ResMut("pt_accum"),
                           cam=Query(Read(Camera3d), Read(GlobalTransform)),
                           frames=ResMut("frame_count")):
            v0, e1, e2 = holder["v0"], holder["e1"], holder["e2"]
            fnrm, alb, emi = holder["n"], holder["alb"], holder["emi"]
            c = target.color
            _, h, w = c.shape
            ci, has_cam = pick_camera(cam.mask)
            eye = cam.global_transform.translation[ci]
            rays = view_rays(cam.global_transform.rotation[ci],
                             cam.camera3d.fov[ci], w / h, h, w)
            p = h * w
            dirs0 = jnp.moveaxis(rays, 0, -1).reshape(p, 3)
            orig0 = jnp.broadcast_to(eye[None], (p, 3))
            frame_u32 = jnp.asarray(frames.count, jnp.uint32)
            base_key = jnp.arange(p, dtype=jnp.uint32) + \
                frame_u32 * jnp.uint32(2654435761)

            def trace(args):
                orig, dirs, key = args
                radiance = jnp.zeros((orig.shape[0], 3), jnp.float32)
                throughput = jnp.ones((orig.shape[0], 3), jnp.float32)
                alive = jnp.ones(orig.shape[0], bool)
                for b in range(bounces):
                    t, tri = intersect_chunk(orig, dirs, v0, e1, e2)
                    hit = (t < 1e37) & alive
                    radiance = radiance + jnp.where(
                        (alive & ~hit)[:, None], throughput * sky[None], 0.0)
                    n = fnrm[tri]
                    # face the ray
                    n = jnp.where(jnp.sum(n * dirs, -1, keepdims=True) > 0,
                                  -n, n)
                    radiance = radiance + jnp.where(
                        hit[:, None], throughput * emi[tri], 0.0)
                    throughput = throughput * jnp.where(
                        hit[:, None], alb[tri], 1.0)
                    # cosine-weighted hemisphere bounce
                    r1 = _rng01(key + jnp.uint32(b * 7919 + 1), None)
                    r2 = _rng01(key + jnp.uint32(b * 104729 + 2), None)
                    phi = 2.0 * jnp.pi * r1
                    ct = jnp.sqrt(1.0 - r2)
                    st = jnp.sqrt(r2)
                    up = jnp.where(jnp.abs(n[:, 1:2]) < 0.9,
                                   jnp.asarray([0.0, 1.0, 0.0])[None],
                                   jnp.asarray([1.0, 0.0, 0.0])[None])
                    tang = jnp.cross(up, n)
                    tang = tang * jax.lax.rsqrt(jnp.maximum(
                        jnp.sum(tang * tang, -1, keepdims=True), 1e-9))
                    bit = jnp.cross(n, tang)
                    nd = (tang * (jnp.cos(phi) * st)[:, None] +
                          bit * (jnp.sin(phi) * st)[:, None] +
                          n * ct[:, None])
                    orig = jnp.where(hit[:, None],
                                     orig + dirs * t[:, None] +
                                     n * 1e-3, orig)
                    dirs = jnp.where(hit[:, None], nd, dirs)
                    alive = alive & hit
                return radiance

            nchunks = (p + chunk - 1) // chunk
            pad = nchunks * chunk - p
            orig_p = jnp.pad(orig0, ((0, pad), (0, 0)))
            dirs_p = jnp.pad(dirs0, ((0, pad), (0, 0)))
            key_p = jnp.pad(base_key, (0, pad))
            rad = jax.lax.map(trace, (
                orig_p.reshape(nchunks, chunk, 3),
                dirs_p.reshape(nchunks, chunk, 3),
                key_p.reshape(nchunks, chunk)))
            rad = rad.reshape(-1, 3)[:p]
            img = jnp.moveaxis(rad.reshape(h, w, 3), -1, 0)
            new_sum = acc.sum + img
            new_count = acc.count + 1.0
            acc.sum = new_sum
            acc.count = new_count
            mean = new_sum / jnp.maximum(new_count, 1.0)
            target.color = jnp.concatenate(
                [jnp.where(has_cam, mean, c[:3]),
                 jnp.ones((1, h, w), jnp.float32)], 0)

        app.add_systems(Render, pathtrace_pass, in_set=POST_SET,
                        before="tonemap_pass")
