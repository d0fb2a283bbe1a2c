"""Realtime ReSTIR DI (reference twin: bevy_solari's realtime direct
lighting — `bevy_solari/src/realtime/restir.wesl` reservoir sampling +
`presample_light_tiles.wesl` light-tile presampling; the pathtracer
plugin remains the ground truth, `bevy_solari/src/pathtracer/`).

TPU form, one fused XLA pass per frame over the deferred G-buffer:

1. **Light-tile presampling**: (n_tiles, K) light indices drawn
   uniformly with a counter-based hash per frame — each screen tile's
   pixels draw candidates from one small per-tile set (coherent
   gathers), and because every table entry is marginally uniform over
   lights, the RIS candidate pdf stays the analytic 1/L (unbiased).
2. **RIS reservoir per pixel**: M candidates stream through a weighted
   reservoir (target p-hat = luminance of the unshadowed Cook-Torrance
   contribution — the same diffuse+GGX the deferred kernel shades, so
   converged output validates against `DeferredLightingPlugin`).
3. **Temporal reuse**: last frame's reservoir merges in (M clamped at
   `temporal_cap` x the per-frame M), keyed on depth agreement.
4. **One shadow ray for the SELECTED light only** (the ReSTIR payoff):
   chunked Möller-Trumbore against the baked triangle soup
   (`pathtracer.bake_triangle_soup`), optional via `shadow_rays`.

Estimate: color = f(y) * W * visibility, W = wsum / (M * p_hat(y)).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from bevy_tpu.app.main_schedule import Render
from bevy_tpu.app.plugin import Plugin
from bevy_tpu.ecs.query import Query, Read, Res, ResMut
from bevy_tpu.ecs.system import system
from bevy_tpu.math.quat import quat_rotate_vec3
from bevy_tpu.render.camera import (
    Camera3d, perspective_infinite_reverse, pick_camera, view_matrix,
)
from bevy_tpu.render.deferred import PointLight
from bevy_tpu.render.mesh3d import AmbientLight, MeshMaterial  # noqa: F401
from bevy_tpu.render.plugin import (
    SHADE_SET, ClearColor, RenderPlugin, RenderTarget,
)
from bevy_tpu.transform import GlobalTransform


def _hash01(x):
    """Counter-based uniform [0,1) (threefry-lite, same family as the
    pathtracer's) — deterministic under jit."""
    x = x.astype(jnp.uint32)
    for c in (0x9E3779B9, 0x85EBCA6B, 0xC2B2AE35):
        x = (x ^ (x >> 16)) * jnp.uint32(c)
    return (x >> jnp.uint32(8)).astype(jnp.float32) / float(1 << 24)


def _point_contrib(wp, n, v, alb, met, rough, lpos, lcol, lrng):
    """Cook-Torrance diffuse+GGX for one point light per pixel — the
    same model as the deferred kernel (shade_pallas shade_light +
    attenuation) so converged ReSTIR matches it. All (H,W,…)."""
    d = lpos - wp
    d2 = jnp.sum(d * d, -1)
    inv_d = jax.lax.rsqrt(jnp.maximum(d2, 1e-9))
    ldir = d * inv_d[..., None]
    rng2 = jnp.maximum(lrng * lrng, 1e-9)
    win = jnp.clip(1.0 - (d2 / rng2) * (d2 / rng2), 0.0, 1.0)
    atten = win * win / (d2 + 1.0)
    nol = jnp.maximum(jnp.sum(n * ldir, -1), 0.0)
    h = ldir + v
    h = h * jax.lax.rsqrt(jnp.maximum(
        jnp.sum(h * h, -1, keepdims=True), 1e-9))
    noh = jnp.maximum(jnp.sum(n * h, -1), 0.0)
    loh = jnp.maximum(jnp.sum(ldir * h, -1), 0.0)
    nov = jnp.maximum(jnp.sum(n * v, -1), 1e-4)
    alpha = rough * rough
    a2 = alpha * alpha
    den = noh * noh * (a2 - 1.0) + 1.0
    dist = a2 / jnp.maximum(3.14159265 * den * den, 1e-9)
    vis = 0.5 / jnp.maximum(
        nol * (nov * (1.0 - alpha) + alpha) +
        nov * (nol * (1.0 - alpha) + alpha), 1e-4)
    fres = (1.0 - loh) ** 5
    f0 = 0.04 * (1.0 - met[..., None]) + alb * met[..., None]
    spec = dist[..., None] * vis[..., None] * \
        (f0 + (1.0 - f0) * fres[..., None])
    diff = alb * (1.0 - met[..., None])
    return (diff + spec) * lcol * (atten * nol)[..., None]


def atrous_denoise(img, depth, normal, geom, iterations=2, sigma_z=4.0,
                   sigma_n=32.0):
    """Edge-aware a-trous spatial filter on the indirect term — the
    TPU-native stand-in for the reference's DLSS-RR denoise textures
    (ref: resolve_dlss_rr_textures.wesl; algorithmically an SVGF-lite
    wavelet pass). Weights combine a 5-tap B3 spline kernel with depth
    and normal similarity, so lighting blurs within surfaces but never
    across silhouettes."""
    kern = [1.0 / 16, 1.0 / 4, 3.0 / 8, 1.0 / 4, 1.0 / 16]
    h, w = depth.shape

    def shift(x, dy, dx):
        # zero-padded shift (no wraparound)
        pads = [(max(dy, 0), max(-dy, 0)), (max(dx, 0), max(-dx, 0))]
        if x.ndim == 3:
            pads = pads + [(0, 0)]
        xp = jnp.pad(x, pads)
        return xp[max(-dy, 0):max(-dy, 0) + h,
                  max(-dx, 0):max(-dx, 0) + w]

    out = img
    for it in range(iterations):
        step = 1 << it
        acc = jnp.zeros_like(out)
        wacc = jnp.zeros(depth.shape, jnp.float32)
        for iy, ky in enumerate(kern):
            for ix, kx in enumerate(kern):
                dy = (iy - 2) * step
                dx = (ix - 2) * step
                zs = shift(depth, dy, dx)
                ns = shift(normal, dy, dx)
                gs = shift(geom.astype(jnp.float32), dy, dx)
                wz = jnp.exp(-jnp.abs(zs - depth) * sigma_z * 64.0)
                ndot = jnp.clip(jnp.sum(ns * normal, -1), 0.0, 1.0)
                wn = ndot ** sigma_n
                wgt = ky * kx * wz * wn * gs
                acc = acc + shift(out, dy, dx) * wgt[..., None]
                wacc = wacc + wgt
        out = acc / jnp.maximum(wacc, 1e-6)[..., None]
    return out


class SolariPlugin(Plugin):
    """Realtime ReSTIR direct illumination over the deferred G-buffer.
    Use with Mesh3dPlugin(deferred=True) INSTEAD of
    DeferredLightingPlugin (it owns the shade position). Point lights
    only (the reference's realtime DI also samples emissive tris +
    directional via its own paths)."""

    def __init__(self, mesh_plugin, candidates=8, presample_k=32,
                 tile_px=16, temporal_cap=16.0, shadow_rays=False,
                 shadow_chunk=4096, backend="auto", gi=False,
                 gi_temporal_cap=32.0, world_cache=True,
                 cache_capacity=32768, cache_budget=2048,
                 cache_base_cell=0.25, cache_lod_scale=50.0,
                 specular_gi=True, denoise=False):
        self.mesh_plugin = mesh_plugin
        self.m = candidates
        self.k = presample_k
        self.tile_px = tile_px
        self.cap = temporal_cap
        self.shadow_rays = shadow_rays
        self.shadow_chunk = shadow_chunk
        self.gi = gi
        self.gi_cap = gi_temporal_cap
        # hash-grid world irradiance cache (ref: world_cache_*.wesl) —
        # GI bounce hits read cached multi-bounce energy; a per-frame
        # budget of cells re-samples DI + one cache-hop GI
        self.world_cache = world_cache
        self.cache_capacity = cache_capacity
        self.cache_budget = cache_budget
        self.cache_base_cell = cache_base_cell
        self.cache_lod_scale = cache_lod_scale
        # roughness-aware GGX lobe sampling for the GI bounce (ref: the
        # specular paths of initial_path.wesl — mirrors concentrate
        # their bounce rays along the reflection direction)
        self.specular_gi = specular_gi
        # edge-aware a-trous spatial filter on the indirect term (the
        # DLSS-RR denoise role, resolve_dlss_rr_textures.wesl — a
        # TPU-native SVGF-lite stand-in)
        self.denoise = denoise

    def build(self, app):
        rp = next((p for p in app._plugins if isinstance(p, RenderPlugin)),
                  None)
        if rp is None:
            raise RuntimeError("SolariPlugin requires RenderPlugin")
        app.world.register_component(PointLight)
        width, height = rp.width, rp.height
        m_cand, k_pre, tile_px = self.m, self.k, self.tile_px
        cap, use_shadow, chunk = self.cap, self.shadow_rays, \
            self.shadow_chunk
        mesh_plugin = self.mesh_plugin
        holder = {}

        # the shade position owns the G-buffer allocation (mirrors
        # DeferredLightingPlugin): 14 planes — albedo rgba, normal,
        # emissive, metallic, roughness, clearcoat, ccr
        store = app.world.state["res"][RenderTarget.RESOURCE]
        store["gbuffer"] = jnp.zeros((14, height, width), jnp.float32)
        app.world.structure_version += 1

        use_gi, gi_cap = self.gi, self.gi_cap
        use_cache = self.world_cache and use_gi
        cache_capacity, cache_budget = self.cache_capacity, self.cache_budget
        cache_base, cache_lod = self.cache_base_cell, self.cache_lod_scale
        use_spec, use_denoise = self.specular_gi, self.denoise

        def prep(world):
            world.state["res"]["restir"] = {
                "y": jnp.full((height, width), -1, jnp.int32),
                "wsum": jnp.zeros((height, width), jnp.float32),
                "m": jnp.zeros((height, width), jnp.float32),
                "w": jnp.zeros((height, width), jnp.float32),
                "z": jnp.zeros((height, width), jnp.float32),
                "frame": jnp.zeros((), jnp.uint32),
            }
            if use_gi:
                # GI reservoir: the sample is a world-space hit point +
                # its outgoing radiance (ref: restir_gi.wesl reservoir
                # layout — sample_point/sample_radiance/W/M)
                world.state["res"]["restir_gi"] = {
                    "hp": jnp.zeros((height, width, 3), jnp.float32),
                    "lr": jnp.zeros((height, width, 3), jnp.float32),
                    "wsum": jnp.zeros((height, width), jnp.float32),
                    "m": jnp.zeros((height, width), jnp.float32),
                    "w": jnp.zeros((height, width), jnp.float32),
                    "z": jnp.zeros((height, width), jnp.float32),
                }
                from bevy_tpu.render.world_cache import make_world_cache
                world.state["res"]["solari_cache"] = make_world_cache(
                    cache_capacity if use_cache else 8)
            if use_shadow or use_gi:
                from bevy_tpu.render.pathtracer import bake_triangle_soup
                holder.update(bake_triangle_soup(world, mesh_plugin))

        app.add_prepare_hook(prep)

        @system(name="solari_di")
        def solari_di(plight=Query(Read(PointLight), Read(GlobalTransform)),
                      cam=Query(Read(Camera3d), Read(GlobalTransform)),
                      amb=Res(AmbientLight),
                      clear=Res(ClearColor),
                      res=ResMut("restir"),
                      target=ResMut(RenderTarget.RESOURCE)):
            ci, has_cam = pick_camera(cam.mask)
            cam_gt = cam.global_transform
            view = view_matrix(cam_gt.translation[ci], cam_gt.rotation[ci],
                               cam_gt.scale[ci])
            proj = perspective_infinite_reverse(
                cam.camera3d.fov[ci], width / height, cam.camera3d.near[ci])
            inv_vp = jnp.linalg.inv(proj @ view)
            g = target.gbuffer
            z = target.depth
            frame = res.frame

            # world-space reconstruction (same math as deferred.py)
            ys = (jnp.arange(height, dtype=jnp.float32) + 0.5)[:, None]
            xs = (jnp.arange(width, dtype=jnp.float32) + 0.5)[None, :]
            ndx = jnp.broadcast_to(2.0 * xs / width - 1.0, z.shape)
            ndy = jnp.broadcast_to(1.0 - 2.0 * ys / height, z.shape)
            ndc = jnp.stack([ndx, ndy, z, jnp.ones_like(z)], -1)
            wh = jnp.einsum("ij,hwj->hwi", inv_vp, ndc)
            wp = wh[..., :3] / jnp.where(jnp.abs(wh[..., 3:4]) > 1e-9,
                                         wh[..., 3:4], 1.0)
            geom = z > 0.0
            alb = jnp.moveaxis(g[0:3], 0, -1)
            n = jnp.moveaxis(g[4:7], 0, -1)
            emi = jnp.moveaxis(g[7:10], 0, -1)
            met, rough = g[10], jnp.clip(g[11], 0.045, 1.0)
            v = cam_gt.translation[ci] - wp
            v = v * jax.lax.rsqrt(jnp.maximum(
                jnp.sum(v * v, -1, keepdims=True), 1e-9))

            lpos = plight.global_transform.translation        # (L, 3)
            lcol = plight.point_light.color * \
                plight.point_light.intensity[:, None]
            lrng = plight.point_light.range
            lmask = plight.mask
            nl = lpos.shape[0]
            # alive-count for the uniform candidate pdf 1/L; dead rows
            # are skipped by drawing from a compacted alive index list
            alive_idx = jnp.where(
                lmask, jnp.arange(nl, dtype=jnp.int32), nl)
            order = jnp.argsort(alive_idx)
            compact = jnp.arange(nl, dtype=jnp.int32)[order]  # alive first
            n_alive = jnp.sum(lmask.astype(jnp.int32))

            # --- light-tile presampling (presample_light_tiles.wesl) ---
            tx = (width + tile_px - 1) // tile_px
            ty = (height + tile_px - 1) // tile_px
            n_tiles = tx * ty
            tcounter = (jnp.arange(n_tiles * k_pre, dtype=jnp.uint32) +
                        frame * jnp.uint32(0x1234567))
            tdraw = (_hash01(tcounter) *
                     jnp.maximum(n_alive, 1).astype(jnp.float32))
            pre = compact[jnp.minimum(tdraw.astype(jnp.int32),
                                      jnp.maximum(n_alive - 1, 0))]
            pre = pre.reshape(n_tiles, k_pre)                 # (T, K)
            pix_tile = ((ys.astype(jnp.int32) // tile_px) * tx +
                        (xs.astype(jnp.int32) // tile_px))
            pix_tile = jnp.broadcast_to(pix_tile, z.shape)
            pix_id = (jnp.arange(height, dtype=jnp.uint32)[:, None] *
                      jnp.uint32(width) +
                      jnp.arange(width, dtype=jnp.uint32)[None, :])

            def phat(idx):
                c = _point_contrib(wp, n, v, alb, met, rough,
                                   lpos[idx], lcol[idx], lrng[idx])
                return jnp.maximum(
                    0.2126 * c[..., 0] + 0.7152 * c[..., 1] +
                    0.0722 * c[..., 2], 0.0) * lmask[idx]

            # --- RIS streaming reservoir over M candidates ---
            y_sel = jnp.full(z.shape, -1, jnp.int32)
            wsum = jnp.zeros(z.shape, jnp.float32)
            l_f = jnp.maximum(n_alive, 1).astype(jnp.float32)
            for t in range(m_cand):
                u1 = _hash01(pix_id * jnp.uint32(2 * m_cand) +
                             jnp.uint32(2 * t) +
                             frame * jnp.uint32(0x9E3779B9))
                u2 = _hash01(pix_id * jnp.uint32(2 * m_cand) +
                             jnp.uint32(2 * t + 1) +
                             frame * jnp.uint32(0x85EBCA6B))
                slot = jnp.minimum((u1 * k_pre).astype(jnp.int32),
                                   k_pre - 1)
                cand = pre[pix_tile, slot]
                w_i = phat(cand) * l_f          # p_hat / (1/L)
                wsum = wsum + w_i
                take = (u2 * wsum < w_i) & (w_i > 0)
                y_sel = jnp.where(take, cand, y_sel)
            m_new = jnp.full(z.shape, float(m_cand), jnp.float32)

            # --- temporal reuse (restir.wesl temporal pass): merge last
            #     frame's reservoir where the surface persists ---
            prev_ok = (jnp.abs(res.z - z) < 1e-3) & (res.y >= 0) & geom
            prev_y = jnp.maximum(res.y, 0)
            prev_m = jnp.minimum(res.m, cap * m_cand) * prev_ok
            ph_prev = phat(prev_y) * prev_ok
            w_prev = ph_prev * res.w * prev_m
            wsum2 = wsum + w_prev
            u3 = _hash01(pix_id + frame * jnp.uint32(0xC2B2AE35))
            take_prev = (u3 * wsum2 < w_prev) & (w_prev > 0)
            y_fin = jnp.where(take_prev, prev_y, y_sel)
            m_fin = m_new + prev_m
            ph_fin = phat(jnp.maximum(y_fin, 0)) * (y_fin >= 0)
            w_fin = jnp.where(ph_fin > 0,
                              wsum2 / jnp.maximum(m_fin * ph_fin, 1e-9),
                              0.0)

            # --- one shadow ray to the selected light ---
            if use_shadow:
                from bevy_tpu.render.pathtracer import intersect_chunk
                v0, e1, e2 = holder["v0"], holder["e1"], holder["e2"]
                lp_sel = lpos[jnp.maximum(y_fin, 0)]
                delta = lp_sel - wp
                ldist = jnp.sqrt(jnp.maximum(
                    jnp.sum(delta * delta, -1), 1e-12))
                ldirp = delta / ldist[..., None]
                p = height * width
                orig = (wp + n * 1e-2).reshape(p, 3)
                dirs = ldirp.reshape(p, 3)
                dmax = ldist.reshape(p)
                pad = (-p) % chunk
                nch = (p + pad) // chunk

                def seg(args):
                    o, d, dm = args
                    t_hit, _ = intersect_chunk(o, d, v0, e1, e2)
                    return t_hit < dm * 0.999

                occ = jax.lax.map(seg, (
                    jnp.pad(orig, ((0, pad), (0, 0))).reshape(nch, chunk, 3),
                    jnp.pad(dirs, ((0, pad), (0, 0))).reshape(nch, chunk, 3),
                    jnp.pad(dmax, (0, pad)).reshape(nch, chunk)))
                vis_f = 1.0 - occ.reshape(-1)[:p].reshape(z.shape)
            else:
                vis_f = 1.0

            f_sel = _point_contrib(
                wp, n, v, alb, met, rough,
                lpos[jnp.maximum(y_fin, 0)], lcol[jnp.maximum(y_fin, 0)],
                lrng[jnp.maximum(y_fin, 0)]) * (y_fin >= 0)[..., None]
            direct = f_sel * (w_fin * vis_f)[..., None]
            rgb = emi + alb * (amb.color * amb.brightness) + direct
            out = jnp.where(geom[None] & has_cam,
                            jnp.moveaxis(rgb, -1, 0),
                            jnp.broadcast_to(clear.color[:3, None, None],
                                             (3, height, width)))
            target.color = jnp.concatenate(
                [out, jnp.ones((1, height, width), jnp.float32)], 0)

            res.y = y_fin
            res.wsum = wsum2
            res.m = m_fin
            res.w = w_fin
            res.z = z
            res.frame = frame + jnp.uint32(1)

        from bevy_tpu.render.deferred import clear_gbuffer
        from bevy_tpu.render.plugin import CLEAR_SET
        app.add_systems(Render, clear_gbuffer, in_set=CLEAR_SET)
        app.add_systems(Render, solari_di, in_set=SHADE_SET,
                        after="mesh_pass")

        if not use_gi:
            return

        @system(name="solari_gi")
        def solari_gi(plight=Query(Read(PointLight), Read(GlobalTransform)),
                      cam=Query(Read(Camera3d), Read(GlobalTransform)),
                      res=ResMut("restir"),
                      gi=ResMut("restir_gi"),
                      cache=ResMut("solari_cache"),
                      target=ResMut(RenderTarget.RESOURCE)):
            """One-bounce ReSTIR GI (ref: bevy_solari realtime GI —
            restir_gi.wesl path sample → shade hit → per-pixel reservoir
            with temporal reuse) over the hash-grid world cache
            (world_cache_*.wesl): bounce hits read cached multi-bounce
            irradiance, and a per-frame budget of cells re-samples
            DI-RIS + one cache-hop GI. Roughness-aware GGX lobe
            sampling gives mirrors their specular GI (the initial_path
            specular role). Adds indirect light into target.color."""
            ci, has_cam = pick_camera(cam.mask)
            cam_gt = cam.global_transform
            view = view_matrix(cam_gt.translation[ci], cam_gt.rotation[ci],
                               cam_gt.scale[ci])
            proj = perspective_infinite_reverse(
                cam.camera3d.fov[ci], width / height, cam.camera3d.near[ci])
            inv_vp = jnp.linalg.inv(proj @ view)
            g = target.gbuffer
            z = target.depth
            frame = res.frame  # solari_di already advanced it this frame

            ys = (jnp.arange(height, dtype=jnp.float32) + 0.5)[:, None]
            xs = (jnp.arange(width, dtype=jnp.float32) + 0.5)[None, :]
            ndx = jnp.broadcast_to(2.0 * xs / width - 1.0, z.shape)
            ndy = jnp.broadcast_to(1.0 - 2.0 * ys / height, z.shape)
            ndc = jnp.stack([ndx, ndy, z, jnp.ones_like(z)], -1)
            wh = jnp.einsum("ij,hwj->hwi", inv_vp, ndc)
            wp = wh[..., :3] / jnp.where(jnp.abs(wh[..., 3:4]) > 1e-9,
                                         wh[..., 3:4], 1.0)
            geom = (z > 0.0) & has_cam
            alb = jnp.moveaxis(g[0:3], 0, -1)
            n = jnp.moveaxis(g[4:7], 0, -1)
            met = g[10]
            rough = jnp.clip(g[11], 0.045, 1.0)
            cam_pos = cam_gt.translation[ci]
            vv = cam_pos - wp
            vv = vv * jax.lax.rsqrt(jnp.maximum(
                jnp.sum(vv * vv, -1, keepdims=True), 1e-9))

            pix_id = (jnp.arange(height, dtype=jnp.uint32)[:, None] *
                      jnp.uint32(width) +
                      jnp.arange(width, dtype=jnp.uint32)[None, :])

            # --- bounce direction: mixture of a cosine lobe and (when
            #     specular_gi) a GGX reflect lobe weighted by metalness
            #     + inverse roughness — mirrors send their rays along
            #     the reflection (ref: initial_path.wesl
            #     evaluate_and_sample_brdf) ---
            u1 = _hash01(pix_id * jnp.uint32(4) + jnp.uint32(0) +
                         frame * jnp.uint32(0x68E31DA4))
            u2 = _hash01(pix_id * jnp.uint32(4) + jnp.uint32(1) +
                         frame * jnp.uint32(0xB5297A4D))
            r = jnp.sqrt(u1)
            phi = 2.0 * jnp.pi * u2
            # branchless ONB (Frisvad) around n
            s = jnp.where(n[..., 2] >= 0.0, 1.0, -1.0)
            a = -1.0 / (s + n[..., 2])
            b = n[..., 0] * n[..., 1] * a
            t1 = jnp.stack([1.0 + s * n[..., 0] * n[..., 0] * a,
                            s * b, -s * n[..., 0]], -1)
            t2 = jnp.stack([b, s + n[..., 1] * n[..., 1] * a,
                            -n[..., 1]], -1)
            lz = jnp.sqrt(jnp.maximum(1.0 - u1, 0.0))
            cdir = (t1 * (r * jnp.cos(phi))[..., None] +
                    t2 * (r * jnp.sin(phi))[..., None] + n * lz[..., None])

            alpha_g = rough * rough
            a2_g = alpha_g * alpha_g
            f0 = 0.04 * (1.0 - met[..., None]) + alb * met[..., None]

            def _dot(x, y):
                return jnp.sum(x * y, -1)

            def _ggx_d(noh):
                den = noh * noh * (a2_g - 1.0) + 1.0
                return a2_g / jnp.maximum(jnp.pi * den * den, 1e-9)

            def brdf_at(dirn):
                """Cook-Torrance diffuse+GGX toward `dirn` (H,W,3)."""
                nol = jnp.maximum(_dot(n, dirn), 0.0)
                h = dirn + vv
                h = h * jax.lax.rsqrt(jnp.maximum(
                    jnp.sum(h * h, -1, keepdims=True), 1e-9))
                noh = jnp.maximum(_dot(n, h), 0.0)
                loh = jnp.maximum(_dot(dirn, h), 0.0)
                nov = jnp.maximum(_dot(n, vv), 1e-4)
                dist = _ggx_d(noh)
                vis = 0.5 / jnp.maximum(
                    nol * (nov * (1.0 - alpha_g) + alpha_g) +
                    nov * (nol * (1.0 - alpha_g) + alpha_g), 1e-4)
                fres = ((1.0 - loh) ** 5)[..., None]
                spec = (dist * vis)[..., None] * (f0 + (1.0 - f0) * fres)
                diff = alb * (1.0 - met[..., None]) / jnp.pi
                return (diff + spec * use_spec) * (nol > 0.0)[..., None]

            if use_spec:
                ps = jnp.clip(met + 0.5 * (1.0 - rough), 0.0, 0.9)
                # GGX half-vector sample around n, reflect v
                ct_h = jnp.sqrt(jnp.maximum(
                    (1.0 - u1) / jnp.maximum(
                        1.0 + (a2_g - 1.0) * u1, 1e-9), 0.0))
                st_h = jnp.sqrt(jnp.maximum(1.0 - ct_h * ct_h, 0.0))
                hvec = (t1 * (st_h * jnp.cos(phi))[..., None] +
                        t2 * (st_h * jnp.sin(phi))[..., None] +
                        n * ct_h[..., None])
                sdir = 2.0 * _dot(vv, hvec)[..., None] * hvec - vv
                u_lobe = _hash01(pix_id * jnp.uint32(4) + jnp.uint32(5) +
                                 frame * jnp.uint32(0x27D4EB2F))
                spec_take = u_lobe < ps
                bdir = jnp.where(spec_take[..., None], sdir, cdir)

                def pdf_mix(dirn):
                    pdf_d = jnp.maximum(_dot(n, dirn), 0.0) / jnp.pi
                    h = dirn + vv
                    h = h * jax.lax.rsqrt(jnp.maximum(
                        jnp.sum(h * h, -1, keepdims=True), 1e-9))
                    noh = jnp.maximum(_dot(n, h), 0.0)
                    voh = jnp.maximum(_dot(vv, h), 1e-4)
                    pdf_s = _ggx_d(noh) * noh / (4.0 * voh)
                    return (1.0 - ps) * pdf_d + ps * pdf_s
            else:
                bdir = cdir

                def pdf_mix(dirn):
                    return jnp.maximum(_dot(n, dirn), 0.0) / jnp.pi

            # --- trace the bounce ray (chunked; soup from prep) ---
            from bevy_tpu.render.pathtracer import intersect_chunk
            v0, e1, e2 = holder["v0"], holder["e1"], holder["e2"]
            sn, salb, semi = holder["n"], holder["alb"], holder["emi"]
            p = height * width
            orig = (wp + n * 1e-2).reshape(p, 3)
            dirs = bdir.reshape(p, 3)
            pad = (-p) % chunk
            nch = (p + pad) // chunk

            def seg(args):
                o, d = args
                return intersect_chunk(o, d, v0, e1, e2)

            t_hit, tri = jax.lax.map(seg, (
                jnp.pad(orig, ((0, pad), (0, 0))).reshape(nch, chunk, 3),
                jnp.pad(dirs, ((0, pad), (0, 0))).reshape(nch, chunk, 3)))
            t_hit = t_hit.reshape(-1)[:p].reshape(z.shape)
            tri = tri.reshape(-1)[:p].reshape(z.shape)
            hit = geom & (t_hit < 3.3e38)
            hp = wp + bdir * jnp.where(hit, t_hit, 0.0)[..., None]
            hn = sn[tri] * jnp.where(
                jnp.sum(sn[tri] * bdir, -1) > 0, -1.0, 1.0)[..., None]

            # --- outgoing radiance at the hit: emissive + one-light
            #     direct estimate + cached multi-bounce irradiance ---
            lpos = plight.global_transform.translation
            lcol = plight.point_light.color * \
                plight.point_light.intensity[:, None]
            lrng = plight.point_light.range
            lmask = plight.mask
            nl = lpos.shape[0]
            alive_idx = jnp.where(lmask, jnp.arange(nl, dtype=jnp.int32), nl)
            compact = jnp.arange(nl, dtype=jnp.int32)[jnp.argsort(alive_idx)]
            n_alive = jnp.sum(lmask.astype(jnp.int32))
            u3 = _hash01(pix_id * jnp.uint32(4) + jnp.uint32(2) +
                         frame * jnp.uint32(0x1B56C4E9))
            draw = jnp.minimum(
                (u3 * jnp.maximum(n_alive, 1)).astype(jnp.int32),
                jnp.maximum(n_alive - 1, 0))
            li = compact[draw]
            d = lpos[li] - hp
            d2 = jnp.sum(d * d, -1)
            ldir = d * jax.lax.rsqrt(jnp.maximum(d2, 1e-9))[..., None]
            rng2 = jnp.maximum(lrng[li] * lrng[li], 1e-9)
            win = jnp.clip(1.0 - (d2 / rng2) ** 2, 0.0, 1.0)
            atten = win * win / (d2 + 1.0)
            nol = jnp.maximum(jnp.sum(hn * ldir, -1), 0.0)
            l_f = jnp.maximum(n_alive, 1).astype(jnp.float32)
            direct_hit = (salb[tri] / jnp.pi) * lcol[li] * \
                (atten * nol * l_f * lmask[li])[..., None]

            # --- world cache (ref: world_cache_*.wesl): decay, update
            #     a budget of live cells (DI-RIS + one cache-hop GI),
            #     then query at this frame's bounce hits — cached E is
            #     multi-bounce energy accumulated across frames ---
            if use_cache:
                from bevy_tpu.render.world_cache import (
                    cache_decay, cache_query, cache_update)
                cd = cache_decay({k_: getattr(cache, k_) for k_ in
                                  ("checksum", "life", "radiance",
                                   "samples", "lum_delta", "pos",
                                   "normal")})
                lights_d = {"pos": lpos, "col": lcol, "rng": lrng,
                            "mask": lmask}
                soup_d = {"v0": v0, "e1": e1, "e2": e2, "n": sn,
                          "alb": salb, "emi": semi}
                cd = cache_update(
                    cd, frame, lights_d, soup=soup_d,
                    budget=cache_budget, view_pos=cam_pos,
                    base=cache_base, lod_scale=cache_lod,
                    shadow_chunk=chunk)
                uq = _hash01(pix_id * jnp.uint32(4) + jnp.uint32(6) +
                             frame * jnp.uint32(0x165667B1))
                cd, e_hit, _ = cache_query(
                    cd, hp, hn, cam_pos, uq, base=cache_base,
                    lod_scale=cache_lod, active=hit)
                for k_ in cd:
                    setattr(cache, k_, cd[k_])
                cache_term = (salb[tri] / jnp.pi) * e_hit
            else:
                cache_term = 0.0
            lr_new = (semi[tri] + direct_hit + cache_term) * \
                hit[..., None]

            # --- per-pixel reservoir. Target p-hat(s) =
            #     lum(brdf(dir_s) * L_s) * cos_s (the full-brdf target
            #     keeps specular-bright samples alive); candidate pdf is
            #     the cosine/GGX mixture q(dir) ---
            def _lum(c):
                return (0.2126 * c[..., 0] + 0.7152 * c[..., 1] +
                        0.0722 * c[..., 2])

            def _dir_to(pt):
                dvec = pt - wp
                dist = jnp.sqrt(jnp.maximum(jnp.sum(dvec * dvec, -1),
                                            1e-12))
                return dvec / dist[..., None]

            cos_new = jnp.maximum(jnp.sum(n * bdir, -1), 0.0)
            ph_new = _lum(brdf_at(bdir) * lr_new) * cos_new
            w_new = ph_new / jnp.maximum(pdf_mix(bdir), 1e-6)
            # temporal reuse keyed on depth persistence
            prev_ok = (jnp.abs(gi.z - z) < 1e-3) & (gi.m > 0) & geom
            dir_prev = _dir_to(gi.hp)
            cos_prev = jnp.maximum(jnp.sum(n * dir_prev, -1), 0.0)
            ph_prev = _lum(brdf_at(dir_prev) * gi.lr) * cos_prev * prev_ok
            m_prev = jnp.minimum(gi.m, gi_cap) * prev_ok
            w_prev = ph_prev * gi.w * m_prev
            wsum = w_new + w_prev
            u4 = _hash01(pix_id * jnp.uint32(4) + jnp.uint32(3) +
                         frame * jnp.uint32(0x85EBCA6B))
            take_prev = (u4 * wsum < w_prev) & (w_prev > 0)
            hp_fin = jnp.where(take_prev[..., None], gi.hp, hp)
            lr_fin = jnp.where(take_prev[..., None], gi.lr, lr_new)
            m_fin = m_prev + 1.0
            dir_fin = _dir_to(hp_fin)
            fcos = jnp.maximum(jnp.sum(n * dir_fin, -1), 0.0)
            f_fin = brdf_at(dir_fin)
            ph_fin = _lum(f_fin * lr_fin) * fcos
            w_fin = jnp.where(ph_fin > 0,
                              wsum / jnp.maximum(m_fin * ph_fin, 1e-9),
                              0.0)

            # estimate: f(y) * L(y) * cos(y) * W
            indirect = f_fin * lr_fin * (w_fin * fcos)[..., None]
            if use_denoise:
                indirect = atrous_denoise(indirect, z, n, geom)
            rgb = jnp.moveaxis(target.color[:3], 0, -1) + \
                jnp.where(geom[..., None], indirect, 0.0)
            target.color = jnp.concatenate(
                [jnp.moveaxis(rgb, -1, 0),
                 target.color[3:4]], 0)

            gi.hp = jnp.where(geom[..., None], hp_fin, gi.hp)
            gi.lr = jnp.where(geom[..., None], lr_fin, gi.lr)
            gi.wsum = wsum
            gi.m = jnp.where(geom, m_fin, 0.0)
            gi.w = jnp.where(geom, w_fin, 0.0)
            gi.z = z

        app.add_systems(Render, solari_gi, in_set=SHADE_SET,
                        after="solari_di")
