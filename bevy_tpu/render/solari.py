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


class SolariPlugin(Plugin):
    """Realtime ReSTIR direct illumination over the deferred G-buffer.
    Use with Mesh3dPlugin(deferred=True) INSTEAD of
    DeferredLightingPlugin (it owns the shade position). Point lights
    only (the reference's realtime DI also samples emissive tris +
    directional via its own paths)."""

    def __init__(self, mesh_plugin, candidates=8, presample_k=32,
                 tile_px=16, temporal_cap=16.0, shadow_rays=False,
                 shadow_chunk=4096, backend="auto", gi=False,
                 gi_temporal_cap=32.0):
        self.mesh_plugin = mesh_plugin
        self.m = candidates
        self.k = presample_k
        self.tile_px = tile_px
        self.cap = temporal_cap
        self.shadow_rays = shadow_rays
        self.shadow_chunk = shadow_chunk
        self.gi = gi
        self.gi_cap = gi_temporal_cap

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
                      target=ResMut(RenderTarget.RESOURCE)):
            """One-bounce ReSTIR GI (ref: bevy_solari realtime GI —
            restir_gi.wesl: cosine path sample → shade hit → per-pixel
            reservoir with temporal reuse; the world-cache role is
            filled by the baked soup + per-hit direct estimate).
            Adds indirect diffuse into target.color after solari_di."""
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

            pix_id = (jnp.arange(height, dtype=jnp.uint32)[:, None] *
                      jnp.uint32(width) +
                      jnp.arange(width, dtype=jnp.uint32)[None, :])

            # --- cosine-weighted bounce direction around n ---
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
            bdir = (t1 * (r * jnp.cos(phi))[..., None] +
                    t2 * (r * jnp.sin(phi))[..., None] + n * lz[..., None])

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
            #     Lambert direct estimate (the world-cache stand-in) ---
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
            lr_new = (semi[tri] + direct_hit) * hit[..., None]

            # --- per-pixel reservoir. Target p-hat(s) = lum(L_s) *
            #     cos(n, dir_s); candidate pdf q = cos/pi, so the fresh
            #     stream weight p-hat/q = pi * lum (cos cancels) ---
            def _lum(c):
                return (0.2126 * c[..., 0] + 0.7152 * c[..., 1] +
                        0.0722 * c[..., 2])

            def _cos_to(pt):
                dvec = pt - wp
                dist = jnp.sqrt(jnp.maximum(jnp.sum(dvec * dvec, -1),
                                            1e-12))
                return jnp.maximum(jnp.sum(n * dvec, -1) / dist, 0.0)

            w_new = jnp.pi * _lum(lr_new)
            # temporal reuse keyed on depth persistence
            prev_ok = (jnp.abs(gi.z - z) < 1e-3) & (gi.m > 0) & geom
            ph_prev = _lum(gi.lr) * _cos_to(gi.hp) * prev_ok
            m_prev = jnp.minimum(gi.m, gi_cap) * prev_ok
            w_prev = ph_prev * gi.w * m_prev
            wsum = w_new + w_prev
            u4 = _hash01(pix_id * jnp.uint32(4) + jnp.uint32(3) +
                         frame * jnp.uint32(0x85EBCA6B))
            take_prev = (u4 * wsum < w_prev) & (w_prev > 0)
            hp_fin = jnp.where(take_prev[..., None], gi.hp, hp)
            lr_fin = jnp.where(take_prev[..., None], gi.lr, lr_new)
            m_fin = m_prev + 1.0
            fcos = _cos_to(hp_fin)
            ph_fin = _lum(lr_fin) * fcos
            w_fin = jnp.where(ph_fin > 0,
                              wsum / jnp.maximum(m_fin * ph_fin, 1e-9),
                              0.0)

            # estimate: f(y) * W with f = albedo/pi * L * cos
            # (single fresh sample sanity: W = pi*lum/(lum*cos) = pi/cos
            # -> indirect = albedo * L, the plain cosine-sampled MC term)
            indirect = alb * lr_fin * \
                (w_fin * fcos / jnp.pi)[..., None]
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
