"""Deferred lighting plugin (reference twin: bevy's deferred path
`bevy_core_pipeline/src/deferred/` + clustered light binning
`bevy_light/src/cluster/assign.rs` + PointLight `bevy_light/src/point_light.rs`).

Geometry passes write the G-buffer (albedo/normal/emissive + reverse-z
depth); this plugin bins point lights into raster-aligned screen tiles and
resolves lighting in one Pallas kernel (ops/shade_pallas.py). Enable by
constructing geometry plugins with deferred=True and adding
DeferredLightingPlugin.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from bevy_tpu.app.main_schedule import Render
from bevy_tpu.app.plugin import Plugin
from bevy_tpu.ecs.component import component, field
from bevy_tpu.ecs.query import Query, Read, Res, ResMut
from bevy_tpu.ecs.system import system
from bevy_tpu.math.quat import quat_rotate_vec3
from bevy_tpu.render.camera import (
    Camera3d, perspective_infinite_reverse, pick_camera, view_matrix,
)
from bevy_tpu.render.mesh3d import AmbientLight, DirectionalLight
from bevy_tpu.render.plugin import CLEAR_SET, SHADE_SET, ClearColor, RenderTarget


@component
class PointLight:
    """ref: PointLight — color, intensity (normalized), range cutoff."""
    color = field(3, default=(1.0, 1.0, 1.0))
    intensity = field((), jnp.float32, default=1.0)
    range = field((), jnp.float32, default=20.0)
    shadows = field((), jnp.int32)  # 1 = shadow-casting (PointShadowPlugin)


@component
class SpotLight:
    """ref: SpotLight — cone along the entity's -Z axis; angles are
    half-angles in radians (inner fully lit, smooth falloff to outer)."""
    color = field(3, default=(1.0, 1.0, 1.0))
    intensity = field((), jnp.float32, default=1.0)
    range = field((), jnp.float32, default=20.0)
    inner_angle = field((), jnp.float32, default=0.3)
    outer_angle = field((), jnp.float32, default=0.5)
    shadows = field((), jnp.int32)   # 1 = shadow-casting (SpotShadowPlugin)


@component
class RectLight:
    """Rectangular area light emitting from one face of a w×h rect in
    the entity's XY plane along -Z (ref: bevy_light/src/rect_light.rs).
    Shaded with the representative-point approximation: each fragment is
    lit from the nearest point on the rect, one-sided."""
    color = field(3, default=(1.0, 1.0, 1.0))
    intensity = field((), jnp.float32, default=1.0)
    range = field((), jnp.float32, default=20.0)
    width = field((), jnp.float32, default=1.0)
    height = field((), jnp.float32, default=1.0)


@system(name="clear_gbuffer")
def clear_gbuffer(target=ResMut(RenderTarget.RESOURCE)):
    target.gbuffer = jnp.zeros_like(target.gbuffer)


def make_deferred_shade(width, height, tile_h=32, tile_w=128,
                        pairs_per_light=4, max_lights_per_tile=256,
                        backend="auto", world=None, shards=None):
    from bevy_tpu.transform import GlobalTransform

    if backend == "auto":
        backend = "pallas" if jax.default_backend() not in ("cpu", "gpu") \
            else "pallas_interpret"
    interpret = backend == "pallas_interpret"

    @system(name="deferred_shade")
    def deferred_shade_sys(cam=Query(Read(Camera3d), Read(GlobalTransform)),
                           dlight=Query(Read(DirectionalLight),
                                        Read(GlobalTransform)),
                           plight=Query(Read(PointLight), Read(GlobalTransform)),
                           slight=Query(Read(SpotLight), Read(GlobalTransform)),
                           rlight=Query(Read(RectLight), Read(GlobalTransform)),
                           amb=Res(AmbientLight),
                           clear=Res(ClearColor),
                           target=ResMut(RenderTarget.RESOURCE),
                           stats=ResMut("render_stats")):
        from bevy_tpu.ops.shade_pallas import bin_lights, deferred_shade

        ci, has_cam = pick_camera(cam.mask)
        cam_gt = cam.global_transform
        view = view_matrix(cam_gt.translation[ci], cam_gt.rotation[ci],
                           cam_gt.scale[ci])
        near = cam.camera3d.near[ci]
        proj = perspective_infinite_reverse(
            cam.camera3d.fov[ci], width / height, near)
        vp = proj @ view
        inv_vp = jnp.linalg.inv(vp)

        # --- light records (see shade_pallas LF layout). TRACE-TIME
        # specialization: worlds with no SpotLight rows build 8-field
        # records and the cone-free kernel (the 0→nonzero transition bumps
        # structure_version, retracing into the full path) ---
        has_spots = world is None or world.component_rows(SpotLight) > 0
        # rect (area) lights widen records to 24 fields (u/v axes + half
        # extents) and force the full record layout (dir is the rect
        # normal); worlds without RectLight rows pay nothing
        has_rect = world is not None and \
            world.component_rows(RectLight) > 0
        wide = has_spots or has_rect
        # same trace-time specialization for the clearcoat lobe: worlds
        # whose materials all have clearcoat == 0 at trace time compile
        # the coat-free kernel (a later in-jit clearcoat edit needs a
        # structural change to retrace, like the alpha phase split)
        has_cc = True
        has_aniso = False
        has_refl = False
        has_tint = False
        if world is not None:
            from bevy_tpu.render.mesh3d import MeshMaterial as _MM
            try:
                import numpy as _np
                has_cc = bool(_np.any(_np.asarray(jax.device_get(
                    world.column(_MM, "clearcoat"))) > 0.0))
                has_aniso = bool(_np.any(_np.asarray(jax.device_get(
                    world.column(_MM, "anisotropy_strength"))) > 0.0))
                has_refl = bool(_np.any(_np.abs(_np.asarray(
                    jax.device_get(world.column(_MM, "reflectance")))
                    - 0.5) > 1e-6))
                _t = _np.asarray(jax.device_get(
                    world.column(_MM, "specular_tint")))
                # unset pool rows are zeros: tinted = set AND non-white
                has_tint = bool(_np.any(
                    (_np.abs(_t - 1.0).max(-1) > 1e-6) &
                    (_np.abs(_t).sum(-1) > 1e-6)))
            except KeyError:
                has_cc = False
        np_ = plight.mask.shape[0]
        p_pos = plight.global_transform.translation
        p_rng = plight.point_light.range
        p_col = plight.point_light.color * plight.point_light.intensity[:, None]
        if wide:
            p_rec = jnp.concatenate([
                p_pos, p_col, p_rng[:, None], jnp.zeros((np_, 1)),
                jnp.zeros((np_, 3)), jnp.full((np_, 1), -2.0),
                jnp.ones((np_, 1)), jnp.zeros((np_, 3))], axis=1)
            ns = slight.mask.shape[0]
            s_pos = slight.global_transform.translation
            s_rng = slight.spot_light.range
            s_col = slight.spot_light.color * \
                slight.spot_light.intensity[:, None]
            s_dir = quat_rotate_vec3(slight.global_transform.rotation,
                                     jnp.asarray([0.0, 0.0, -1.0]))
            cos_o = jnp.cos(slight.spot_light.outer_angle)
            inv_co = 1.0 / jnp.maximum(
                jnp.cos(slight.spot_light.inner_angle) - cos_o, 1e-4)
            s_rec = jnp.concatenate([
                s_pos, s_col, s_rng[:, None], jnp.zeros((ns, 1)),
                s_dir, cos_o[:, None], inv_co[:, None],
                jnp.zeros((ns, 3))], axis=1)
            records = jnp.concatenate([p_rec, s_rec])
            pos = jnp.concatenate([p_pos, s_pos])
            rng = jnp.concatenate([p_rng, s_rng])
            # shadow-casting spots shade in the XLA pass of
            # SpotShadowPlugin instead of the binned kernel
            s_mask = slight.mask & (slight.spot_light.shadows == 0)
            p_mask = plight.mask & (plight.point_light.shadows == 0)
            lmask = jnp.concatenate([p_mask, s_mask])
        else:
            records = jnp.concatenate([
                p_pos, p_col, p_rng[:, None], jnp.zeros((np_, 1))], axis=1)
            pos, rng = p_pos, p_rng
            lmask = plight.mask & (plight.point_light.shadows == 0)

        if has_rect:
            records = jnp.pad(records, ((0, 0), (0, 24 - records.shape[1])))
            nr = rlight.mask.shape[0]
            r_pos = rlight.global_transform.translation
            rot = rlight.global_transform.rotation
            r_col = rlight.rect_light.color * \
                rlight.rect_light.intensity[:, None]
            r_rng = rlight.rect_light.range
            u_ax = quat_rotate_vec3(rot, jnp.asarray([1.0, 0.0, 0.0]))
            v_ax = quat_rotate_vec3(rot, jnp.asarray([0.0, 1.0, 0.0]))
            n_ax = quat_rotate_vec3(rot, jnp.asarray([0.0, 0.0, -1.0]))
            hw = rlight.rect_light.width[:, None] * 0.5
            hh = rlight.rect_light.height[:, None] * 0.5
            r_rec = jnp.concatenate([
                r_pos, r_col, r_rng[:, None], jnp.zeros((nr, 1)),
                n_ax, jnp.full((nr, 1), -2.0), jnp.ones((nr, 1)),
                jnp.zeros((nr, 2)), jnp.ones((nr, 1)),   # slot 15: rect
                u_ax, v_ax, hw, hh], axis=1)
            records = jnp.concatenate([records, r_rec])
            pos = jnp.concatenate([pos, r_pos])
            # conservative binning radius: emission reaches `range` from
            # the NEAREST rect point, i.e. range + the rect half-diagonal
            rng = jnp.concatenate([
                rng, r_rng + jnp.sqrt(hw[:, 0] ** 2 + hh[:, 0] ** 2)])
            lmask = jnp.concatenate([lmask, rlight.mask])

        # --- conservative screen AABBs via the view-space bounding
        # box (r5 fix: the old central-projection radius blew up to a
        # FULL-SCREEN rect for every light near the camera PLANE even
        # when laterally far away — the bench scene's below-camera
        # stripe was ~3k such lights x 230 tiles = ~750k junk pairs per
        # frame that displaced real lights past the pair cap). The
        # extremes of (vx±r)/z over z in [max(vz-r, near), vz+r] sit at
        # box corners, so four corner projections bound the sphere
        # exactly-conservatively; full-screen only when the camera is
        # truly inside the sphere. ---
        ph = jnp.concatenate([pos, jnp.ones((pos.shape[0], 1))], 1)
        vz = -(view[2] @ ph.T)                                # view depth >0 ahead
        vx = view[0] @ ph.T
        vy = view[1] @ ph.T
        f = 1.0 / jnp.tan(cam.camera3d.fov[ci] * 0.5)
        aspect = width / height
        zmin = jnp.maximum(vz - rng, near)
        zmax = jnp.maximum(vz + rng, near)

        def _px_range(vc, half_f, span):
            # min/max pixel coordinate over the 4 (vc±r, z∈{zmin,zmax})
            # corners; ndc = half_f * vc/z, pixel = (±ndc*0.5+0.5)*span
            lo = jnp.minimum(jnp.minimum((vc - rng) / zmin,
                                         (vc - rng) / zmax),
                             jnp.minimum((vc + rng) / zmin,
                                         (vc + rng) / zmax))
            hi = jnp.maximum(jnp.maximum((vc - rng) / zmin,
                                         (vc - rng) / zmax),
                             jnp.maximum((vc + rng) / zmin,
                                         (vc + rng) / zmax))
            return lo * half_f, hi * half_f

        xlo_n, xhi_n = _px_range(vx, f / aspect, width)
        ylo_n, yhi_n = _px_range(vy, f, height)
        x0b = (xlo_n * 0.5 + 0.5) * width
        x1b = (xhi_n * 0.5 + 0.5) * width
        y0b = (0.5 - yhi_n * 0.5) * height
        y1b = (0.5 - ylo_n * 0.5) * height
        cx = (x0b + x1b) * 0.5
        cy = (y0b + y1b) * 0.5
        r_px = jnp.maximum(x1b - x0b, y1b - y0b) * 0.5
        # camera INSIDE the sphere: every pixel may be lit — full screen
        engulf = (vx * vx + vy * vy + vz * vz) <= rng * rng
        big = jnp.asarray(max(width, height) * 2.0, jnp.float32)
        r_px = jnp.where(engulf, big, r_px)
        cx = jnp.where(engulf, width * 0.5, cx)
        cy = jnp.where(engulf, height * 0.5, cy)
        active = lmask & has_cam & (vz + rng > near)

        if shards is not None:
            # row-band sharding: bin over the n*tile_h-padded grid so
            # per-device tile-row slices line up (parallel/raster.py)
            n_dev = shards.devices.size
            band = (height + n_dev * tile_h - 1) // (n_dev * tile_h) \
                * tile_h
            hp = band * n_dev // tile_h
        else:
            hp = (height + tile_h - 1) // tile_h
        wp = (width + tile_w - 1) // tile_w
        table, counts, lstats = bin_lights(
            vz, jnp.stack([cx, cy], 1), r_px, active, hp, wp,
            tile_h, tile_w, pairs_per_light, max_lights_per_tile, records)

        di, has_dl = pick_camera(dlight.mask)
        ldir = quat_rotate_vec3(dlight.global_transform.rotation[di],
                                jnp.asarray([0.0, 0.0, -1.0]))
        lcol = dlight.directional_light.color[di] * \
            dlight.directional_light.illuminance[di] * has_dl
        params = jnp.concatenate([
            inv_vp.reshape(16), ldir, lcol, amb.color * amb.brightness,
            jnp.asarray([width, height], jnp.float32), clear.color,
            cam_gt.translation[ci], jnp.zeros(6, jnp.float32)])

        # directional shadow factor (when a ShadowPlugin installed a map):
        # reconstruct world positions in XLA and do the one H×W map gather
        # here; the kernel consumes the factor as a plane
        shadow = None
        try:
            shadow_depth = target.shadow_depth
            shadow_vp = target.shadow_vp
        except AttributeError:
            shadow_depth = None
        if shadow_depth is not None:
            from bevy_tpu.render.shadow import shadow_factor
            ys = (jnp.arange(height, dtype=jnp.float32) + 0.5)[:, None]
            xs = (jnp.arange(width, dtype=jnp.float32) + 0.5)[None, :]
            ndx = 2.0 * xs / width - 1.0
            ndy = 1.0 - 2.0 * ys / height
            z = target.depth
            ndc = jnp.stack([jnp.broadcast_to(ndx, z.shape),
                             jnp.broadcast_to(ndy, z.shape), z,
                             jnp.ones_like(z)], -1)
            wh = jnp.einsum("ij,hwj->hwi", inv_vp, ndc)
            world_pos = wh[..., :3] / jnp.where(
                jnp.abs(wh[..., 3:4]) > 1e-9, wh[..., 3:4], 1.0)
            shadow = shadow_factor(world_pos, shadow_depth, shadow_vp)
        if shards is not None:
            from bevy_tpu.parallel.raster import sharded_deferred_shade
            target.color = sharded_deferred_shade(
                shards, target.gbuffer, target.depth, table, counts,
                params, shadow, tile_h=tile_h, tile_w=tile_w,
                max_per_tile=max_lights_per_tile, interpret=interpret,
                spot=has_spots, rect=has_rect, clearcoat=has_cc,
                anisotropy=has_aniso, reflectance=has_refl,
                specular_tint=has_tint)
        else:
            target.color = deferred_shade(
                target.gbuffer, target.depth, table, counts, params, shadow,
                tile_h=tile_h, tile_w=tile_w,
                max_per_tile=max_lights_per_tile,
                interpret=interpret, spot=has_spots, rect=has_rect,
                clearcoat=has_cc, anisotropy=has_aniso,
                reflectance=has_refl, specular_tint=has_tint)
        stats.pair_overflow = stats.pair_overflow + lstats["light_pair_overflow"]
        stats.tile_overflow = stats.tile_overflow + lstats["light_tile_overflow"]

    return deferred_shade_sys


class DeferredLightingPlugin(Plugin):
    def __init__(self, tile_h=32, tile_w=128, pairs_per_light=4,
                 max_lights_per_tile=256, backend="auto", shards=None):
        # shards: None, a device count, or a jax.sharding.Mesh — row-band
        # multi-chip shade (same product knob as Mesh3dPlugin(shards=...))
        if shards is not None and not hasattr(shards, "devices"):
            from bevy_tpu.parallel import make_mesh
            shards = make_mesh(int(shards))
        self.cfg = dict(tile_h=tile_h, tile_w=tile_w,
                        pairs_per_light=pairs_per_light,
                        max_lights_per_tile=max_lights_per_tile,
                        backend=backend, shards=shards)

    def build(self, app):
        from bevy_tpu.render.plugin import RenderPlugin
        rp = next((p for p in app._plugins if isinstance(p, RenderPlugin)), None)
        if rp is None:
            raise RuntimeError("DeferredLightingPlugin requires RenderPlugin")
        app.world.register_component(PointLight)
        app.world.register_component(SpotLight)
        app.world.register_component(RectLight)
        store = app.world.state["res"][RenderTarget.RESOURCE]
        # 19 planes: albedo rgba, normal, emissive, metallic, roughness,
        # clearcoat, ccr, anisotropy tangent xyz + strength (14:18),
        # reflectance (18); +3 tint planes (19:22) only when some
        # material tints (prepare hook below — trace-time specialized,
        # so the default G-buffer pays nothing)
        store["gbuffer"] = jnp.zeros((19, rp.height, rp.width), jnp.float32)
        app.world.structure_version += 1

        def _size_gbuffer(world):
            import numpy as _np
            from bevy_tpu.render.mesh3d import MeshMaterial as _MM
            try:
                _t = _np.asarray(jax.device_get(
                    world.column(_MM, "specular_tint")))
                tinted = bool(_np.any(
                    (_np.abs(_t - 1.0).max(-1) > 1e-6) &
                    (_np.abs(_t).sum(-1) > 1e-6)))
            except KeyError:
                tinted = False
            if tinted:
                st = world.state["res"][RenderTarget.RESOURCE]
                st["gbuffer"] = jnp.zeros((22, rp.height, rp.width),
                                          jnp.float32)
                world.structure_version += 1

        app.add_prepare_hook(_size_gbuffer)
        app.add_systems(Render, clear_gbuffer, in_set=CLEAR_SET)
        app.add_systems(Render,
                        make_deferred_shade(rp.width, rp.height,
                                            world=app.world, **self.cfg),
                        in_set=SHADE_SET)
