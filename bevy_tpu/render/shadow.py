"""Directional shadow mapping with cascades (reference twin: bevy_pbr
shadow pass — `src/render/light.rs` shadow views + depth-only raster;
cascade splits after `bevy_light/src/cascade.rs` CascadeShadowConfig).

Pipeline: N orthographic light-view passes rasterize scene depth into
the cascade layers (reverse-z, the same depth-only raster as the main
pass), each cascade centered on the camera with a growing extent; the
deferred shade step reconstructs each pixel's light-space position in
XLA, picks the tightest cascade containing it, PCF-filters the gathered
map depth (4 taps), and hands the resulting shadow factor plane to the
shade kernel which attenuates the directional light.
"""

from __future__ import annotations

import jax.numpy as jnp

from bevy_tpu.app.main_schedule import Render
from bevy_tpu.app.plugin import Plugin
from bevy_tpu.ecs.query import Query, Read, ResMut
from bevy_tpu.ecs.system import system
from bevy_tpu.math.affine import TRS, trs_to_mat4
from bevy_tpu.math.quat import quat_rotate_vec3
from bevy_tpu.render.camera import view_matrix
from bevy_tpu.render.mesh3d import DirectionalLight, Mesh3d, MeshMaterial
from bevy_tpu.render.plugin import CLEAR_SET, PASS_SET, RenderTarget

SHADOW_RES = "shadow_map"


def ortho_reverse(extent, far):
    """(4,4) orthographic projection, reverse-z in [0,1] (near 0 → 1,
    far → 0), symmetric ±extent."""
    z = jnp.zeros(())
    o = jnp.ones(())
    return jnp.stack([
        jnp.stack([o / extent, z, z, z]),
        jnp.stack([z, o / extent, z, z]),
        jnp.stack([z, z, o / (far), o]),   # z_ndc = (view_z + far)/far
        jnp.stack([z, z, z, o]),
    ])


def light_view_proj(light_rot, focus, extent, distance):
    """World→light-clip for a directional light looking along its -Z from
    `distance` behind the focus point."""
    fwd = quat_rotate_vec3(light_rot, jnp.asarray([0.0, 0.0, -1.0]))
    eye = jnp.asarray(focus, jnp.float32) - fwd * distance
    view = view_matrix(eye, light_rot, jnp.ones(3))
    proj = ortho_reverse(jnp.asarray(extent, jnp.float32),
                         jnp.asarray(distance * 2.0, jnp.float32))
    return proj @ view


@system(name="clear_shadow_map")
def clear_shadow_map(target=ResMut(RenderTarget.RESOURCE)):
    target.shadow_depth = jnp.zeros_like(target.shadow_depth)


def make_shadow_pass(plugin, size, extents, distance, tile_h=32, tile_w=128,
                     pairs_per_tri=2, max_per_tile=512, interpret=False):
    """Depth-only passes over the mesh plugin's uniform groups from the
    first directional light's view — one per cascade, each centered on
    the camera position with its own extent (ref: the per-cascade shadow
    views of light.rs + cascade.rs)."""
    from bevy_tpu.render.camera import Camera3d, pick_camera
    from bevy_tpu.render.mesh3d import raster_batched
    from bevy_tpu.transform import GlobalTransform

    mesh_plugin = plugin
    n_casc = len(extents)

    class _Stats:
        """Throwaway sink matching raster_batched's stats interface."""
        pair_overflow = jnp.zeros((), jnp.int32)
        tile_overflow = jnp.zeros((), jnp.int32)

    class _Target:
        pass

    @system(name="shadow_pass")
    def shadow_pass(q=Query(Read(Mesh3d), Read(MeshMaterial),
                            Read(GlobalTransform)),
                    light=Query(Read(DirectionalLight), Read(GlobalTransform)),
                    cam=Query(Read(Camera3d), Read(GlobalTransform)),
                    target=ResMut(RenderTarget.RESOURCE)):
        li, has_light = pick_camera(light.mask)
        ci, has_cam = pick_camera(cam.mask)
        focus = cam.global_transform.translation[ci] * has_cam
        groups = mesh_plugin._groups or []
        depths, vps = [], []
        for casc in range(n_casc):
            lvp = light_view_proj(light.global_transform.rotation[li],
                                  focus, extents[casc], distance)
            t = _Target()
            t.color = jnp.zeros((4, size, size), jnp.float32)
            t.depth = target.shadow_depth[casc]
            st = _Stats()
            for grp in groups:
                m = mesh_plugin.pool.meshes[grp["mesh"]]
                vc = m.num_vertices
                rows = jnp.asarray(grp["rows"])
                gt_r = q.global_transform.rotation[rows]
                mats = trs_to_mat4(TRS(
                    translation=q.global_transform.translation[rows],
                    rotation=gt_r, scale=q.global_transform.scale[rows]))
                mvp = jnp.einsum("ij,njk->nik", lvp, mats)
                ph = jnp.concatenate([jnp.asarray(m.positions),
                                      jnp.ones((vc, 1), jnp.float32)], 1)
                clip = jnp.einsum("nij,vj->nvi", mvp, ph)
                nrm = quat_rotate_vec3(gt_r[:, None, :],
                                       jnp.asarray(m.normals)[None])
                ok = q.mask[rows] & has_light
                raster_batched(
                    clip, nrm, m.triangles, ok,
                    q.mesh_material.base_color[rows],
                    q.mesh_material.emissive[rows],
                    jnp.zeros(16, jnp.float32), t, st, depth_only=True,
                    width=size, height=size, tile_h=tile_h, tile_w=tile_w,
                    pairs_per_tri=pairs_per_tri, max_per_tile=max_per_tile,
                    interpret=interpret)
            depths.append(t.depth)
            vps.append(lvp)
        target.shadow_depth = jnp.stack(depths)
        target.shadow_vp = jnp.stack(vps)

    return shadow_pass


def shadow_factor(world_xyz, shadow_depth, shadow_vp, bias=2e-3, pcf=True):
    """(H, W) lit factor from world positions (H, W, 3) — the XLA half of
    the lookup, consumed by the shade kernel as a plane. shadow_depth is
    (N, S, S) cascade layers ((S, S) accepted for compatibility); each
    pixel uses the tightest cascade containing its light-space position
    and PCF-averages 4 neighbor taps (ref: the cascade pick of
    shadows.wesl + sample_shadow_map PCF)."""
    if shadow_depth.ndim == 2:
        shadow_depth = shadow_depth[None]
        shadow_vp = shadow_vp.reshape(1, 4, 4)
    n_casc, size = shadow_depth.shape[0], shadow_depth.shape[1]
    h, w = world_xyz.shape[:2]
    ph = jnp.concatenate([world_xyz,
                          jnp.ones((h, w, 1), jnp.float32)], -1)
    clip = jnp.einsum("nij,hwj->nhwi", shadow_vp, ph)    # (N, H, W, 4)
    x, y, z = clip[..., 0], clip[..., 1], clip[..., 2]
    inside = (jnp.abs(x) < 0.999) & (jnp.abs(y) < 0.999)
    # tightest containing cascade: first along N (extents ascend)
    first = jnp.argmax(inside, axis=0)                   # (H, W)
    any_in = jnp.any(inside, axis=0)
    hw_y = jnp.arange(h)[:, None]
    hw_x = jnp.arange(w)[None, :]
    xs = x[first, hw_y, hw_x]
    ys = y[first, hw_y, hw_x]
    zs = z[first, hw_y, hw_x]
    fx = (xs * 0.5 + 0.5) * size
    fy = (0.5 - ys * 0.5) * size
    # slope-scaled bias: one texel of light-space travel changes surface
    # depth by up to texel_world * dz/dworld — derive both scales from
    # the projection rows so PCF neighbor taps don't self-shadow slopes
    s_xy = jnp.linalg.norm(shadow_vp[:, 0, :3], axis=-1)   # 1/extent
    s_z = jnp.linalg.norm(shadow_vp[:, 2, :3], axis=-1)    # 1/far
    texel_bias = 4.0 * s_z / (size * jnp.maximum(s_xy, 1e-8))
    b = bias + texel_bias[first]
    taps = ((0, 0), (1, 0), (0, 1), (1, 1)) if pcf else ((0, 0),)
    lit_acc = 0.0
    for dy, dx in taps:
        ix = jnp.clip(fx.astype(jnp.int32) + dx, 0, size - 1)
        iy = jnp.clip(fy.astype(jnp.int32) + dy, 0, size - 1)
        occluder = shadow_depth[first, iy, ix]
        # reverse-z: nearer to light = larger; occluded when something
        # closer to the light than this pixel is in the map
        lit_acc = lit_acc + (occluder <= zs + b).astype(jnp.float32)
    lit = lit_acc / len(taps)
    return jnp.where(any_in, lit, 1.0)


class ShadowPlugin(Plugin):
    """ref: the shadow half of PbrPlugin + CascadeShadowConfig. Requires
    Mesh3dPlugin(deferred) + DeferredLightingPlugin; `extent` is the
    half-size of the LARGEST cascade around the camera; `cascades` maps
    with `cascade_ratio` to tighter near cascades (extent * ratio^k)."""

    def __init__(self, mesh_plugin, size=1024, extent=60.0, distance=80.0,
                 backend="auto", cascades=1, cascade_ratio=0.35):
        self.mesh_plugin = mesh_plugin
        self.size = size
        self.extents = [extent * cascade_ratio ** (cascades - 1 - i)
                        for i in range(cascades)]
        self.distance = distance
        self.backend = backend

    def build(self, app):
        import jax

        backend = self.backend
        if backend == "auto":
            backend = "pallas" if jax.default_backend() not in ("cpu", "gpu") \
                else "pallas_interpret"
        interpret = backend == "pallas_interpret"
        n = len(self.extents)
        store = app.world.state["res"][RenderTarget.RESOURCE]
        store["shadow_depth"] = jnp.zeros((n, self.size, self.size),
                                          jnp.float32)
        store["shadow_vp"] = jnp.broadcast_to(
            jnp.eye(4, dtype=jnp.float32), (n, 4, 4))
        app.world.structure_version += 1
        app.add_systems(Render, clear_shadow_map, in_set=CLEAR_SET)
        app.add_systems(Render,
                        make_shadow_pass(self.mesh_plugin, self.size,
                                         self.extents, self.distance,
                                         interpret=interpret),
                        in_set=PASS_SET, before="mesh_pass")
