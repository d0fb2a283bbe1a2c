"""Directional shadow mapping (reference twin: bevy_pbr shadow pass —
`src/render/light.rs` shadow views + depth-only raster; single-cascade
subset of the cascade system, `bevy_light/src/cascade.rs`).

Pipeline: an orthographic light-view pass rasterizes scene depth into the
shadow map (reverse-z, same triangle kernel); the deferred shade step
reconstructs each pixel's light-space position in XLA, compares against the
gathered map depth (one H×W gather, outside the kernel), and hands the
resulting shadow factor plane to the shade kernel which attenuates the
directional light.
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


def make_shadow_pass(plugin, size, extent, distance, tile_h=32, tile_w=128,
                     pairs_per_tri=2, max_per_tile=512, interpret=False):
    """Depth-only pass over the mesh plugin's uniform groups from the first
    directional light's view."""
    from bevy_tpu.render.mesh3d import raster_batched
    from bevy_tpu.render.camera import pick_camera
    from bevy_tpu.transform import GlobalTransform

    mesh_plugin = plugin

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
                    target=ResMut(RenderTarget.RESOURCE)):
        li, has_light = pick_camera(light.mask)
        lvp = light_view_proj(light.global_transform.rotation[li],
                              (0.0, 0.0, 0.0), extent, distance)
        groups = mesh_plugin._groups or []
        t = _Target()
        t.color = jnp.zeros((4, size, size), jnp.float32)
        t.depth = target.shadow_depth
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
        target.shadow_depth = t.depth
        target.shadow_vp = lvp

    return shadow_pass


def shadow_factor(world_xyz, shadow_depth, shadow_vp, bias=2e-3):
    """(H, W) lit factor from world positions (H, W, 3) — the XLA half of
    the lookup (one gather), consumed by the shade kernel as a plane."""
    size = shadow_depth.shape[0]
    h, w = world_xyz.shape[:2]
    ph = jnp.concatenate([world_xyz,
                          jnp.ones((h, w, 1), jnp.float32)], -1)
    clip = jnp.einsum("ij,hwj->hwi", shadow_vp, ph)
    x = clip[..., 0]
    y = clip[..., 1]
    z = clip[..., 2]
    ix = jnp.clip(((x * 0.5 + 0.5) * size).astype(jnp.int32), 0, size - 1)
    iy = jnp.clip(((0.5 - y * 0.5) * size).astype(jnp.int32), 0, size - 1)
    inside = (jnp.abs(x) < 1.0) & (jnp.abs(y) < 1.0)
    occluder = shadow_depth[iy, ix]
    # reverse-z: nearer to light = larger; occluded when something closer
    # to the light than this pixel was rasterized into the map
    lit = (occluder <= z + bias) | ~inside
    return lit.astype(jnp.float32)


class ShadowPlugin(Plugin):
    """ref: the shadow half of PbrPlugin. Requires Mesh3dPlugin(deferred)
    + DeferredLightingPlugin; `extent` is the half-size of the shadowed
    world region around the origin (single cascade)."""

    def __init__(self, mesh_plugin, size=1024, extent=60.0, distance=80.0,
                 backend="auto"):
        self.mesh_plugin = mesh_plugin
        self.size = size
        self.extent = extent
        self.distance = distance
        self.backend = backend

    def build(self, app):
        import jax

        backend = self.backend
        if backend == "auto":
            backend = "pallas" if jax.default_backend() not in ("cpu", "gpu") \
                else "pallas_interpret"
        interpret = backend == "pallas_interpret"
        store = app.world.state["res"][RenderTarget.RESOURCE]
        store["shadow_depth"] = jnp.zeros((self.size, self.size), jnp.float32)
        store["shadow_vp"] = jnp.eye(4, dtype=jnp.float32)
        app.world.structure_version += 1
        app.add_systems(Render, clear_shadow_map, in_set=CLEAR_SET)
        app.add_systems(Render,
                        make_shadow_pass(self.mesh_plugin, self.size,
                                         self.extent, self.distance,
                                         interpret=interpret),
                        in_set=PASS_SET, before="mesh_pass")
