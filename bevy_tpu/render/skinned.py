"""Skinned mesh rendering (reference twin: bevy_pbr's GPU skinning path —
`src/render/skin.rs:28,176` joint buffers, `skinning.wesl` vertex stage —
fused here with animation sampling into one batched pass; see
bevy_tpu/animation).

Vertex stage per instance n:  A(n,j) = VP · model(n) · global(n,j) · bindpose⁻¹
then per vertex v:            clip(n,v) = [Σ_j W(v,j) A(n,j)] · p(v)
W is the dense (VC, J) weight matrix — einsums over it run on the MXU (the
TPU form of the 4-influence weighted sum).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from bevy_tpu.animation import (
    AnimationPlayer, advance_players, bake_clips, compose_joints,
    sample_pose_blended, skin_matrices,
)
from bevy_tpu.app.main_schedule import Render, Update
from bevy_tpu.app.plugin import Plugin
from bevy_tpu.ecs.component import component, field
from bevy_tpu.ecs.query import Query, Read, Res, ResMut
from bevy_tpu.ecs.system import system
from bevy_tpu.math.affine import TRS, trs_to_mat4
from bevy_tpu.render.camera import (
    Camera3d, perspective_infinite_reverse, pick_camera, view_matrix,
)
from bevy_tpu.render.mesh3d import (
    AmbientLight, DirectionalLight, MeshMaterial, directional_light_vec,
    raster_batched,
)
from bevy_tpu.render.plugin import PASS_SET, RenderTarget


@component
class SkinnedMesh3d:
    """Marker binding an entity to the plugin's skinned mesh (ref:
    SkinnedMesh component; one skeleton+mesh per plugin instance)."""
    skin = field((), jnp.int32)


MAX_MORPHS = 8


@component
class MorphWeights:
    """Per-instance morph target weights (ref: bevy_mesh MorphWeights +
    the GPU morph path of bevy_pbr/src/render/morph.rs). Lane k scales
    the plugin's k-th position-delta target."""
    weights = field(MAX_MORPHS)


class SkinnedMeshPlugin(Plugin):
    """ref: the Mesh3d+SkinnedMesh+AnimationPlayer stack for one rig.
    `mesh` is a render.mesh.Mesh; `weights` a dense (VC, J) matrix;
    `clips` a list of animation.AnimationClip."""

    def __init__(self, skeleton, mesh, weights, clips, tile_h=32, tile_w=128,
                 pairs_per_tri=2, max_per_tile=256, backend="auto",
                 graph=None, morph_targets=None):
        self.skeleton = skeleton
        self.mesh = mesh
        self.weights = np.asarray(weights, np.float32)
        self.clips = clips
        # graph: an animation.graph.AnimationGraph; entities then carry
        # AnimationGraphPlayer instead of AnimationPlayer (ref:
        # AnimationGraphHandle + AnimationPlayer pairing)
        self.graph = graph
        # morph_targets: (K, VC, 3) position deltas; entities opt in with
        # a MorphWeights component (ref: bevy_mesh morph targets)
        self.morph_targets = (None if morph_targets is None else
                              np.asarray(morph_targets, np.float32))
        self._rows = np.zeros(0, np.int32)
        self.cfg = dict(tile_h=tile_h, tile_w=tile_w,
                        pairs_per_tri=pairs_per_tri,
                        max_per_tile=max_per_tile, backend=backend)

    @property
    def name(self):
        return f"SkinnedMeshPlugin<{id(self)}>"

    def build(self, app):
        import jax

        from bevy_tpu.render.plugin import RenderPlugin
        rp = next((p for p in app._plugins if isinstance(p, RenderPlugin)), None)
        if rp is None:
            raise RuntimeError("SkinnedMeshPlugin requires RenderPlugin")
        from bevy_tpu.transform import GlobalTransform, Transform
        for c in (SkinnedMesh3d, AnimationPlayer, MorphWeights, MeshMaterial,
                  DirectionalLight, Camera3d, Transform, GlobalTransform):
            app.world.register_component(c)
        app.init_resource(AmbientLight())
        if "render_stats" not in app.world.state["res"]:
            app.insert_resource("render_stats", {
                "pair_overflow": jnp.asarray(0, jnp.int32),
                "tile_overflow": jnp.asarray(0, jnp.int32),
            })
        clip_data, counts, rates = bake_clips(self.clips)
        app.insert_resource("anim_clips", {
            "data": clip_data, "counts": counts, "rates": rates})
        if self.graph is not None:
            from bevy_tpu.animation.graph import (
                AnimationGraphPlayer, advance_graph_players)
            app.world.register_component(AnimationGraphPlayer)
            app.add_systems(Update, advance_graph_players(
                [c.duration for c in self.clips], self.graph))
        else:
            app.add_systems(Update, advance_players(
                [c.duration for c in self.clips]))

        plugin = self

        def rebuild(world):
            plugin._rows = world.query_rows(SkinnedMesh3d).astype(np.int32)
            world.structure_version += 1

        app.add_prepare_hook(rebuild)

        cfg = dict(self.cfg)
        backend = cfg.pop("backend")
        if backend == "auto":
            backend = "pallas" if jax.default_backend() not in ("cpu", "gpu") \
                else "pallas_interpret"
        interpret = backend == "pallas_interpret"

        skeleton, mesh, weights = self.skeleton, self.mesh, self.weights
        w_dense = jnp.asarray(weights)
        mesh_ph = jnp.concatenate(
            [jnp.asarray(mesh.positions),
             jnp.ones((mesh.num_vertices, 1), jnp.float32)], 1)
        mesh_n = jnp.asarray(mesh.normals)
        width, height = rp.width, rp.height
        graph = self.graph
        if graph is not None:
            from bevy_tpu.animation.graph import AnimationGraphPlayer
            anim_comp = AnimationGraphPlayer
        else:
            anim_comp = AnimationPlayer

        morph_t = (None if self.morph_targets is None
                   else jnp.asarray(self.morph_targets))

        @system(name="skinned_pass")
        def skinned_pass(q=Query(Read(SkinnedMesh3d), Read(anim_comp),
                                 Read(MeshMaterial), Read(GlobalTransform)),
                         cam=Query(Read(Camera3d), Read(GlobalTransform)),
                         light=Query(Read(DirectionalLight), Read(GlobalTransform)),
                         morphs=Query(Read(MorphWeights)),
                         amb=Res(AmbientLight),
                         clips=Res("anim_clips"),
                         target=ResMut(RenderTarget.RESOURCE),
                         stats=ResMut("render_stats")):
            rows = jnp.asarray(plugin._rows)
            if plugin._rows.size == 0:
                return
            ci, has_cam = pick_camera(cam.mask)
            cam_gt = cam.global_transform
            view = view_matrix(cam_gt.translation[ci], cam_gt.rotation[ci],
                               cam_gt.scale[ci])
            proj = perspective_infinite_reverse(
                cam.camera3d.fov[ci], width / height, cam.camera3d.near[ci])
            vp = proj @ view

            # animation sampling (graph blend tree or 2-clip crossfade) +
            # joint composition (Ni, J, …)
            if graph is not None:
                local = graph.sample(clips.data, clips.counts, clips.rates,
                                     q.animation_graph_player, rows)
            else:
                ap = q.animation_player
                local = sample_pose_blended(
                    clips.data, clips.counts, clips.rates,
                    {"clip": ap.clip[rows], "time": ap.time[rows],
                     "prev_clip": ap.prev_clip[rows],
                     "prev_time": ap.prev_time[rows],
                     "blend": ap.blend[rows]})
            global_trs = compose_joints(skeleton, local)
            joints = skin_matrices(skeleton, global_trs)   # (Ni, J, 4, 4)

            model = trs_to_mat4(TRS(
                translation=q.global_transform.translation[rows],
                rotation=q.global_transform.rotation[rows],
                scale=q.global_transform.scale[rows]))
            mv = jnp.einsum("ij,njk->nik", vp, model)      # (Ni, 4, 4)
            a = jnp.einsum("nab,njbc->njac", mv, joints)   # (Ni, J, 4, 4)
            # per-vertex skin matrices via the dense weight matmul (MXU)
            m_v = jnp.einsum("vj,njab->nvab", w_dense, a)  # (Ni, VC, 4, 4)
            if morph_t is not None:
                # morph displacement before skinning (ref: morph.wesl
                # runs before the joint deform in the vertex stage)
                k = morph_t.shape[0]
                wts = morphs.morph_weights.weights[rows][:, :k]
                disp = jnp.einsum("nk,kvc->nvc", wts, morph_t)
                ph_n = jnp.concatenate(
                    [mesh_ph[None, :, :3] + disp,
                     jnp.ones(disp.shape[:2] + (1,), jnp.float32)], -1)
                clip_pos = jnp.einsum("nvab,nvb->nva", m_v, ph_n)
            else:
                clip_pos = jnp.einsum("nvab,vb->nva", m_v, mesh_ph)
            # normals through the model+joint rotation (uniform-scale approx)
            b = jnp.einsum("nab,njbc->njac", model, joints)[:, :, :3, :3]
            r_v = jnp.einsum("vj,njab->nvab", w_dense, b)
            nrm = jnp.einsum("nvab,vb->nva", r_v, mesh_n)

            raster_batched(
                clip_pos, nrm, mesh.triangles, q.mask[rows] & has_cam,
                q.mesh_material.base_color[rows],
                q.mesh_material.emissive[rows],
                directional_light_vec(light, amb), target, stats,
                width=width, height=height, interpret=interpret, **cfg)

        app.add_systems(Render, skinned_pass, in_set=PASS_SET)
