"""Wireframe rendering (reference twin: bevy_pbr's wireframe —
`bevy_pbr/src/wireframe.rs`: a `Wireframe` marker + `WireframeColor`
drawing a mesh's edges over the scene).

TPU form: unique mesh edges extract host-side ONCE at trace time
(static per mesh); per frame the edge endpoints transform in-jit with
the entity's GlobalTransform and append to the gizmo line budget as a
single batched segment list per wireframed entity group."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from bevy_tpu.app.main_schedule import Update
from bevy_tpu.app.plugin import Plugin
from bevy_tpu.ecs.component import component, field
from bevy_tpu.ecs.query import Query, Read
from bevy_tpu.ecs.system import system
from bevy_tpu.math.quat import quat_rotate_vec3
from bevy_tpu.render.gizmos import Gizmos
from bevy_tpu.render.mesh3d import Mesh3d
from bevy_tpu.transform import GlobalTransform


@component
class Wireframe:
    """ref: Wireframe marker + WireframeColor."""
    color = field(4, default=(0.1, 1.0, 0.3, 1.0))
    width = field((), jnp.float32, default=1.0)


def mesh_edges(mesh) -> np.ndarray:
    """(E, 2) unique undirected edges of a mesh's triangles."""
    tris = np.asarray(mesh.triangles, np.int64)
    e = np.concatenate([tris[:, [0, 1]], tris[:, [1, 2]],
                        tris[:, [2, 0]]], 0)
    e = np.sort(e, axis=1)
    return np.unique(e, axis=0)


class WireframePlugin(Plugin):
    """Draws edges for every entity carrying `Wireframe`. Entity set +
    mesh assignment specialize at trace time (the engine's standard
    host-read pattern); moving entities animate in-jit. `budget` caps
    gizmo segments per frame."""

    def __init__(self, mesh_plugin, budget: int = 8192):
        self.mesh_plugin = mesh_plugin
        self.budget = budget

    def build(self, app):
        plugin = self.mesh_plugin
        world = app.world
        app.world.register_component(Wireframe)
        budget = self.budget

        @system(name="wireframe_pass")
        def wireframe_pass(q=Query(Read(Mesh3d), Read(Wireframe),
                                   Read(GlobalTransform)),
                           g=Gizmos(budget=budget)):
            import jax

            rows = world.query_rows(Mesh3d, Wireframe)
            if len(rows) == 0:
                return
            # trace-time host read of the (static) mesh assignment —
            # the engine's standard specialization pattern
            mesh_ids = np.asarray(jax.device_get(
                world.column(Mesh3d, "mesh")))[np.asarray(rows)]
            for mid in sorted(set(int(m) for m in mesh_ids)):
                sub = [r for r, m in zip(rows, mesh_ids) if int(m) == mid]
                mesh = plugin.pool.meshes[mid]
                edges = mesh_edges(mesh)
                pts = np.asarray(mesh.positions, np.float32)[edges]
                local = jnp.asarray(pts)              # (E, 2, 3)
                ridx = jnp.asarray(sub, jnp.int32)
                tr = q.global_transform.translation[ridx]   # (R, 3)
                ro = q.global_transform.rotation[ridx]
                sc = q.global_transform.scale[ridx]
                ne = local.shape[0]
                nr = ridx.shape[0]
                p = local[None] * sc[:, None, None, :]      # (R, E, 2, 3)
                p = quat_rotate_vec3(
                    jnp.broadcast_to(ro[:, None, None, :],
                                     (nr, ne, 2, 4)), p)
                p = p + tr[:, None, None, :]
                a = p[:, :, 0].reshape(nr * ne, 3)
                b = p[:, :, 1].reshape(nr * ne, 3)
                col = jnp.broadcast_to(
                    q.wireframe.color[ridx][:, None, :],
                    (nr, ne, 4)).reshape(nr * ne, 4)
                wid = jnp.broadcast_to(
                    q.wireframe.width[ridx][:, None],
                    (nr, ne)).reshape(nr * ne)
                mask = jnp.broadcast_to(q.mask[ridx][:, None],
                                        (nr, ne)).reshape(nr * ne)
                g._segments.append(
                    (a, b, col, wid, jnp.ones(nr * ne, bool), mask))

        app.add_systems(Update, wireframe_pass)
