"""Wireframe rendering (ref model: bevy_pbr wireframe.rs — the
Wireframe marker drawing mesh edges)."""

import numpy as np

from bevy_tpu import App
from bevy_tpu.render import RenderPlugin, SpritePlugin
from bevy_tpu.render.camera import Camera3d
from bevy_tpu.render.gizmos import GizmosPlugin
from bevy_tpu.render.mesh import cuboid
from bevy_tpu.render.mesh3d import (
    AmbientLight, DirectionalLight, Mesh3d, MeshMaterial, Mesh3dPlugin,
)
from bevy_tpu.render.plugin import frame_image
from bevy_tpu.render.wireframe import Wireframe, WireframePlugin, mesh_edges
from bevy_tpu.time import TimePlugin
from bevy_tpu.transform import TransformPlugin, transform_bundle


def test_mesh_edges_unique():
    edges = mesh_edges(cuboid(1, 1, 1))
    # 24 verts / 12 tris: 12*3 = 36 half-edges -> 30 unique (per-face
    # verts are NOT shared across faces in the cuboid mesher: each of
    # the 6 faces contributes 5 unique edges of its two tris)
    assert edges.shape[1] == 2
    assert (edges[:, 0] <= edges[:, 1]).all()
    assert len(np.unique(edges, axis=0)) == len(edges)


def test_wireframe_draws_edges():
    app = App(capacity=32)
    plugin = Mesh3dPlugin(backend="pallas_interpret")
    cube = plugin.add_mesh(cuboid(1.6, 1.6, 1.6))
    app.add_plugins(TimePlugin(), TransformPlugin(),
                    RenderPlugin(width=128, height=96), plugin,
                    SpritePlugin(), GizmosPlugin(capacity=256),
                    WireframePlugin(plugin))
    app.insert_resource(AmbientLight(brightness=0.2))
    app.world.spawn(Camera3d(), *transform_bundle(translation=(0, 0, 4)))
    app.world.spawn(DirectionalLight(illuminance=0.8),
                    *transform_bundle(rotation=(-0.3, 0.2, 0.0, 0.93)))
    app.world.spawn(Mesh3d(mesh=cube),
                    MeshMaterial(base_color=(0.2, 0.2, 0.25, 1.0)),
                    Wireframe(color=(0.1, 1.0, 0.3, 1.0)),
                    *transform_bundle(rotation=(0.2, 0.3, 0.1, 0.93)))
    app.update(dt=1 / 60)
    img = frame_image(app).astype(int)
    # green edge pixels present over the dark cube
    green = (img[..., 1] > img[..., 0] + 50) & (img[..., 1] > 120)
    assert green.sum() > 40, green.sum()
    # and they form thin lines, not fill
    assert green.mean() < 0.2
