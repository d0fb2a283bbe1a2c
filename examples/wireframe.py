"""Wireframe (reference twin: examples/3d/wireframe.rs — per-mesh
wireframe overlay with a global toggle)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

from bevy_tpu import App
from bevy_tpu.render import RenderPlugin
from bevy_tpu.render.camera import Camera3d
from bevy_tpu.render.mesh import cuboid, uv_sphere
from bevy_tpu.render.mesh3d import (
    AmbientLight, DirectionalLight, Mesh3d, MeshMaterial, Mesh3dPlugin,
)
from bevy_tpu.render.gizmos import GizmosPlugin
from bevy_tpu.render.wireframe import Wireframe, WireframePlugin
from bevy_tpu.time import TimePlugin
from bevy_tpu.transform import TransformPlugin, transform_bundle


def build_app(width=320, height=180, backend="pallas_interpret"):
    app = App(capacity=16)
    plugin = Mesh3dPlugin(backend=backend)
    cube = plugin.add_mesh(cuboid(1.0, 1.0, 1.0))
    sphere = plugin.add_mesh(uv_sphere(0.7, 16, 12))
    app.add_plugins(TimePlugin(), TransformPlugin(),
                    RenderPlugin(width=width, height=height), plugin,
                    GizmosPlugin(capacity=4096),
                    WireframePlugin(mesh_plugin=plugin)
                    if "mesh_plugin" in
                    WireframePlugin.__init__.__code__.co_varnames
                    else WireframePlugin())
    app.insert_resource(AmbientLight(brightness=0.3))
    app.world.spawn(Camera3d(), *transform_bundle(translation=(0, 1, 4)))
    app.world.spawn(DirectionalLight(),
                    *transform_bundle(rotation=(-0.35, 0.0, 0.0, 0.94)))
    app.world.spawn(Mesh3d(mesh=cube),
                    MeshMaterial(base_color=(0.4, 0.5, 0.8, 1.0)),
                    Wireframe(),
                    *transform_bundle(translation=(-1.0, 0.0, 0.0),
                                      rotation=(0.0, 0.26, 0.0, 0.966)))
    app.world.spawn(Mesh3d(mesh=sphere),
                    MeshMaterial(base_color=(0.8, 0.5, 0.3, 1.0)),
                    *transform_bundle(translation=(1.0, 0.0, 0.0)))
    return app


if __name__ == "__main__":
    from bevy_tpu.render.plugin import frame_image
    app = build_app()
    app.update(dt=1 / 60)
    np.save("/tmp/wireframe.npy", frame_image(app))
    print("saved /tmp/wireframe.npy")
