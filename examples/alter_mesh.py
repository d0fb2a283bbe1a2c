"""Alter mesh (reference twin: examples/asset/alter_mesh.rs — swap an
entity's mesh handle at runtime)."""

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
from bevy_tpu.time import TimePlugin
from bevy_tpu.transform import TransformPlugin, transform_bundle


def build_app(width=256, height=144, backend="pallas_interpret"):
    app = App(capacity=8)
    plugin = Mesh3dPlugin(backend=backend)
    cube = plugin.add_mesh(cuboid(1.2, 1.2, 1.2))
    sphere = plugin.add_mesh(uv_sphere(0.9, 20, 14))
    app.add_plugins(TimePlugin(), TransformPlugin(),
                    RenderPlugin(width=width, height=height), plugin)
    app.insert_resource(AmbientLight(brightness=0.3))
    app.world.spawn(Camera3d(), *transform_bundle(translation=(0, 1, 4)))
    app.world.spawn(DirectionalLight(),
                    *transform_bundle(rotation=(-0.35, 0.0, 0.0, 0.94)))
    e = app.world.spawn(Mesh3d(mesh=cube),
                        MeshMaterial(base_color=(0.8, 0.6, 0.3, 1.0)),
                        *transform_bundle())
    app._entity = e
    app._meshes = (cube, sphere)
    return app


def swap_mesh(app, which):
    app.world.set_field(app._entity, Mesh3d, "mesh",
                        np.int32(app._meshes[which]))


def main():
    from bevy_tpu.render.plugin import frame_image
    app = build_app()
    app.update(dt=1 / 60)
    img_cube = frame_image(app)
    swap_mesh(app, 1)
    app.update(dt=1 / 60)
    img_sphere = frame_image(app)
    diff = (np.abs(img_cube.astype(int) - img_sphere.astype(int)
                   ).max(-1) > 10).mean()
    print(f"mesh swapped: {diff * 100:.1f}% of pixels changed")


if __name__ == "__main__":
    main()
