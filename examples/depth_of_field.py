"""Depth of field (reference twin: examples/3d/depth_of_field.rs —
focal distance sweeps across a row of objects)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

from bevy_tpu import App
from bevy_tpu.render import RenderPlugin
from bevy_tpu.render.camera import Camera3d
from bevy_tpu.render.mesh import uv_sphere
from bevy_tpu.render.mesh3d import (
    AmbientLight, DirectionalLight, Mesh3d, MeshMaterial, Mesh3dPlugin,
)
from bevy_tpu.render.post import DepthOfFieldPlugin
from bevy_tpu.time import TimePlugin
from bevy_tpu.transform import TransformPlugin, transform_bundle


def build_app(width=320, height=180, backend="pallas_interpret",
              focal_distance=4.0):
    app = App(capacity=16)
    plugin = Mesh3dPlugin(backend=backend)
    sphere = plugin.add_mesh(uv_sphere(0.5, 20, 14))
    app.add_plugins(TimePlugin(), TransformPlugin(),
                    RenderPlugin(width=width, height=height), plugin,
                    DepthOfFieldPlugin(focal_distance=focal_distance,
                                       focal_range=1.5, max_blur=2))
    app.insert_resource(AmbientLight(brightness=0.3))
    app.world.spawn(Camera3d(), *transform_bundle(translation=(0, 0.6, 0)))
    app.world.spawn(DirectionalLight(),
                    *transform_bundle(rotation=(-0.35, 0.0, 0.0, 0.94)))
    for i in range(5):
        z = -2.0 - i * 2.0
        hue = i / 4.0
        app.world.spawn(
            Mesh3d(mesh=sphere),
            MeshMaterial(base_color=(0.9 - 0.5 * hue, 0.3 + 0.5 * hue,
                                     0.4, 1.0)),
            *transform_bundle(translation=((i - 2) * 0.8, 0.0, z)))
    return app


if __name__ == "__main__":
    from bevy_tpu.render.plugin import frame_image
    app = build_app()
    app.update(dt=1 / 60)
    np.save("/tmp/depth_of_field.npy", frame_image(app))
    print("saved /tmp/depth_of_field.npy")
