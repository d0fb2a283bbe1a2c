"""Screen-space reflections (reference twin: examples/3d/ssr.rs — a
reflective water-ish plane mirrors the scene above it)."""

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
from bevy_tpu.render.deferred import DeferredLightingPlugin
from bevy_tpu.render.ssr import SsrPlugin
from bevy_tpu.time import TimePlugin
from bevy_tpu.transform import TransformPlugin, transform_bundle


def build_app(width=320, height=180, backend="pallas_interpret"):
    app = App(capacity=16)
    plugin = Mesh3dPlugin(backend=backend, deferred=True)
    floor = plugin.add_mesh(cuboid(8.0, 0.2, 6.0))
    sphere = plugin.add_mesh(uv_sphere(0.7, 20, 14))
    app.add_plugins(TimePlugin(), TransformPlugin(),
                    RenderPlugin(width=width, height=height), plugin,
                    DeferredLightingPlugin(backend=backend),
                    SsrPlugin(steps=24, stride=0.6, thickness=0.8))
    app.insert_resource(AmbientLight(brightness=0.25))
    app.world.spawn(Camera3d(),
                    *transform_bundle(translation=(0, 1.6, 5),
                                      rotation=(-0.13, 0.0, 0.0, 0.991)))
    app.world.spawn(DirectionalLight(),
                    *transform_bundle(rotation=(-0.4, 0.2, 0.0, 0.9)))
    # glossy metallic floor: the SSR surface
    app.world.spawn(Mesh3d(mesh=floor),
                    MeshMaterial(base_color=(0.35, 0.4, 0.45, 1.0),
                                 metallic=0.9,
                                 perceptual_roughness=0.15),
                    *transform_bundle(translation=(0.0, -0.6, 0.0)))
    app.world.spawn(Mesh3d(mesh=sphere),
                    MeshMaterial(base_color=(0.9, 0.4, 0.2, 1.0)),
                    *transform_bundle(translation=(0.0, 0.5, 0.0)))
    return app


if __name__ == "__main__":
    from bevy_tpu.render.plugin import frame_image
    app = build_app()
    app.update(dt=1 / 60)
    np.save("/tmp/ssr.npy", frame_image(app))
    print("saved /tmp/ssr.npy")
