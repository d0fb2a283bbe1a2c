"""Lighting showcase (reference twin: examples/3d/lighting.rs — point,
spot and directional lights over a small scene, deferred tile-binned
shading path)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

from bevy_tpu import App
from bevy_tpu.render import RenderPlugin
from bevy_tpu.render.camera import Camera3d
from bevy_tpu.render.deferred import (
    DeferredLightingPlugin, PointLight, SpotLight,
)
from bevy_tpu.render.mesh import cuboid, plane, uv_sphere
from bevy_tpu.render.mesh3d import (
    AmbientLight, DirectionalLight, Mesh3d, MeshMaterial, Mesh3dPlugin,
)
from bevy_tpu.time import TimePlugin
from bevy_tpu.transform import TransformPlugin, transform_bundle


def build_app(width=800, height=450, backend="auto"):
    app = App(capacity=64)
    plugin = Mesh3dPlugin(backend=backend, deferred=True)
    app.add_plugins(TimePlugin(), TransformPlugin(),
                    RenderPlugin(width=width, height=height), plugin,
                    DeferredLightingPlugin(backend=backend))
    app.insert_resource(AmbientLight(brightness=0.03))
    app.world.spawn(Camera3d(),
                    *transform_bundle(translation=(0.0, 2.0, 7.0),
                                      rotation=(-0.12, 0.0, 0.0, 0.993)))
    # the three light kinds (ref: lighting.rs spawns exactly these)
    app.world.spawn(DirectionalLight(illuminance=0.25,
                                     color=(0.9, 0.9, 1.0)),
                    *transform_bundle(rotation=(-0.35, 0.25, 0.0, 0.9)))
    app.world.spawn(PointLight(intensity=6.0, range=12.0,
                               color=(1.0, 0.4, 0.3)),
                    *transform_bundle(translation=(-2.0, 2.0, 1.5)))
    app.world.spawn(SpotLight(intensity=10.0, range=14.0,
                              color=(0.3, 0.6, 1.0),
                              inner_angle=0.35, outer_angle=0.55),
                    *transform_bundle(translation=(2.5, 3.0, 2.0),
                                      rotation=(-0.45, 0.2, 0.0, 0.87)))
    sphere = plugin.add_mesh(uv_sphere(0.8, 24, 16))
    cube = plugin.add_mesh(cuboid(1.2, 1.2, 1.2))
    floor = plugin.add_mesh(plane(14.0, 10.0))
    app.world.spawn(Mesh3d(mesh=floor),
                    MeshMaterial(base_color=(0.8, 0.8, 0.8, 1.0),
                                 perceptual_roughness=0.9),
                    *transform_bundle())
    app.world.spawn(Mesh3d(mesh=sphere),
                    MeshMaterial(base_color=(0.8, 0.7, 0.6, 1.0),
                                 perceptual_roughness=0.3, metallic=0.2),
                    *transform_bundle(translation=(-1.2, 0.8, 0.0)))
    app.world.spawn(Mesh3d(mesh=cube),
                    MeshMaterial(base_color=(0.5, 0.6, 0.8, 1.0),
                                 perceptual_roughness=0.6),
                    *transform_bundle(translation=(1.4, 0.6, -0.5),
                                      rotation=(0.0, 0.26, 0.0, 0.966)))
    return app


if __name__ == "__main__":
    from bevy_tpu.render.plugin import frame_image

    app = build_app()
    app.update(dt=1 / 60)
    np.save("/tmp/lighting_frame.npy", frame_image(app))
    print("saved /tmp/lighting_frame.npy")
