"""Clearcoat + transmission showcase (reference twins:
examples/3d/clearcoat.rs and examples/3d/transmission.rs)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bevy_tpu import App
from bevy_tpu.render import RenderPlugin
from bevy_tpu.render.camera import Camera3d
from bevy_tpu.render.mesh import cuboid, uv_sphere
from bevy_tpu.render.mesh3d import (
    AmbientLight, DirectionalLight, Mesh3d, MeshMaterial, Mesh3dPlugin,
)
from bevy_tpu.render.plugin import frame_image
from bevy_tpu.render.transmission import TransmissionPlugin
from bevy_tpu.time import TimePlugin
from bevy_tpu.transform import TransformPlugin, transform_bundle


def build_app(width=640, height=360, backend="auto") -> App:
    app = App(capacity=64)
    plugin = Mesh3dPlugin(backend=backend)
    sphere = plugin.add_mesh(uv_sphere(0.7, sectors=24, stacks=12))
    cube = plugin.add_mesh(cuboid(1.0, 1.0, 1.0))
    app.add_plugins(TimePlugin(), TransformPlugin(),
                    RenderPlugin(width=width, height=height), plugin,
                    TransmissionPlugin(plugin, backend=backend))
    app.insert_resource(AmbientLight(brightness=0.25))
    # colorful backdrop cubes to refract
    for i, col in enumerate([(0.9, 0.2, 0.2), (0.2, 0.9, 0.2),
                             (0.2, 0.3, 0.9), (0.9, 0.8, 0.2)]):
        app.world.spawn(
            Mesh3d(mesh=cube),
            MeshMaterial(base_color=(*col, 1.0), emissive=tuple(
                c * 0.3 for c in col)),
            *transform_bundle(translation=(i * 1.6 - 2.4, 0.0, -2.0),
                              scale=(1.2, 2.5, 0.3)))
    # tinted glass panel in front of half the backdrop
    app.world.spawn(
        Mesh3d(mesh=cube),
        MeshMaterial(base_color=(0.9, 0.95, 1.0, 1.0),
                     specular_transmission=1.0, ior=1.5,
                     perceptual_roughness=0.05),
        *transform_bundle(translation=(-1.2, 0.0, 0.5),
                          scale=(2.2, 2.2, 0.08)))
    # clearcoated sphere next to it (coat shows on forward spec too via
    # the deferred/shadow passes; here it reads as a glossy red ball)
    app.world.spawn(
        Mesh3d(mesh=sphere),
        MeshMaterial(base_color=(0.6, 0.05, 0.05, 1.0),
                     perceptual_roughness=0.7, clearcoat=1.0,
                     clearcoat_roughness=0.08),
        *transform_bundle(translation=(1.6, 0.0, 0.6)))
    app.world.spawn(DirectionalLight(illuminance=1.2),
                    *transform_bundle(rotation=(-0.3, 0.25, 0.05, 0.92)))
    app.world.spawn(Camera3d(), *transform_bundle(translation=(0, 0.3, 5)))
    return app


def main():
    import numpy as np
    from PIL import Image

    app = build_app()
    app.update(dt=1 / 60)
    Image.fromarray(np.asarray(frame_image(app))).save(
        "/tmp/glass_and_coat.png")
    print("glass_and_coat: rendered → /tmp/glass_and_coat.png")


if __name__ == "__main__":
    main()
