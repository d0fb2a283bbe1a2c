"""Irradiance volumes (reference twin: examples/3d/irradiance_volumes.rs
— a voxel grid of baked ambient-cube irradiance adds directional bounce
light to dynamic objects moving through it)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

from bevy_tpu import App
from bevy_tpu.render import RenderPlugin
from bevy_tpu.render.camera import Camera3d
from bevy_tpu.render.deferred import DeferredLightingPlugin, PointLight
from bevy_tpu.render.irradiance import IrradianceVolumePlugin
from bevy_tpu.render.mesh import cuboid
from bevy_tpu.render.mesh3d import (
    AmbientLight, Mesh3d, MeshMaterial, Mesh3dPlugin,
)
from bevy_tpu.time import TimePlugin
from bevy_tpu.transform import TransformPlugin, transform_bundle


def build_app(width=320, height=180, backend="auto") -> App:
    app = App(capacity=32)
    plugin = Mesh3dPlugin(backend=backend, deferred=True)
    cube = plugin.add_mesh(cuboid(1.0, 1.0, 1.0))
    # 4x1x4 ambient-cube grid: a warm "bounce" pool in one corner fading
    # to cool sky light (6 axis faces per voxel, ref: ambient cubes)
    vox = np.zeros((4, 1, 4, 6, 3), np.float32)
    for i in range(4):
        for k in range(4):
            warm = max(0.0, 1.5 - 0.6 * (i + k))
            vox[i, 0, k, :, 0] = 0.15 + warm
            vox[i, 0, k, :, 1] = 0.18 + warm * 0.55
            vox[i, 0, k, :, 2] = 0.35
    app.add_plugins(TimePlugin(), TransformPlugin(),
                    RenderPlugin(width=width, height=height), plugin,
                    DeferredLightingPlugin(backend=backend),
                    IrradianceVolumePlugin(
                        vox, min_corner=(-6.0, -2.0, -9.0),
                        max_corner=(6.0, 2.0, 3.0)))
    app.insert_resource(AmbientLight(brightness=0.05))
    # floor + a line of probes (cubes) crossing the volume
    app.world.spawn(Mesh3d(mesh=cube),
                    MeshMaterial(base_color=(0.7, 0.7, 0.72, 1.0),
                                 perceptual_roughness=0.95),
                    *transform_bundle(translation=(0.0, -0.55, -3.0),
                                      scale=(14.0, 0.1, 14.0)))
    for i in range(4):
        app.world.spawn(Mesh3d(mesh=cube),
                        MeshMaterial(base_color=(0.85, 0.85, 0.85, 1.0),
                                     perceptual_roughness=0.9),
                        *transform_bundle(
                            translation=(-4.5 + 3.0 * i, 0.0, -3.0)))
    app.world.spawn(PointLight(intensity=0.8, range=20.0),
                    *transform_bundle(translation=(0.0, 3.0, 0.0)))
    app.world.spawn(Camera3d(), *transform_bundle(
        translation=(0.0, 3.0, 3.0), rotation=(-0.3, 0.0, 0.0, 0.954)))
    return app


def main():
    from PIL import Image

    from bevy_tpu.render.plugin import frame_image
    app = build_app()
    app.update(dt=1 / 60)
    img = np.asarray(frame_image(app))
    Image.fromarray(img).save("/tmp/irradiance_volumes.png")
    print("saved /tmp/irradiance_volumes.png")


if __name__ == "__main__":
    main()
