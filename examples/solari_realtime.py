"""Realtime ReSTIR DI+GI (reference twin: examples/3d/solari.rs —
bevy_solari realtime lighting over the deferred G-buffer; the
pathtracer example remains the ground-truth mode)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

from bevy_tpu import App
from bevy_tpu.render import RenderPlugin
from bevy_tpu.render.camera import Camera3d
from bevy_tpu.render.deferred import PointLight
from bevy_tpu.render.mesh import cuboid, uv_sphere
from bevy_tpu.render.mesh3d import (
    AmbientLight, Mesh3d, MeshMaterial, Mesh3dPlugin,
)
from bevy_tpu.render.solari import SolariPlugin
from bevy_tpu.time import TimePlugin
from bevy_tpu.transform import TransformPlugin, transform_bundle


def build_app(width=480, height=270, backend="auto", gi=True,
              shadow_rays=True):
    app = App(capacity=64)
    plugin = Mesh3dPlugin(backend=backend, deferred=True)
    app.add_plugins(TimePlugin(), TransformPlugin(),
                    RenderPlugin(width=width, height=height), plugin,
                    SolariPlugin(plugin, candidates=8, presample_k=32,
                                 gi=gi, shadow_rays=shadow_rays))
    app.insert_resource(AmbientLight(brightness=0.01))
    app.world.spawn(Camera3d(),
                    *transform_bundle(translation=(0.0, 1.8, 4.2),
                                      rotation=(-0.18, 0.0, 0.0, 0.984)))
    # a small light set: ReSTIR picks ONE shadow ray per pixel from the
    # presampled tiles, which is the whole point
    for lpos, col, inten in (((-1.8, 2.6, 1.2), (1.0, 0.7, 0.5), 7.0),
                             ((1.8, 2.2, 1.6), (0.4, 0.6, 1.0), 5.0),
                             ((0.0, 3.2, -1.0), (0.8, 0.9, 1.0), 4.0)):
        app.world.spawn(PointLight(intensity=inten, range=30.0, color=col),
                        *transform_bundle(translation=lpos))
    cube = plugin.add_mesh(cuboid(1.0, 1.0, 1.0))
    sphere = plugin.add_mesh(uv_sphere(0.7, 24, 16))
    # floor + back wall give the GI bounce surfaces
    app.world.spawn(Mesh3d(mesh=cube),
                    MeshMaterial(base_color=(0.85, 0.85, 0.85, 1.0),
                                 perceptual_roughness=0.9),
                    *transform_bundle(translation=(0.0, -0.1, 0.0),
                                      scale=(10.0, 0.2, 8.0)))
    app.world.spawn(Mesh3d(mesh=cube),
                    MeshMaterial(base_color=(0.8, 0.15, 0.1, 1.0),
                                 perceptual_roughness=0.9),
                    *transform_bundle(translation=(2.4, 1.2, -0.5),
                                      scale=(0.2, 2.4, 5.0)))
    app.world.spawn(Mesh3d(mesh=sphere),
                    MeshMaterial(base_color=(0.7, 0.7, 0.75, 1.0),
                                 perceptual_roughness=0.35, metallic=0.2),
                    *transform_bundle(translation=(-0.6, 0.7, 0.2)))
    app.world.spawn(Mesh3d(mesh=cube),
                    MeshMaterial(base_color=(0.6, 0.7, 0.5, 1.0),
                                 perceptual_roughness=0.7),
                    *transform_bundle(translation=(1.0, 0.5, -1.2),
                                      rotation=(0.0, 0.2, 0.0, 0.98)))
    return app


if __name__ == "__main__":
    from bevy_tpu.render.plugin import frame_image

    app = build_app()
    for _ in range(8):                 # temporal reservoirs converge
        app.update(dt=1 / 60)
    np.save("/tmp/solari_frame.npy", frame_image(app))
    print("saved /tmp/solari_frame.npy")
