"""Anti-aliasing mode tour (reference twin: examples/3d/anti_aliasing.rs
— cycle FXAA / TAA / CAS / SSAA on one scene)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

from bevy_tpu import App
from bevy_tpu.render import RenderPlugin
from bevy_tpu.render.camera import Camera3d
from bevy_tpu.render.mesh import cuboid
from bevy_tpu.render.mesh3d import (
    AmbientLight, DirectionalLight, Mesh3d, MeshMaterial, Mesh3dPlugin,
)
from bevy_tpu.time import TimePlugin
from bevy_tpu.transform import TransformPlugin, transform_bundle


def build_app(width=256, height=144, backend="pallas_interpret",
              mode="fxaa"):
    app = App(capacity=8)
    plugin = Mesh3dPlugin(backend=backend,
                          motion_vectors=(mode == "taa"))
    cube = plugin.add_mesh(cuboid(1.0, 1.0, 1.0))
    plugins = [TimePlugin(), TransformPlugin(),
               RenderPlugin(width=width, height=height,
                            ssaa=2 if mode == "ssaa" else 1), plugin]
    if mode == "fxaa":
        from bevy_tpu.render.post import FxaaPlugin
        plugins.append(FxaaPlugin())
    elif mode == "taa":
        from bevy_tpu.render.post import TaaPlugin
        plugins.append(TaaPlugin())
    elif mode == "cas":
        from bevy_tpu.render.post import CasPlugin
        plugins.append(CasPlugin())
    app.add_plugins(*plugins)
    app.insert_resource(AmbientLight(brightness=0.3))
    app.world.spawn(Camera3d(), *transform_bundle(translation=(0, 1, 4)))
    app.world.spawn(DirectionalLight(),
                    *transform_bundle(rotation=(-0.35, 0.0, 0.0, 0.94)))
    app.world.spawn(Mesh3d(mesh=cube),
                    MeshMaterial(base_color=(0.8, 0.7, 0.3, 1.0)),
                    *transform_bundle(rotation=(0.0, 0.31, 0.13, 0.94)))
    return app


if __name__ == "__main__":
    from bevy_tpu.render.plugin import frame_image
    for mode in ("fxaa", "taa", "cas", "ssaa", "off"):
        app = build_app(mode=mode)
        for _ in (range(3) if mode == "taa" else range(1)):
            app.update(dt=1 / 60)
        img = frame_image(app)
        print(f"{mode}: frame {img.shape}")
