"""PBR material grid (reference twin: examples/3d/pbr.rs — spheres
sweeping metallic x roughness under deferred GGX + image-based light)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bevy_tpu import App
from bevy_tpu.render import RenderPlugin
from bevy_tpu.render.camera import Camera3d
from bevy_tpu.render.deferred import DeferredLightingPlugin, PointLight
from bevy_tpu.render.environment import EnvironmentLightPlugin
from bevy_tpu.render.mesh import uv_sphere
from bevy_tpu.render.mesh3d import (
    DirectionalLight, Mesh3d, MeshMaterial, Mesh3dPlugin,
)
from bevy_tpu.render.plugin import frame_image
from bevy_tpu.time import TimePlugin
from bevy_tpu.transform import TransformPlugin, transform_bundle

GRID = 5


def build_app(width=640, height=360, backend="auto") -> App:
    app = App(capacity=64)
    plugin = Mesh3dPlugin(deferred=True, backend=backend)
    sphere = plugin.add_mesh(uv_sphere(0.45, sectors=24, stacks=12))
    env = EnvironmentLightPlugin.gradient_environment()
    app.add_plugins(TimePlugin(), TransformPlugin(),
                    RenderPlugin(width=width, height=height), plugin,
                    DeferredLightingPlugin(backend=backend),
                    EnvironmentLightPlugin(env, intensity=0.6))
    for i in range(GRID):            # metallic sweep (rows)
        for j in range(GRID):        # roughness sweep (cols)
            app.world.spawn(
                Mesh3d(mesh=sphere),
                MeshMaterial(base_color=(0.7, 0.2, 0.2, 1.0),
                             metallic=i / (GRID - 1),
                             perceptual_roughness=max(j / (GRID - 1), 0.05)),
                *transform_bundle(translation=(j - GRID / 2 + 0.5,
                                               i - GRID / 2 + 0.5, 0.0)))
    app.world.spawn(DirectionalLight(illuminance=1.0),
                    *transform_bundle(rotation=(-0.3, 0.2, 0.05, 0.93)))
    app.world.spawn(PointLight(intensity=40.0, range=30.0),
                    *transform_bundle(translation=(3.0, 3.0, 4.0)))
    app.world.spawn(Camera3d(), *transform_bundle(translation=(0, 0, 7.5)))
    return app


def main():
    import numpy as np
    from PIL import Image

    app = build_app()
    app.update(dt=1 / 60)
    Image.fromarray(np.asarray(frame_image(app))).save("/tmp/pbr.png")
    print("pbr_materials: rendered → /tmp/pbr.png")


if __name__ == "__main__":
    main()
