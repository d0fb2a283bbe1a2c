"""Classic 3D scene (reference twin: examples/3d/3d_scene.rs — a plane,
a cube, a light and a camera; plus the procedural skybox)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bevy_tpu import App
from bevy_tpu.render import RenderPlugin
from bevy_tpu.render.camera import Camera3d
from bevy_tpu.render.mesh import cuboid
from bevy_tpu.render.mesh3d import (
    DirectionalLight, Mesh3d, MeshMaterial, Mesh3dPlugin,
)
from bevy_tpu.render.plugin import frame_image
from bevy_tpu.render.skybox import SkyboxPlugin
from bevy_tpu.time import TimePlugin
from bevy_tpu.transform import TransformPlugin, transform_bundle


def build_app(width=640, height=360) -> App:
    app = App(capacity=16)
    plugin = Mesh3dPlugin()
    cube = plugin.add_mesh(cuboid(1.0, 1.0, 1.0))
    app.add_plugins(TimePlugin(), TransformPlugin(),
                    RenderPlugin(width=width, height=height), plugin,
                    SkyboxPlugin())
    # circular base (ref: Circle mesh — a flattened cuboid here)
    app.world.spawn(Mesh3d(mesh=cube),
                    MeshMaterial(base_color=(0.3, 0.5, 0.3, 1.0)),
                    *transform_bundle(translation=(0.0, -0.55, 0.0),
                                      scale=(8.0, 0.1, 8.0)))
    app.world.spawn(Mesh3d(mesh=cube),
                    MeshMaterial(base_color=(0.6, 0.7, 0.8, 1.0)),
                    *transform_bundle(translation=(0.0, 0.5, 0.0)))
    app.world.spawn(DirectionalLight(illuminance=1.2),
                    *transform_bundle(rotation=(-0.35, 0.28, 0.1, 0.89)))
    app.world.spawn(Camera3d(), *transform_bundle(
        translation=(-2.5, 2.5, 6.0),
        rotation=(-0.15, -0.18, -0.03, 0.97)))
    return app


def main():
    import numpy as np
    from PIL import Image

    app = build_app()
    app.update(dt=1 / 60)
    img = frame_image(app)
    Image.fromarray(np.asarray(img)).save("/tmp/3d_scene.png")
    print("3d_scene: rendered → /tmp/3d_scene.png")


if __name__ == "__main__":
    main()
