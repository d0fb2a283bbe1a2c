"""3D transparency (reference twin: examples/3d/transparency_3d.rs —
alpha-blended panes over opaque geometry, via weighted-blended OIT)."""

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
from bevy_tpu.time import TimePlugin
from bevy_tpu.transform import TransformPlugin, transform_bundle


def build_app(width=640, height=360) -> App:
    app = App(capacity=16)
    plugin = Mesh3dPlugin()
    cube = plugin.add_mesh(cuboid(1.0, 1.0, 1.0))
    app.add_plugins(TimePlugin(), TransformPlugin(),
                    RenderPlugin(width=width, height=height), plugin)
    app.world.spawn(Mesh3d(mesh=cube),
                    MeshMaterial(base_color=(0.85, 0.85, 0.85, 1.0)),
                    *transform_bundle(translation=(0.0, 0.0, -2.0),
                                      scale=(8.0, 5.0, 0.3)))
    panes = [((1.0, 0.15, 0.15, 0.5), (-1.0, 0.0, 0.5)),
             ((0.15, 1.0, 0.15, 0.5), (0.0, 0.0, 1.5)),
             ((0.15, 0.15, 1.0, 0.5), (1.0, 0.0, 2.5))]
    for color, pos in panes:
        app.world.spawn(Mesh3d(mesh=cube), MeshMaterial(base_color=color),
                        *transform_bundle(translation=pos,
                                          scale=(2.0, 2.0, 0.08)))
    app.world.spawn(DirectionalLight(illuminance=1.0),
                    *transform_bundle(rotation=(-0.35, 0.0, 0.0, 0.94)))
    app.world.spawn(Camera3d(), *transform_bundle(translation=(0, 0.5, 7.0)))
    return app


def main():
    import numpy as np
    from PIL import Image

    app = build_app()
    app.update(dt=1 / 60)
    Image.fromarray(np.asarray(frame_image(app))).save(
        "/tmp/transparency_3d.png")
    print("transparency_3d: rendered → /tmp/transparency_3d.png")


if __name__ == "__main__":
    main()
