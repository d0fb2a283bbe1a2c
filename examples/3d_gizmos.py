"""3D gizmos (reference twin: examples/gizmos/3d_gizmos.rs — immediate-
mode debug drawing over a 3D scene: grid, axes, sphere, cuboid, arrows
+ a retained gizmo)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

from bevy_tpu import App, Res, Update
from bevy_tpu.ecs.system import system
from bevy_tpu.render import RenderPlugin
from bevy_tpu.render.camera import Camera3d
from bevy_tpu.render.gizmos import Gizmos, GizmosPlugin, RetainedGizmo
from bevy_tpu.render.mesh import cuboid
from bevy_tpu.render.mesh3d import (
    AmbientLight, DirectionalLight, Mesh3d, MeshMaterial, Mesh3dPlugin,
)
from bevy_tpu.time import Time, TimePlugin
from bevy_tpu.transform import TransformPlugin, transform_bundle


def build_app(width=320, height=180) -> App:
    app = App(capacity=64)
    plugin = Mesh3dPlugin()
    cube = plugin.add_mesh(cuboid(1.0, 1.0, 1.0))
    app.add_plugins(TimePlugin(), TransformPlugin(),
                    RenderPlugin(width=width, height=height), plugin,
                    GizmosPlugin())
    app.insert_resource(AmbientLight(brightness=0.25))
    app.world.spawn(Mesh3d(mesh=cube),
                    MeshMaterial(base_color=(0.6, 0.6, 0.65, 1.0)),
                    *transform_bundle(translation=(0.0, 0.0, -6.0)))
    app.world.spawn(DirectionalLight(illuminance=1.0),
                    *transform_bundle(rotation=(-0.38, 0.0, 0.0, 0.92)))
    app.world.spawn(Camera3d(), *transform_bundle(
        translation=(0.0, 2.0, 1.0), rotation=(-0.2, 0.0, 0.0, 0.98)))
    # a retained gizmo persists without an every-frame system
    # (ref: retained.rs)
    app.world.spawn(RetainedGizmo(a=(-3.0, 0.0, -6.0), b=(3.0, 2.0, -6.0),
                                  color=(1.0, 0.0, 1.0, 1.0)))

    @system
    def draw(g=Gizmos(budget=512), time=Res(Time)):
        g.grid((0.0, -0.6, -6.0), (1.0, 1.0), (8, 8),
               color=(0.4, 0.4, 0.45, 1.0))
        g.axes((0.0, 0.0, -6.0), length=1.5)
        g.sphere((2.0, 0.5, -6.0), 0.6, color=(0.2, 0.9, 0.3, 1.0))
        g.cuboid((-2.0, 0.5, -6.0), (0.5, 0.5, 0.5),
                 color=(0.9, 0.6, 0.1, 1.0))
        g.arrow((0.0, 1.8, -6.0), (0.0, 0.9, -6.0),
                color=(1.0, 0.2, 0.2, 1.0))

    app.add_systems(Update, draw)
    return app


def main():
    from PIL import Image

    from bevy_tpu.render.plugin import frame_image
    app = build_app()
    app.update(dt=1 / 60)
    img = np.asarray(frame_image(app))
    Image.fromarray(img).save("/tmp/3d_gizmos.png")
    print("saved /tmp/3d_gizmos.png")


if __name__ == "__main__":
    main()
