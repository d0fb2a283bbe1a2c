"""Mesh picking (reference twin: examples/picking/mesh_picking.rs —
ray-cast the cursor into a 3D scene, hover/click entities and react via
pointer events)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bevy_tpu import App
from bevy_tpu.input import InputPlugin
from bevy_tpu.picking import pick_at_pixel
from bevy_tpu.render import RenderPlugin
from bevy_tpu.render.camera import Camera3d
from bevy_tpu.render.mesh import cuboid
from bevy_tpu.render.mesh3d import (
    AmbientLight, DirectionalLight, Mesh3d, MeshMaterial, Mesh3dPlugin,
)
from bevy_tpu.time import TimePlugin
from bevy_tpu.transform import TransformPlugin, transform_bundle


def build_app(width=320, height=180):
    app = App(capacity=32)
    plugin = Mesh3dPlugin()
    cube = plugin.add_mesh(cuboid(1.0, 1.0, 1.0))
    app.add_plugins(TimePlugin(), TransformPlugin(), InputPlugin(),
                    RenderPlugin(width=width, height=height), plugin)
    app.insert_resource(AmbientLight(brightness=0.25))
    left = app.world.spawn(Mesh3d(mesh=cube),
                           MeshMaterial(base_color=(0.9, 0.2, 0.2, 1.0)),
                           *transform_bundle(translation=(-2.0, 0.0, -6.0)))
    right = app.world.spawn(Mesh3d(mesh=cube),
                            MeshMaterial(base_color=(0.2, 0.9, 0.2, 1.0)),
                            *transform_bundle(translation=(2.0, 0.0, -6.0)))
    app.world.spawn(DirectionalLight(illuminance=1.0),
                    *transform_bundle(rotation=(-0.38, 0.0, 0.0, 0.92)))
    app.world.spawn(Camera3d(), *transform_bundle(translation=(0, 0, 0)))
    app._plugin = plugin
    app._targets = {"left": left, "right": right}
    return app


def demo():
    app = build_app()
    app.update(dt=1 / 60)
    w, h = 320, 180
    # cubes at x=±2, z=-6 project to roughly ±1/3 from center
    hits = {}
    for name, px in (("left", w * 0.30), ("right", w * 0.70),
                     ("miss", w * 0.5)):
        row, dist = pick_at_pixel(app, app._plugin, px, h * 0.5)
        hits[name] = row
    print("picked:", {k: int(v) for k, v in hits.items()},
          "| expect left:", app._targets["left"].index,
          "right:", app._targets["right"].index, "miss: -1")
    return hits


if __name__ == "__main__":
    demo()
