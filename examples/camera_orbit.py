"""Free camera controller (reference twin:
examples/camera/camera_controller.rs + camera_orbit.rs — WASD + mouse
look driving a 3D camera over a small scene)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import numpy as np

from bevy_tpu import App
from bevy_tpu.input import InputPlugin, KeyCode
from bevy_tpu.render import RenderPlugin
from bevy_tpu.render.camera import Camera3d
from bevy_tpu.render.camera_controller import (
    CameraControllerPlugin, FreeCamera,
)
from bevy_tpu.render.mesh import cuboid
from bevy_tpu.render.mesh3d import (
    AmbientLight, DirectionalLight, Mesh3d, MeshMaterial, Mesh3dPlugin,
)
from bevy_tpu.time import TimePlugin
from bevy_tpu.transform import Transform, TransformPlugin, transform_bundle


def build_app(width=320, height=180) -> App:
    app = App(capacity=32)
    plugin = Mesh3dPlugin()
    cube = plugin.add_mesh(cuboid(1.0, 1.0, 1.0))
    app.add_plugins(TimePlugin(), TransformPlugin(), InputPlugin(),
                    RenderPlugin(width=width, height=height), plugin,
                    CameraControllerPlugin())
    app.insert_resource(AmbientLight(brightness=0.25))
    for i in range(5):
        app.world.spawn(Mesh3d(mesh=cube),
                        MeshMaterial(base_color=(0.8, 0.3 + 0.1 * i,
                                                 0.2, 1.0)),
                        *transform_bundle(translation=(i * 2.5 - 5.0,
                                                       0.0, -6.0)))
    app.world.spawn(DirectionalLight(illuminance=1.0),
                    *transform_bundle(rotation=(-0.38, 0.0, 0.0, 0.92)))
    cam = app.world.spawn(Camera3d(), FreeCamera(),
                          *transform_bundle(translation=(0.0, 1.0, 4.0)))
    app._cam = cam
    return app


def demo():
    app = build_app()
    app.update(dt=1 / 60)
    t0 = np.asarray(jax.device_get(
        app.world.column(Transform, "translation")[app._cam.index]))
    # fly forward (W) while looking around with the mouse
    app.input.press(KeyCode.KeyW)
    app.input.move_to(10.0, 0.0)
    for i in range(30):
        app.input.move_to(10.0 + i * 2.0, 0.0)
        app.update(dt=1 / 60)
    app.input.release(KeyCode.KeyW)
    t1 = np.asarray(jax.device_get(
        app.world.column(Transform, "translation")[app._cam.index]))
    moved = float(np.linalg.norm(t1 - t0))
    print(f"camera flew {moved:.2f} units; pos {t1.round(2).tolist()}")
    return moved


if __name__ == "__main__":
    demo()
