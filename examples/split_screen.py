"""Split-screen example (reference twin: examples/3d/split_screen.rs —
four cameras with quarter-viewport rects viewing one scene from different
angles; ref: Camera::viewport + Camera::order).

Each camera traces one raster pass over the shared scene with its own
NDC→viewport-pixel remap; the kernels scissor edge-straddling triangles
per pixel, so passes compose in `order` on the shared framebuffer/depth.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax.numpy as jnp

from bevy_tpu import App, Query, Res, Update, With
from bevy_tpu.ecs.system import system
from bevy_tpu.math.quat import quat_from_euler
from bevy_tpu.render import RenderPlugin
from bevy_tpu.render.camera import Camera3d
from bevy_tpu.render.mesh import cuboid, plane, uv_sphere
from bevy_tpu.render.mesh3d import (
    DirectionalLight, Mesh3d, MeshMaterial, Mesh3dPlugin,
)
from bevy_tpu.time import Time, TimePlugin
from bevy_tpu.transform import Transform, TransformPlugin, transform_bundle


@system
def spin(q=Query(Transform, With(Mesh3d)), time=Res(Time)):
    rot = quat_from_euler(time.elapsed * 0.7, jnp.zeros(()), jnp.zeros(()))
    q.transform.rotation = jnp.where(q.mask[:, None], rot,
                                     q.transform.rotation)


def _look_at_origin(eye):
    eye = np.asarray(eye, np.float32)
    yaw = float(np.arctan2(eye[0], eye[2]))
    horiz = float(np.hypot(eye[0], eye[2]))
    pitch = float(-np.arctan2(eye[1], max(horiz, 1e-6)))
    return tuple(np.asarray(
        quat_from_euler(jnp.float32(yaw), jnp.float32(pitch),
                        jnp.zeros(()))))


def build_app(width=640, height=360, backend="auto", capacity=64):
    app = App(capacity=capacity)
    plugin = Mesh3dPlugin(backend=backend)
    cube = plugin.add_mesh(cuboid(1.2, 1.2, 1.2))
    ball = plugin.add_mesh(uv_sphere(0.8, 10, 14))
    ground = plugin.add_mesh(plane(8.0, 8.0))
    app.add_plugins(TimePlugin(), TransformPlugin(),
                    RenderPlugin(width=width, height=height), plugin)

    # four quarter-screen cameras around the scene (ref: split_screen.rs)
    views = [
        ((0.0, 0.0), (0.5, 0.5), (0.0, 2.5, 6.0)),
        ((0.5, 0.0), (1.0, 0.5), (6.0, 2.5, 0.0)),
        ((0.0, 0.5), (0.5, 1.0), (0.0, 2.5, -6.0)),
        ((0.5, 0.5), (1.0, 1.0), (-6.0, 2.5, 0.0)),
    ]
    for i, (mn, mx, eye) in enumerate(views):
        app.world.spawn(
            Camera3d(order=i, vp_min=mn, vp_max=mx),
            *transform_bundle(translation=eye, rotation=_look_at_origin(eye)))

    app.world.spawn(Mesh3d(mesh=ground),
                    MeshMaterial(base_color=(0.35, 0.6, 0.35, 1.0)),
                    *transform_bundle(translation=(0.0, -1.2, 0.0)))
    app.world.spawn(Mesh3d(mesh=cube),
                    MeshMaterial(base_color=(0.9, 0.25, 0.2, 1.0)),
                    *transform_bundle())
    app.world.spawn(Mesh3d(mesh=ball),
                    MeshMaterial(base_color=(0.2, 0.35, 0.9, 1.0)),
                    *transform_bundle(translation=(1.8, 0.0, -1.0)))
    app.world.spawn(DirectionalLight(illuminance=1.0),
                    *transform_bundle(rotation=_look_at_origin((2.0, 4.0, 3.0))))
    app.add_systems(Update, spin)
    return app


if __name__ == "__main__":
    import time as _time

    import jax

    app = build_app()
    app.update(dt=1 / 60)          # compile
    jax.device_get(app.world.state["frame"])
    n = 30
    t0 = _time.perf_counter()
    for _ in range(n):
        app.update(dt=1 / 60)
    jax.device_get(app.world.state["frame"])
    dt_ms = (_time.perf_counter() - t0) / n * 1e3
    print(f"split_screen 4 cams {640}x{360}: {dt_ms:.2f} ms/frame")
    from bevy_tpu.render.plugin import frame_image
    from PIL import Image
    Image.fromarray(frame_image(app)).save("/tmp/split_screen.png")
    print("wrote /tmp/split_screen.png")
