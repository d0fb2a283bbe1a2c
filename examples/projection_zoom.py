"""Projection zoom (reference twin: examples/camera/projection_zoom.rs
— zoom by scaling the orthographic view or narrowing the perspective
fov)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax.numpy as jnp

from bevy_tpu import App, Query, Res, Update
from bevy_tpu.ecs.system import system
from bevy_tpu.render import RenderPlugin
from bevy_tpu.render.camera import Camera3d
from bevy_tpu.render.mesh import cuboid
from bevy_tpu.render.mesh3d import (
    AmbientLight, DirectionalLight, Mesh3d, MeshMaterial, Mesh3dPlugin,
)
from bevy_tpu.time import Time, TimePlugin
from bevy_tpu.transform import (
    GlobalTransform, Transform, TransformPlugin, transform_bundle,
)


def build_app(width=320, height=180, backend="pallas_interpret"):
    app = App(capacity=32)
    plugin = Mesh3dPlugin(backend=backend)
    cube = plugin.add_mesh(cuboid(0.8, 0.8, 0.8))
    app.add_plugins(TimePlugin(), TransformPlugin(),
                    RenderPlugin(width=width, height=height), plugin)
    app.insert_resource(AmbientLight(brightness=0.3))
    app.world.spawn(Camera3d(), *transform_bundle(translation=(0, 2, 8)))
    app.world.spawn(DirectionalLight(),
                    *transform_bundle(rotation=(-0.35, 0.0, 0.0, 0.94)))
    n = 9
    i = np.arange(n)
    pos = np.stack([(i % 3 - 1) * 2.0, np.zeros(n),
                    (i // 3 - 1) * 2.0], 1).astype(np.float32)
    app.world.spawn_batch([
        Mesh3d(mesh=cube), MeshMaterial(base_color=(0.7, 0.6, 0.4, 1.0)),
        Transform(translation=pos), GlobalTransform(translation=pos)], n)

    @system
    def zoom(cam=Query(Camera3d), time=Res(Time)):
        # fov breathes between 20 and 60 degrees (perspective zoom)
        f = jnp.deg2rad(40.0 + 20.0 * jnp.sin(time.elapsed * 0.9))
        cam.camera3d.fov = jnp.broadcast_to(f, cam.camera3d.fov.shape)

    app.add_systems(Update, zoom)
    return app


if __name__ == "__main__":
    from bevy_tpu.render.plugin import frame_image
    app = build_app()
    for _ in range(15):
        app.update(dt=1 / 60)
    np.save("/tmp/projection_zoom.npy", frame_image(app))
    print("saved /tmp/projection_zoom.npy")
