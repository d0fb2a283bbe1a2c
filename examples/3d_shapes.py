"""3D primitive shapes (reference twin: examples/3d/3d_shapes.rs — one
of each built-in mesher on a turntable under a directional light)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax.numpy as jnp
import numpy as np

from bevy_tpu import App, Query, Update
from bevy_tpu.ecs.query import Read, Res
from bevy_tpu.ecs.system import system
from bevy_tpu.render import RenderPlugin
from bevy_tpu.render.camera import Camera3d
from bevy_tpu.render.mesh import (
    capsule, cone, cuboid, cylinder, plane, torus, uv_sphere,
)
from bevy_tpu.render.mesh3d import (
    AmbientLight, DirectionalLight, Mesh3d, MeshMaterial, Mesh3dPlugin,
)
from bevy_tpu.time import Time, TimePlugin
from bevy_tpu.transform import Transform, TransformPlugin, transform_bundle


def build_app(width=800, height=450, backend="auto"):
    app = App(capacity=64)
    plugin = Mesh3dPlugin(backend=backend)
    app.add_plugins(TimePlugin(), TransformPlugin(),
                    RenderPlugin(width=width, height=height), plugin)
    app.insert_resource(AmbientLight(brightness=0.25))
    app.world.spawn(Camera3d(),
                    *transform_bundle(translation=(0.0, 2.2, 9.0),
                                      rotation=(-0.12, 0.0, 0.0, 0.993)))
    app.world.spawn(DirectionalLight(illuminance=1.0),
                    *transform_bundle(rotation=(-0.35, 0.25, 0.0, 0.9)))
    shapes = [cuboid(1.1, 1.1, 1.1), uv_sphere(0.65, 24, 16),
              cylinder(0.55, 1.1), torus(0.45, 0.22),
              cone(0.6, 1.1), capsule(0.45, 0.7)]
    n = len(shapes)
    for i, mesh in enumerate(shapes):
        hue = i / n
        col = (0.5 + 0.5 * np.cos(6.28 * hue),
               0.5 + 0.5 * np.cos(6.28 * (hue + 1 / 3)),
               0.5 + 0.5 * np.cos(6.28 * (hue + 2 / 3)), 1.0)
        app.world.spawn(
            Mesh3d(mesh=plugin.add_mesh(mesh)),
            MeshMaterial(base_color=col, perceptual_roughness=0.4,
                         metallic=0.1),
            *transform_bundle(translation=((i - (n - 1) / 2) * 1.8,
                                           1.0, 0.0)))
    app.world.spawn(
        Mesh3d(mesh=plugin.add_mesh(plane(16.0, 10.0))),
        MeshMaterial(base_color=(0.35, 0.4, 0.45, 1.0),
                     perceptual_roughness=0.95),
        *transform_bundle(translation=(0.0, 0.0, 0.0)))

    @system
    def turntable(q=Query(Transform, Read(Mesh3d)), time=Res(Time)):
        t = time.elapsed
        half = jnp.sin(t * 0.7 * 0.5)
        q.transform.rotation = jnp.where(
            (q.transform.translation[:, 1] > 0.5)[:, None],
            jnp.stack([jnp.zeros_like(half), half,
                       jnp.zeros_like(half), jnp.cos(t * 0.7 * 0.5) *
                       jnp.ones_like(half)], -1),
            q.transform.rotation)

    app.add_systems(Update, turntable)
    return app


if __name__ == "__main__":
    from bevy_tpu.render.plugin import frame_image

    app = build_app()
    for _ in range(3):
        app.update(dt=1 / 60)
    np.save("/tmp/3d_shapes_frame.npy", frame_image(app))
    print("saved /tmp/3d_shapes_frame.npy")
