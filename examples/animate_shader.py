"""Animated material (reference twin: examples/shader/animate_shader.rs
— a time uniform drives the fragment shader; here Update animates the
material columns and a custom material function consumes them, the
trace-once time-uniform pattern)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax.numpy as jnp

from bevy_tpu import App, Query, Res, Update
from bevy_tpu.ecs.system import system
from bevy_tpu.render import RenderPlugin
from bevy_tpu.render.camera import Camera3d
from bevy_tpu.render.mesh import uv_sphere
from bevy_tpu.render.mesh3d import (
    DirectionalLight, Mesh3d, MeshMaterial, Mesh3dPlugin,
)
from bevy_tpu.time import Time, TimePlugin
from bevy_tpu.transform import TransformPlugin, transform_bundle


def pulse_material(n, mat, ok, light_vec):
    """Emissive pulse: the per-frame 'time uniform' arrives through the
    animated emissive column (mat[..., 4:7])."""
    lam = jnp.maximum(0.0, -(n[..., 0] * light_vec[0] +
                             n[..., 1] * light_vec[1] +
                             n[..., 2] * light_vec[2]))
    rgb = mat[..., 0:3] * (0.2 + 0.8 * lam[..., None]) + mat[..., 4:7]
    return jnp.concatenate([rgb, mat[..., 3:4]], -1)


def build_app(width=320, height=180, backend="pallas_interpret"):
    app = App(capacity=8)
    plugin = Mesh3dPlugin(backend=backend, material_fn=pulse_material)
    sphere = plugin.add_mesh(uv_sphere(0.9, 28, 18))
    app.add_plugins(TimePlugin(), TransformPlugin(),
                    RenderPlugin(width=width, height=height), plugin)
    app.world.spawn(Camera3d(), *transform_bundle(translation=(0, 0, 3)))
    app.world.spawn(DirectionalLight(),
                    *transform_bundle(rotation=(-0.3, 0.2, 0.0, 0.93)))
    app.world.spawn(Mesh3d(mesh=sphere),
                    MeshMaterial(base_color=(0.2, 0.3, 0.8, 1.0)),
                    *transform_bundle())

    @system
    def drive_time(q=Query(Mesh3d, MeshMaterial), time=Res(Time)):
        t = time.elapsed
        pulse = 0.5 + 0.5 * jnp.sin(t * 3.0)
        n_ = q.mesh_material.emissive.shape[0]
        q.mesh_material.emissive = jnp.broadcast_to(
            jnp.stack([pulse, pulse * 0.4, pulse * 0.1]), (n_, 3))

    app.add_systems(Update, drive_time)
    return app


if __name__ == "__main__":
    import numpy as np

    from bevy_tpu.render.plugin import frame_image
    app = build_app()
    for _ in range(20):
        app.update(dt=1 / 60)
    np.save("/tmp/animate_shader.npy", frame_image(app))
    print("saved /tmp/animate_shader.npy")
