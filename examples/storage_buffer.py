"""Per-instance storage buffer (reference twin:
examples/shader/storage_buffer.rs — a storage array of colors indexed
per instance in the shader; here a device array resource recolors the
instances each frame before extraction)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax.numpy as jnp
import numpy as np

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


def build_app(width=320, height=180, backend="pallas_interpret", n=5):
    app = App(capacity=16)
    plugin = Mesh3dPlugin(backend=backend)
    cube = plugin.add_mesh(cuboid(0.8, 0.8, 0.8))
    app.add_plugins(TimePlugin(), TransformPlugin(),
                    RenderPlugin(width=width, height=height), plugin)
    app.insert_resource(AmbientLight(brightness=0.3))
    app.world.spawn(Camera3d(), *transform_bundle(translation=(0, 1.5, 6)))
    app.world.spawn(DirectionalLight(),
                    *transform_bundle(rotation=(-0.35, 0.0, 0.0, 0.94)))
    xs = np.linspace(-2.4, 2.4, n, dtype=np.float32)
    pos = np.stack([xs, np.zeros(n, np.float32),
                    np.zeros(n, np.float32)], 1)
    app.world.spawn_batch([
        Mesh3d(mesh=cube), MeshMaterial(),
        Transform(translation=pos), GlobalTransform(translation=pos)], n)
    # the "storage buffer": one device array resource, indexed per row
    app.insert_resource("instance_colors",
                        {"rgba": jnp.zeros((n, 4), jnp.float32)})

    @system
    def animate_colors(q=Query(Mesh3d, MeshMaterial), time=Res(Time),
                       store=Res("instance_colors")):
        i = jnp.arange(q.mesh_material.base_color.shape[0],
                       dtype=jnp.float32)
        t = time.elapsed
        rgba = jnp.stack([0.5 + 0.5 * jnp.sin(t + i),
                          0.5 + 0.5 * jnp.sin(t + i + 2.1),
                          0.5 + 0.5 * jnp.sin(t + i + 4.2),
                          jnp.ones_like(i)], 1)
        q.mesh_material.base_color = rgba

    app.add_systems(Update, animate_colors)
    return app


if __name__ == "__main__":
    import numpy as _np

    from bevy_tpu.render.plugin import frame_image
    app = build_app()
    for _ in range(12):
        app.update(dt=1 / 60)
    _np.save("/tmp/storage_buffer.npy", frame_image(app))
    print("saved /tmp/storage_buffer.npy")
