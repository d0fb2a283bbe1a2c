"""Automatic instancing (reference twin:
examples/shader/automatic_instancing.rs — same mesh+material handles
batch into one instanced draw; here the uniform-batch grouper turns
the shared-mesh scene into ONE batched matmul + raster pass)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

from bevy_tpu import App
from bevy_tpu.render import RenderPlugin
from bevy_tpu.render.camera import Camera3d
from bevy_tpu.render.mesh import uv_sphere
from bevy_tpu.render.mesh3d import (
    AmbientLight, DirectionalLight, Mesh3d, MeshMaterial, Mesh3dPlugin,
)
from bevy_tpu.time import TimePlugin
from bevy_tpu.transform import (
    GlobalTransform, Transform, TransformPlugin, transform_bundle,
)


def build_app(width=320, height=180, backend="pallas_interpret", n=100):
    app = App(capacity=256)
    plugin = Mesh3dPlugin(backend=backend)
    sphere = plugin.add_mesh(uv_sphere(0.12, 12, 8))
    app.add_plugins(TimePlugin(), TransformPlugin(),
                    RenderPlugin(width=width, height=height), plugin)
    app.insert_resource(AmbientLight(brightness=0.25))
    app.world.spawn(Camera3d(), *transform_bundle(translation=(0, 0, 6)))
    app.world.spawn(DirectionalLight(),
                    *transform_bundle(rotation=(-0.35, 0.0, 0.0, 0.94)))
    side = int(np.ceil(np.sqrt(n)))
    i = np.arange(n)
    pos = np.stack([(i % side - side / 2) * 0.4,
                    (i // side - side / 2) * 0.4,
                    np.zeros(n)], 1).astype(np.float32)
    # one spawn_batch, one mesh id -> ONE uniform batch (the automatic
    # instancing: no per-entity draw calls exist at all)
    app.world.spawn_batch([
        Mesh3d(mesh=sphere), MeshMaterial(base_color=(0.8, 0.7, 0.3, 1.0)),
        Transform(translation=pos), GlobalTransform(translation=pos)], n)
    return app


if __name__ == "__main__":
    from bevy_tpu.render.plugin import frame_image
    app = build_app()
    app.update(dt=1 / 60)
    groups = app._plugins[-1]._groups if hasattr(
        app._plugins[-1], "_groups") else None
    plugin = next(p for p in app._plugins if isinstance(p, Mesh3dPlugin))
    print("uniform batches:", 1 if plugin._uniform or plugin._groups else 0)
    np.save("/tmp/automatic_instancing.npy", frame_image(app))
    print("saved /tmp/automatic_instancing.npy")
