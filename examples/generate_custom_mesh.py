"""Generate a custom mesh (reference twin:
examples/3d/generate_custom_mesh.rs — build vertex/index buffers by
hand; here a procedural terrain patch built from numpy arrays)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

from bevy_tpu import App
from bevy_tpu.render import RenderPlugin
from bevy_tpu.render.camera import Camera3d
from bevy_tpu.render.mesh import Mesh
from bevy_tpu.render.mesh3d import (
    AmbientLight, DirectionalLight, Mesh3d, MeshMaterial, Mesh3dPlugin,
)
from bevy_tpu.time import TimePlugin
from bevy_tpu.transform import TransformPlugin, transform_bundle


def terrain_mesh(n=24, size=4.0):
    """Height-field grid with per-vertex normals (the hand-built
    ATTRIBUTE_POSITION/NORMAL/indices of the reference)."""
    ax = np.linspace(-size / 2, size / 2, n, dtype=np.float32)
    xx, zz = np.meshgrid(ax, ax, indexing="ij")
    yy = 0.35 * np.sin(xx * 2.0) * np.cos(zz * 1.7)
    pos = np.stack([xx, yy, zz], -1).reshape(-1, 3)
    # finite-difference normals
    dyx = np.gradient(yy, axis=0)
    dyz = np.gradient(yy, axis=1)
    nrm = np.stack([-dyx, np.ones_like(yy), -dyz], -1)
    nrm /= np.linalg.norm(nrm, axis=-1, keepdims=True)
    nrm = nrm.reshape(-1, 3).astype(np.float32)
    idx = []
    for i in range(n - 1):
        for j in range(n - 1):
            a = i * n + j
            idx += [[a, a + 1, a + n], [a + 1, a + n + 1, a + n]]
    return Mesh(positions=pos, normals=nrm,
                triangles=np.asarray(idx, np.int32))


def build_app(width=320, height=180, backend="pallas_interpret"):
    app = App(capacity=8)
    plugin = Mesh3dPlugin(backend=backend)
    terrain = plugin.add_mesh(terrain_mesh())
    app.add_plugins(TimePlugin(), TransformPlugin(),
                    RenderPlugin(width=width, height=height), plugin)
    app.insert_resource(AmbientLight(brightness=0.2))
    app.world.spawn(Camera3d(),
                    *transform_bundle(translation=(0, 2.5, 4.5),
                                      rotation=(-0.26, 0.0, 0.0, 0.966)))
    app.world.spawn(DirectionalLight(),
                    *transform_bundle(rotation=(-0.4, 0.2, 0.0, 0.9)))
    app.world.spawn(Mesh3d(mesh=terrain),
                    MeshMaterial(base_color=(0.3, 0.65, 0.3, 1.0)),
                    *transform_bundle())
    return app


if __name__ == "__main__":
    from bevy_tpu.render.plugin import frame_image
    app = build_app()
    app.update(dt=1 / 60)
    np.save("/tmp/generate_custom_mesh.npy", frame_image(app))
    print("saved /tmp/generate_custom_mesh.npy")
