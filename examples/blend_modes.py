"""Blend modes (reference twin: examples/3d/blend_modes.rs — opaque,
alpha-blend and additive-ish spheres side by side; transparency goes
through the weighted-OIT phase)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

from bevy_tpu import App
from bevy_tpu.render import RenderPlugin
from bevy_tpu.render.camera import Camera3d
from bevy_tpu.render.mesh import cuboid, uv_sphere
from bevy_tpu.render.mesh3d import (
    AmbientLight, DirectionalLight, Mesh3d, MeshMaterial, Mesh3dPlugin,
)
from bevy_tpu.time import TimePlugin
from bevy_tpu.transform import TransformPlugin, transform_bundle


def build_app(width=320, height=180, backend="pallas_interpret"):
    app = App(capacity=16)
    plugin = Mesh3dPlugin(backend=backend)
    sphere = plugin.add_mesh(uv_sphere(0.6, 20, 14))
    slab = plugin.add_mesh(cuboid(6.0, 0.2, 4.0))
    app.add_plugins(TimePlugin(), TransformPlugin(),
                    RenderPlugin(width=width, height=height), plugin)
    app.insert_resource(AmbientLight(brightness=0.25))
    app.world.spawn(Camera3d(), *transform_bundle(translation=(0, 1.2, 4)))
    app.world.spawn(DirectionalLight(),
                    *transform_bundle(rotation=(-0.35, 0.0, 0.0, 0.94)))
    app.world.spawn(Mesh3d(mesh=slab),
                    MeshMaterial(base_color=(0.5, 0.5, 0.55, 1.0)),
                    *transform_bundle(translation=(0.0, -0.8, 0.0)))
    # alpha 1.0 (opaque phase), 0.6 and 0.25 (OIT transparent phase)
    for x, a in ((-1.5, 1.0), (0.0, 0.6), (1.5, 0.25)):
        app.world.spawn(
            Mesh3d(mesh=sphere),
            MeshMaterial(base_color=(0.9, 0.35, 0.2, a)),
            *transform_bundle(translation=(x, 0.0, 0.0)))
    return app


if __name__ == "__main__":
    from bevy_tpu.render.plugin import frame_image
    app = build_app()
    app.update(dt=1 / 60)
    np.save("/tmp/blend_modes.npy", frame_image(app))
    print("saved /tmp/blend_modes.npy")
