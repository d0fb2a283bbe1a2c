"""Auto exposure (reference twin: examples/3d/auto_exposure.rs — the
exposure adapts as scene brightness swings)."""

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
from bevy_tpu.render.mesh import uv_sphere
from bevy_tpu.render.mesh3d import (
    AmbientLight, DirectionalLight, Mesh3d, MeshMaterial, Mesh3dPlugin,
)
from bevy_tpu.render.post import AutoExposurePlugin
from bevy_tpu.time import Time, TimePlugin
from bevy_tpu.transform import TransformPlugin, transform_bundle


def build_app(width=256, height=144, backend="pallas_interpret"):
    app = App(capacity=8)
    plugin = Mesh3dPlugin(backend=backend)
    sphere = plugin.add_mesh(uv_sphere(0.9, 20, 14))
    app.add_plugins(TimePlugin(), TransformPlugin(),
                    RenderPlugin(width=width, height=height), plugin,
                    AutoExposurePlugin())
    app.insert_resource(AmbientLight(brightness=0.2))
    app.world.spawn(Camera3d(), *transform_bundle(translation=(0, 0, 3)))
    light = app.world.spawn(
        DirectionalLight(illuminance=1.0),
        *transform_bundle(rotation=(-0.35, 0.0, 0.0, 0.94)))
    app.world.spawn(Mesh3d(mesh=sphere),
                    MeshMaterial(base_color=(0.8, 0.8, 0.8, 1.0)),
                    *transform_bundle())

    @system
    def swing_light(q=Query(DirectionalLight), time=Res(Time)):
        # 0.1x to 4x brightness swing: auto exposure compensates
        lum = 2.0 + 1.9 * jnp.sin(time.elapsed * 1.5)
        q.directional_light.illuminance = jnp.broadcast_to(
            lum, q.directional_light.illuminance.shape)

    app.add_systems(Update, swing_light)
    return app


if __name__ == "__main__":
    from bevy_tpu.render.plugin import frame_image
    app = build_app()
    for _ in range(20):
        app.update(dt=1 / 60)
    img = frame_image(app)
    print("mean luminance after adaptation:",
          float(np.asarray(img[..., :3]).mean()))
