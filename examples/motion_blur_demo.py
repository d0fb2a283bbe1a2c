"""Motion blur with per-object velocity (reference twin:
examples/3d/motion_blur.rs — the spinning-camera + moving-cars demo;
here a fast cube streaks while the static scene stays sharp, driven by
the per-object motion vectors of Mesh3dPlugin(motion_vectors=True))."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax.numpy as jnp

from bevy_tpu import App, Query, Res, Update, With
from bevy_tpu.ecs.component import component
from bevy_tpu.ecs.system import system
from bevy_tpu.render import RenderPlugin
from bevy_tpu.render.camera import Camera3d
from bevy_tpu.render.mesh import cuboid
from bevy_tpu.render.mesh3d import (
    AmbientLight, DirectionalLight, Mesh3d, MeshMaterial, Mesh3dPlugin,
)
from bevy_tpu.render.post import MotionBlurPlugin
from bevy_tpu.time import Time, TimePlugin
from bevy_tpu.transform import Transform, TransformPlugin, transform_bundle


@component
class Racer:
    pass


def build_app(width=320, height=180, backend="pallas_interpret"):
    app = App(capacity=16)
    plugin = Mesh3dPlugin(backend=backend, motion_vectors=True)
    cube = plugin.add_mesh(cuboid(0.8, 0.5, 0.5))
    slab = plugin.add_mesh(cuboid(8.0, 0.2, 3.0))
    app.add_plugins(TimePlugin(), TransformPlugin(),
                    RenderPlugin(width=width, height=height), plugin,
                    MotionBlurPlugin(strength=0.8, taps=4))
    app.insert_resource(AmbientLight(brightness=0.3))
    app.world.spawn(Camera3d(), *transform_bundle(translation=(0, 1.5, 6)))
    app.world.spawn(DirectionalLight(),
                    *transform_bundle(rotation=(-0.35, 0.0, 0.0, 0.94)))
    app.world.spawn(Mesh3d(mesh=slab),
                    MeshMaterial(base_color=(0.4, 0.4, 0.45, 1.0)),
                    *transform_bundle(translation=(0.0, -0.6, 0.0)))
    app.world.spawn(Mesh3d(mesh=cube),
                    MeshMaterial(base_color=(0.95, 0.3, 0.1, 1.0)),
                    Racer(), *transform_bundle(translation=(-3.0, 0, 0)))

    @system
    def race(q=Query(Transform, With(Racer)), time=Res(Time)):
        # ping-pong at high speed: strong per-object velocity
        t = time.elapsed
        x = 3.0 * jnp.sin(t * 4.0)
        q.transform.translation = q.transform.translation.at[:, 0].set(x)

    app.add_systems(Update, race)
    return app


if __name__ == "__main__":
    from bevy_tpu.render.plugin import frame_image
    app = build_app()
    for _ in range(10):
        app.update(dt=1 / 60)
    np.save("/tmp/motion_blur.npy", frame_image(app))
    print("saved /tmp/motion_blur.npy")
