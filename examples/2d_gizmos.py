"""2D gizmos (reference twin: examples/gizmos/2d_gizmos.rs — the
immediate-mode debug-draw vocabulary cycling through shapes)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax.numpy as jnp
import numpy as np

from bevy_tpu import App, Update
from bevy_tpu.ecs.query import Res
from bevy_tpu.ecs.system import system
from bevy_tpu.render import Camera2d, RenderPlugin, SpritePlugin
from bevy_tpu.render.gizmos import Gizmos, GizmosPlugin
from bevy_tpu.time import Time, TimePlugin
from bevy_tpu.transform import TransformPlugin, transform_bundle


def build_app(width=480, height=270):
    app = App(capacity=64)
    app.add_plugins(TimePlugin(), TransformPlugin(),
                    RenderPlugin(width=width, height=height),
                    SpritePlugin(), GizmosPlugin(capacity=512))
    app.world.spawn(Camera2d(), *transform_bundle())

    @system
    def draw(g=Gizmos(), time=Res(Time)):
        t = time.elapsed
        g.line_2d(jnp.asarray([-180.0, 0.0]), jnp.asarray([180.0, 0.0]),
                  color=(0.4, 0.4, 0.5, 1.0))
        g.circle_2d(jnp.asarray([0.0, 0.0]), 60.0 + 10.0 * jnp.sin(t),
                    color=(1.0, 0.4, 0.2, 1.0))
        g.rect_2d(jnp.asarray([-120.0, 50.0]), jnp.asarray([60.0, 40.0]),
                  color=(0.2, 0.9, 0.4, 1.0))
        g.arrow_2d(jnp.asarray([100.0, -60.0]),
                   jnp.asarray([100.0 + 50.0 * jnp.cos(t),
                                -60.0 + 50.0 * jnp.sin(t)]),
                   color=(0.4, 0.6, 1.0, 1.0))
        pts = jnp.stack([jnp.asarray([-160.0 + 20.0 * i,
                                      -90.0 + 25.0 * jnp.sin(t + i)])
                         for i in range(8)])
        g.linestrip_2d(pts, color=(1.0, 0.9, 0.3, 1.0))

    app.add_systems(Update, draw)
    return app


if __name__ == "__main__":
    from bevy_tpu.render.plugin import frame_image

    app = build_app()
    for _ in range(3):
        app.update(dt=1 / 60)
    np.save("/tmp/2d_gizmos_frame.npy", frame_image(app))
    print("saved /tmp/2d_gizmos_frame.npy")
