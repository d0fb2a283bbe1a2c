"""Random shape sampling (reference twin:
examples/math/random_sampling.rs — draw points sampled from shape
interiors/boundaries; the sampling module mirrors bevy_math
src/sampling/)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

from bevy_tpu import App, Update
from bevy_tpu.ecs.system import system
from bevy_tpu.math import sampling
from bevy_tpu.render import Camera2d, RenderPlugin, SpritePlugin
from bevy_tpu.render.gizmos import Gizmos, GizmosPlugin
from bevy_tpu.time import TimePlugin
from bevy_tpu.transform import TransformPlugin, transform_bundle


def build_app(width=320, height=180, n=160, seed=5):
    import jax

    app = App(capacity=8)
    app.add_plugins(TimePlugin(), TransformPlugin(),
                    RenderPlugin(width=width, height=height),
                    SpritePlugin(), GizmosPlugin())
    app.world.spawn(Camera2d(), *transform_bundle())
    key = jax.random.PRNGKey(seed)
    k1, k2 = jax.random.split(key)
    inside = np.asarray(sampling.sample_circle_interior(k1, n, 60.0)) \
        if hasattr(sampling, "sample_circle_interior") else None
    if inside is None:
        u = np.asarray(jax.random.uniform(k1, (n, 2)))
        r = 60.0 * np.sqrt(u[:, 0])
        th = 2 * np.pi * u[:, 1]
        inside = np.stack([r * np.cos(th), r * np.sin(th)], -1)
    ring_t = np.asarray(jax.random.uniform(k2, (n // 2,))) * 2 * np.pi
    ring = np.stack([90.0 * np.cos(ring_t), 60.0 * np.sin(ring_t)], -1)

    @system
    def draw(g=Gizmos()):
        for p in inside:
            g.circle_2d((float(p[0]) - 70.0, float(p[1])), 1.5,
                        (0.3, 0.9, 0.5, 1.0))
        for p in ring:
            g.circle_2d((float(p[0]) + 60.0, float(p[1])), 1.5,
                        (0.9, 0.5, 0.3, 1.0))

    app.add_systems(Update, draw)
    return app


if __name__ == "__main__":
    from bevy_tpu.render.plugin import frame_image
    app = build_app()
    app.update(dt=1 / 60)
    np.save("/tmp/random_sampling.npy", frame_image(app))
    print("saved /tmp/random_sampling.npy")
