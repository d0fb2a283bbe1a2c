"""Render math primitives (reference twin:
examples/math/render_primitives.rs — each bevy_math primitive drawn as
gizmos in 2D)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

from bevy_tpu import App, Update
from bevy_tpu.ecs.system import system
from bevy_tpu.render import Camera2d, RenderPlugin, SpritePlugin
from bevy_tpu.render.gizmos import Gizmos, GizmosPlugin
from bevy_tpu.time import TimePlugin
from bevy_tpu.transform import TransformPlugin, transform_bundle


def build_app(width=480, height=200):
    app = App(capacity=8)
    app.add_plugins(TimePlugin(), TransformPlugin(),
                    RenderPlugin(width=width, height=height),
                    SpritePlugin(), GizmosPlugin())
    app.world.spawn(Camera2d(), *transform_bundle())

    @system
    def draw(g=Gizmos()):
        col = (0.9, 0.6, 0.2, 1.0)
        # circle / rect / triangle / line / polygon / annulus-ish
        g.circle_2d((-180.0, 0.0), 30.0, col)
        g.rect_2d((-90.0, 0.0), (55.0, 40.0), col)
        g.linestrip_2d([(0.0, 30.0), (-25.0, -25.0), (25.0, -25.0),
                        (0.0, 30.0)], col)
        g.line_2d((60.0, -25.0), (120.0, 25.0), col)
        a = np.linspace(0, 2 * np.pi, 7)
        g.linestrip_2d([(180.0 + 28 * np.cos(t), 28 * np.sin(t))
                        for t in a], col)
        g.circle_2d((180.0, 0.0), 14.0, (0.4, 0.6, 0.9, 1.0))

    app.add_systems(Update, draw)
    return app


if __name__ == "__main__":
    from bevy_tpu.render.plugin import frame_image
    app = build_app()
    app.update(dt=1 / 60)
    np.save("/tmp/render_primitives.npy", frame_image(app))
    print("saved /tmp/render_primitives.npy")
