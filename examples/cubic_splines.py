"""Cubic splines (reference twin: examples/math/cubic_splines.rs —
bezier curves sampled and drawn as gizmo polylines)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

from bevy_tpu import App, Update
from bevy_tpu.ecs.system import system
from bevy_tpu.math.curve import cubic_bezier
from bevy_tpu.render import Camera2d, RenderPlugin, SpritePlugin
from bevy_tpu.render.gizmos import Gizmos, GizmosPlugin
from bevy_tpu.time import TimePlugin
from bevy_tpu.transform import TransformPlugin, transform_bundle


def build_app(width=320, height=180):
    app = App(capacity=8)
    app.add_plugins(TimePlugin(), TransformPlugin(),
                    RenderPlugin(width=width, height=height),
                    SpritePlugin(), GizmosPlugin())
    app.world.spawn(Camera2d(), *transform_bundle())
    ctrl = np.asarray([[-120.0, -40.0], [-60.0, 80.0],
                       [60.0, -90.0], [120.0, 50.0]], np.float32)
    curve = cubic_bezier(ctrl)
    ts = np.linspace(0.0, 1.0, 48, dtype=np.float32)
    pts = np.asarray([np.asarray(curve.position(t)) for t in ts])

    @system
    def draw(g=Gizmos()):
        g.linestrip_2d([tuple(p) for p in pts], (0.9, 0.7, 0.2, 1.0))
        for p in ctrl:
            g.circle_2d(tuple(p), 4.0, (0.3, 0.8, 1.0, 1.0))
        g.linestrip_2d([tuple(p) for p in ctrl], (0.4, 0.4, 0.5, 1.0))

    app.add_systems(Update, draw)
    return app


if __name__ == "__main__":
    from bevy_tpu.render.plugin import frame_image
    app = build_app()
    app.update(dt=1 / 60)
    np.save("/tmp/cubic_splines.npy", frame_image(app))
    print("saved /tmp/cubic_splines.npy")
