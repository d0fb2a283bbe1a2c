"""3D lines (reference twin: examples/3d/lines.rs — a line-list
material; gizmo polylines are the TPU path for line primitives)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

from bevy_tpu import App, Update
from bevy_tpu.ecs.system import system
from bevy_tpu.render import RenderPlugin
from bevy_tpu.render.camera import Camera3d
from bevy_tpu.render.gizmos import Gizmos, GizmosPlugin
from bevy_tpu.render.mesh3d import Mesh3dPlugin
from bevy_tpu.time import TimePlugin
from bevy_tpu.transform import TransformPlugin, transform_bundle


def build_app(width=320, height=180, backend="pallas_interpret"):
    app = App(capacity=8)
    plugin = Mesh3dPlugin(backend=backend)
    app.add_plugins(TimePlugin(), TransformPlugin(),
                    RenderPlugin(width=width, height=height), plugin,
                    GizmosPlugin())
    app.world.spawn(Camera3d(), *transform_bundle(translation=(0, 1, 4)))

    @system
    def draw(g=Gizmos()):
        g.line((-1.5, 0.0, 0.0), (1.5, 0.8, 0.0), (1.0, 0.2, 0.2, 1.0))
        g.line((-1.5, 0.4, 0.0), (1.5, -0.6, 0.0), (0.2, 1.0, 0.4, 1.0))
        pts = [(np.cos(a) * 1.2, np.sin(a) * 0.7, 0.0)
               for a in np.linspace(0, 2 * np.pi, 24)]
        g.linestrip(pts, (0.3, 0.5, 1.0, 1.0))

    app.add_systems(Update, draw)
    return app


if __name__ == "__main__":
    from bevy_tpu.render.plugin import frame_image
    app = build_app()
    app.update(dt=1 / 60)
    np.save("/tmp/lines_3d.npy", frame_image(app))
    print("saved /tmp/lines_3d.npy")
