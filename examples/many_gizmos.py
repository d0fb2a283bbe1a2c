"""many_gizmos stress test (reference twin:
examples/stress_tests/many_gizmos.rs — thousands of immediate-mode
lines per frame)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import time as pytime

import numpy as np

from bevy_tpu import App, Update
from bevy_tpu.ecs.system import system
from bevy_tpu.render import Camera2d, RenderPlugin, SpritePlugin
from bevy_tpu.render.gizmos import Gizmos, GizmosPlugin
from bevy_tpu.time import TimePlugin
from bevy_tpu.transform import TransformPlugin, transform_bundle


def build_app(width=320, height=180, n_lines=1000):
    app = App(capacity=8)
    app.add_plugins(TimePlugin(), TransformPlugin(),
                    RenderPlugin(width=width, height=height),
                    SpritePlugin(), GizmosPlugin(capacity=4 * n_lines))
    app.world.spawn(Camera2d(), *transform_bundle())
    rng = np.random.default_rng(11)
    a = (rng.random((n_lines, 2)) - 0.5) * [width, height]
    b = a + (rng.random((n_lines, 2)) - 0.5) * 40.0
    cols = rng.random((n_lines, 3)) * 0.8 + 0.2

    @system
    def draw(g=Gizmos()):
        for i in range(n_lines):
            g.line_2d(tuple(a[i]), tuple(b[i]),
                      (cols[i][0], cols[i][1], cols[i][2], 1.0))

    app.add_systems(Update, draw)
    return app


def main():
    app = build_app()
    app.update(dt=1 / 60)
    t0 = pytime.perf_counter()
    for _ in range(10):
        app.update(dt=1 / 60)
    print(f"many_gizmos: {(pytime.perf_counter() - t0) / 10 * 1000:.1f} "
          "ms/frame (1000 lines)")


if __name__ == "__main__":
    main()
