"""2D split-screen (reference twin: the 2D half of Camera::viewport —
two ortho cameras with half-screen viewport rects following two
different sprites; ref: examples/2d pattern + Camera::order).

Run: python examples/split_screen_2d.py — saves /tmp/split2d_frame.npy.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax.numpy as jnp
import numpy as np

from bevy_tpu import App, Query, Update
from bevy_tpu.ecs.query import Read, Res
from bevy_tpu.ecs.system import system
from bevy_tpu.render import RenderPlugin
from bevy_tpu.render.camera import Camera2d
from bevy_tpu.render.sprite import Sprite, SpritePlugin
from bevy_tpu.time import Time, TimePlugin
from bevy_tpu.transform import Transform, TransformPlugin, transform_bundle

W, H = 640, 360


def build_app():
    app = App(capacity=256)
    app.add_plugins(TimePlugin(), TransformPlugin(),
                    RenderPlugin(width=W, height=H),
                    SpritePlugin(max_cameras=2))

    # left viewport: world around the origin; right: a far-away arena
    app.world.spawn(Camera2d(order=0, vp_min=(0.0, 0.0), vp_max=(0.5, 1.0)),
                    *transform_bundle(translation=(0.0, 0.0, 0.0)))
    app.world.spawn(Camera2d(order=1, vp_min=(0.5, 0.0), vp_max=(1.0, 1.0)),
                    *transform_bundle(translation=(5000.0, 0.0, 0.0)))

    # orbiting "player" sprites, one per arena
    app.world.spawn(Sprite(size=(30.0, 30.0), color=(1.0, 0.3, 0.2, 1.0)),
                    *transform_bundle(translation=(0.0, 0.0, 1.0)))
    app.world.spawn(Sprite(size=(30.0, 30.0), color=(0.2, 0.9, 0.3, 1.0)),
                    *transform_bundle(translation=(5000.0, 0.0, 1.0)))
    # static props so each camera has parallax context
    for i in range(8):
        a = i / 8 * 2 * np.pi
        for cx, col in ((0.0, (0.4, 0.5, 1.0, 1.0)),
                        (5000.0, (1.0, 0.8, 0.2, 1.0))):
            app.world.spawn(
                Sprite(size=(16.0, 16.0), color=col),
                *transform_bundle(translation=(
                    cx + 120 * np.cos(a), 120 * np.sin(a), 0.0)))

    @system
    def orbit(q=Query(Transform, Read(Sprite)),
              time=Res(Time)):
        big = q.sprite.size[:, 0] > 20.0
        t = time.elapsed
        base = q.transform.translation
        home_x = jnp.where(base[:, 0] > 2500.0, 5000.0, 0.0)
        r = 80.0
        q.transform.translation = jnp.where(
            big[:, None],
            jnp.stack([home_x + r * jnp.cos(t + home_x),
                       r * jnp.sin(t + home_x),
                       base[:, 2]], -1),
            base)

    app.add_systems(Update, orbit)
    return app


if __name__ == "__main__":
    from bevy_tpu.render.plugin import frame_image

    app = build_app()
    for _ in range(5):
        app.update(dt=1 / 60)
    img = frame_image(app)
    np.save("/tmp/split2d_frame.npy", img)
    print("saved /tmp/split2d_frame.npy", img.shape)
