"""Clear color (reference twin: examples/window/clear_color.rs — the
background color resource changes at runtime)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax.numpy as jnp

from bevy_tpu import App, Res, ResMut, Update
from bevy_tpu.ecs.system import system
from bevy_tpu.render import Camera2d, RenderPlugin, SpritePlugin
from bevy_tpu.render.plugin import ClearColor
from bevy_tpu.time import Time, TimePlugin
from bevy_tpu.transform import TransformPlugin, transform_bundle


def build_app(width=256, height=144):
    app = App(capacity=4)
    app.add_plugins(TimePlugin(), TransformPlugin(),
                    RenderPlugin(width=width, height=height),
                    SpritePlugin())
    app.world.spawn(Camera2d(), *transform_bundle())
    app.insert_resource(ClearColor(color=(0.1, 0.0, 0.2, 1.0)))

    @system
    def cycle(clear=ResMut(ClearColor), time=Res(Time)):
        t = time.elapsed
        clear.color = jnp.stack([0.5 + 0.5 * jnp.sin(t),
                                 0.2 + 0.2 * jnp.sin(t * 1.7),
                                 0.5 + 0.5 * jnp.cos(t),
                                 jnp.ones_like(t)])

    app.add_systems(Update, cycle)
    return app


if __name__ == "__main__":
    from bevy_tpu.render.plugin import frame_image
    app = build_app()
    for _ in range(20):
        app.update(dt=1 / 60)
    img = frame_image(app)
    print("background now:", img[0, 0].tolist())
