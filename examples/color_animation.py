"""Color animation (reference twin: examples/animation/color_animation.rs
— animating colors through different color spaces; perceptual Oklab
mixing vs raw sRGB lerp, vectorized over all sprites)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax.numpy as jnp

from bevy_tpu import App, Query, Res, Update
from bevy_tpu.color import linear_to_oklab, mix, oklab_to_linear, srgba
from bevy_tpu.ecs.component import component, field
from bevy_tpu.ecs.system import system
from bevy_tpu.render import Camera2d, RenderPlugin, Sprite, SpritePlugin
from bevy_tpu.time import Time, TimePlugin
from bevy_tpu.transform import TransformPlugin, transform_bundle

RED = jnp.asarray(srgba(0.9, 0.1, 0.1))
BLUE = jnp.asarray(srgba(0.1, 0.2, 0.9))


@component
class ColorLane:
    perceptual = field((), jnp.bool_)    # Oklab mix vs linear lerp


def build_app(width=320, height=180):
    app = App(capacity=8)
    app.add_plugins(TimePlugin(), TransformPlugin(),
                    RenderPlugin(width=width, height=height), SpritePlugin())
    app.world.spawn(Camera2d(), *transform_bundle())
    app.world.spawn(Sprite(size=(120.0, 60.0)), ColorLane(perceptual=True),
                    *transform_bundle(translation=(0.0, 45.0, 0.0)))
    app.world.spawn(Sprite(size=(120.0, 60.0)), ColorLane(perceptual=False),
                    *transform_bundle(translation=(0.0, -45.0, 0.0)))

    @system
    def animate(q=Query(Sprite, ColorLane), time=Res(Time)):
        t = 0.5 + 0.5 * jnp.sin(time.elapsed * 2.0)
        pera = mix(RED, BLUE, t)                   # Oklab (perceptual)
        lin = RED + (BLUE - RED) * t               # straight linear lerp
        sel = q.color_lane.perceptual[:, None]
        q.sprite.color = jnp.where(sel, pera[None, :], lin[None, :])

    app.add_systems(Update, animate)
    return app


if __name__ == "__main__":
    app = build_app()
    for _ in range(20):
        app.update(dt=1 / 60)
    import numpy as np
    c = np.asarray(app.world.state["comp"]["sprite"]["f"]["color"])[1:3]
    print("perceptual:", c[0].round(3), " linear:", c[1].round(3))
