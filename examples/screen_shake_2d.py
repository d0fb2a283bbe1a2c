"""2D screen shake (reference twin: examples/camera/2d_screen_shake.rs
— trauma-driven decaying noise offsets the camera transform)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax.numpy as jnp

from bevy_tpu import App, Query, Res, ResMut, Update, With
from bevy_tpu.ecs.system import system
from bevy_tpu.render import (
    AtlasBuilder, Camera2d, RenderPlugin, SpritePlugin, TextureAtlas,
)
from bevy_tpu.render.sprite import sprite_from_handle
from bevy_tpu.time import Time, TimePlugin
from bevy_tpu.transform import Transform, TransformPlugin, transform_bundle


def build_app(width=320, height=180):
    app = App(capacity=8)
    app.add_plugins(TimePlugin(), TransformPlugin(),
                    RenderPlugin(width=width, height=height),
                    SpritePlugin())
    app.world.spawn(Camera2d(), *transform_bundle())
    atlas = AtlasBuilder(32, 32)
    img = np.ones((32, 32, 4), np.float32)
    img[..., :3] = (0.2, 0.7, 0.4)
    h = atlas.add(img, "block", srgb=False)
    app.insert_resource(TextureAtlas.RESOURCE, {"data": atlas.build()})
    for x in (-80.0, 0.0, 80.0):
        app.world.spawn(sprite_from_handle(h, size=(40.0, 40.0)),
                        *transform_bundle(translation=(x, 0.0, 0.0)))
    # trauma decays; add_trauma() kicks it (the reference's resource)
    app.insert_resource("screen_shake",
                        {"trauma": jnp.asarray(1.0, jnp.float32)})

    @system
    def shake(cam=Query(Transform, With(Camera2d)), time=Res(Time),
              st=ResMut("screen_shake")):
        tr = jnp.maximum(st.trauma - time.delta * 0.8, 0.0)
        st.trauma = tr
        amp = tr * tr * 12.0            # shake ~ trauma^2
        t = time.elapsed
        dx = amp * jnp.sin(t * 73.0)
        dy = amp * jnp.sin(t * 97.0 + 1.7)
        cam.transform.translation = jnp.broadcast_to(
            jnp.stack([dx, dy, jnp.zeros_like(dx)]),
            cam.transform.translation.shape)

    app.add_systems(Update, shake)
    return app


if __name__ == "__main__":
    import jax
    app = build_app()
    for _ in range(30):
        app.update(dt=1 / 60)
    tr = float(np.asarray(jax.device_get(
        app.world.state["res"]["screen_shake"]["trauma"])))
    print(f"trauma after 0.5s: {tr:.2f} (decaying)")
