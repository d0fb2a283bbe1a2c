"""Bloom test (ref model: bevy_post_process bloom — bright emissive
surfaces glow beyond their footprint)."""

import numpy as np

from bevy_tpu import App
from bevy_tpu.render import Camera2d, RenderPlugin, Sprite, SpritePlugin
from bevy_tpu.render.plugin import frame_image
from bevy_tpu.render.post import BloomPlugin
from bevy_tpu.time import TimePlugin
from bevy_tpu.transform import TransformPlugin, transform_bundle


def _scene(bloom):
    app = App(capacity=16)
    plugins = [TimePlugin(), TransformPlugin(),
               RenderPlugin(width=128, height=64), SpritePlugin()]
    if bloom:
        plugins.append(BloomPlugin(threshold=1.0, intensity=0.6))
    app.add_plugins(*plugins)
    app.world.spawn(Camera2d(), *transform_bundle())
    # HDR-bright sprite (color > 1 in linear space)
    app.world.spawn(Sprite(size=(12.0, 12.0), color=(6.0, 6.0, 6.0, 1.0)),
                    *transform_bundle())
    app.update(dt=1 / 60)
    return frame_image(app).astype(int)


def test_bright_sprite_glows():
    plain = _scene(bloom=False)
    bloomed = _scene(bloom=True)
    # outside the 12px sprite (center 64,32 → halo ring at ~±12px)
    halo_plain = plain[32, 64 + 14, 0]
    halo_bloom = bloomed[32, 64 + 14, 0]
    assert halo_bloom > halo_plain + 15, (halo_plain, halo_bloom)
    # far background unaffected
    assert abs(int(bloomed[5, 5, 0]) - int(plain[5, 5, 0])) <= 6
