"""RenderLayers tests (ref model: bevy_camera visibility/render_layers.rs —
entities render only to cameras sharing a layer bit)."""

import numpy as np

from bevy_tpu import App
from bevy_tpu.render import Camera2d, RenderPlugin, Sprite, SpritePlugin
from bevy_tpu.render.plugin import frame_image
from bevy_tpu.time import TimePlugin
from bevy_tpu.transform import TransformPlugin, transform_bundle


def _app(cam_layers):
    app = App(capacity=16)
    app.add_plugins(TimePlugin(), TransformPlugin(),
                    RenderPlugin(width=96, height=48), SpritePlugin())
    app.world.spawn(Camera2d(layers=cam_layers), *transform_bundle())
    app.world.spawn(Sprite(size=(20.0, 20.0), color=(1.0, 0.0, 0.0, 1.0),
                           layers=1),
                    *transform_bundle(translation=(-20.0, 0.0, 0.0)))
    app.world.spawn(Sprite(size=(20.0, 20.0), color=(0.0, 1.0, 0.0, 1.0),
                           layers=2),
                    *transform_bundle(translation=(20.0, 0.0, 0.0)))
    app.update(dt=1 / 60)
    return frame_image(app).astype(int)


def _visible(img, x):
    px = img[24, x]
    return px[:3].max() > 150


def test_camera_sees_only_its_layers():
    img = _app(cam_layers=1)
    assert _visible(img, 28), "layer-1 sprite missing"
    assert not _visible(img, 68), "layer-2 sprite leaked through"

    img2 = _app(cam_layers=2)
    assert not _visible(img2, 28)
    assert _visible(img2, 68)

    both = _app(cam_layers=3)
    assert _visible(both, 28) and _visible(both, 68)
