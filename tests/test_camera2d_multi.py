"""2D multi-camera viewports (ref: Camera::viewport + ascending
Camera::order — the split_screen example's 2D analogue)."""

import numpy as np

from bevy_tpu import App
from bevy_tpu.render import RenderPlugin
from bevy_tpu.render.camera import Camera2d
from bevy_tpu.render.plugin import frame_image
from bevy_tpu.render.sprite import Sprite, SpritePlugin
from bevy_tpu.time import TimePlugin
from bevy_tpu.transform import TransformPlugin, transform_bundle

W, H = 256, 128


def _build(max_cameras):
    app = App(capacity=32)
    app.add_plugins(TimePlugin(), TransformPlugin(),
                    RenderPlugin(width=W, height=H),
                    SpritePlugin(max_cameras=max_cameras))
    return app


def test_split_screen_two_viewports():
    """Left camera watches the red sprite at world origin; right camera
    is panned to the green sprite at x=+1000. Each render scoped to its
    viewport half."""
    app = _build(max_cameras=2)
    app.world.spawn(Camera2d(order=0, vp_min=(0.0, 0.0), vp_max=(0.5, 1.0)),
                    *transform_bundle(translation=(0.0, 0.0, 0.0)))
    app.world.spawn(Camera2d(order=1, vp_min=(0.5, 0.0), vp_max=(1.0, 1.0)),
                    *transform_bundle(translation=(1000.0, 0.0, 0.0)))
    app.world.spawn(Sprite(size=(40.0, 40.0), color=(1.0, 0.1, 0.1, 1.0)),
                    *transform_bundle(translation=(0.0, 0.0, 0.0)))
    app.world.spawn(Sprite(size=(40.0, 40.0), color=(0.1, 1.0, 0.1, 1.0)),
                    *transform_bundle(translation=(1000.0, 0.0, 0.0)))
    app.update(dt=1 / 60)
    img = np.asarray(frame_image(app)).astype(int)
    left_center = img[H // 2, W // 4]
    right_center = img[H // 2, 3 * W // 4]
    assert left_center[0] > left_center[1] + 60, left_center    # red
    assert right_center[1] > right_center[0] + 60, right_center  # green
    # each sprite must NOT leak into the other viewport: the red sprite
    # is off-camera for the right view and scissored out of the left
    red_px = (img[..., 0] > img[..., 1] + 60)
    assert not red_px[:, W // 2:].any()
    green_px = (img[..., 1] > img[..., 0] + 60)
    assert not green_px[:, :W // 2].any()


def test_order_controls_draw_sequence():
    """Two full-frame cameras: the higher-order camera draws LAST (on
    top). Give them disjoint RenderLayers so each draws one sprite at
    the same world spot; the later camera's sprite wins."""
    app = _build(max_cameras=2)
    app.world.spawn(Camera2d(order=1, layers=2),
                    *transform_bundle(translation=(0.0, 0.0, 0.0)))
    app.world.spawn(Camera2d(order=0, layers=1),
                    *transform_bundle(translation=(0.0, 0.0, 0.0)))
    app.world.spawn(Sprite(size=(60.0, 60.0), color=(1.0, 0.1, 0.1, 1.0),
                           layers=1),
                    *transform_bundle(translation=(0.0, 0.0, 0.0)))
    app.world.spawn(Sprite(size=(30.0, 30.0), color=(0.1, 0.1, 1.0, 1.0),
                           layers=2),
                    *transform_bundle(translation=(0.0, 0.0, 0.0)))
    app.update(dt=1 / 60)
    img = np.asarray(frame_image(app)).astype(int)
    c = img[H // 2, W // 2]
    assert c[2] > c[0] + 60, c    # blue (order=1) on top
    ring = img[H // 2, W // 2 + 20]
    assert ring[0] > ring[2] + 60, ring  # red visible around it


def test_single_camera_program_unchanged():
    """max_cameras=1 (the default) still renders the first camera."""
    app = _build(max_cameras=1)
    app.world.spawn(Camera2d(), *transform_bundle())
    app.world.spawn(Sprite(size=(20.0, 20.0), color=(1.0, 1.0, 0.1, 1.0)),
                    *transform_bundle())
    app.update(dt=1 / 60)
    img = np.asarray(frame_image(app)).astype(int)
    c = img[H // 2, W // 2]
    assert c[0] > 150 and c[1] > 150, c
