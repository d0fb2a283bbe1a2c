"""Host viewer (ref model: bevy_winit's window + event bridge —
here an MJPEG HTTP server + browser input bridge, bevy_tpu/viewer.py)."""

import json
import urllib.request

import numpy as np

from bevy_tpu import App
from bevy_tpu.input import InputPlugin, KeyCode
from bevy_tpu.render import RenderPlugin
from bevy_tpu.render.camera import Camera2d
from bevy_tpu.render.sprite import Sprite, SpritePlugin
from bevy_tpu.time import TimePlugin
from bevy_tpu.transform import TransformPlugin, transform_bundle
from bevy_tpu.viewer import ViewerPlugin


def _build():
    app = App(capacity=16)
    viewer = ViewerPlugin(port=0)
    app.add_plugins(TimePlugin(), TransformPlugin(), InputPlugin(),
                    RenderPlugin(width=64, height=48),
                    SpritePlugin(), viewer)
    app.world.spawn(Camera2d(), *transform_bundle())
    app.world.spawn(Sprite(size=(20.0, 20.0), color=(1.0, 0.2, 0.2, 1.0)),
                    *transform_bundle())
    return app, viewer


def test_viewer_serves_frame_and_page():
    app, viewer = _build()
    app.update(dt=1 / 60)
    page = urllib.request.urlopen(viewer.url, timeout=5).read()
    assert b"/stream" in page
    jpg = urllib.request.urlopen(viewer.url + "frame.jpg",
                                 timeout=5).read()
    assert jpg[:2] == b"\xff\xd8", "not a JPEG"
    assert len(jpg) > 400
    viewer.shutdown()


def test_viewer_input_bridge():
    """Browser-style POSTs must reach the engine's input state and the
    on-device keyboard resource on the next frame."""
    app, viewer = _build()
    app.update(dt=1 / 60)

    def post(obj):
        req = urllib.request.Request(
            viewer.url + "input", data=json.dumps(obj).encode(),
            method="POST")
        urllib.request.urlopen(req, timeout=5)

    post({"key": "Space", "down": True})
    post({"mouse": [12.5, 7.0]})
    post({"button": 0, "down": True})
    assert app.input.keys[KeyCode.Space]
    app.update(dt=1 / 60)
    kb = app.world.state["res"]["keyboard"]
    assert bool(np.asarray(kb["pressed"])[KeyCode.Space])
    mouse = app.world.state["res"]["mouse"]
    assert np.allclose(np.asarray(mouse["position"]), [12.5, 7.0])
    assert bool(np.asarray(mouse["pressed"])[0])
    post({"key": "Space", "down": False})
    app.update(dt=1 / 60)
    kb = app.world.state["res"]["keyboard"]
    assert bool(np.asarray(kb["just_released"])[KeyCode.Space])
    viewer.shutdown()
