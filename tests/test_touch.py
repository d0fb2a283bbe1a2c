"""Touch + gestures (ref models: bevy_input touch.rs Touches phases;
gestures.rs pinch/rotate)."""

import numpy as np

from bevy_tpu import App
from bevy_tpu.input import InputPlugin
from bevy_tpu.time import TimePlugin


def _app():
    app = App(capacity=4)
    app.add_plugins(TimePlugin(), InputPlugin())
    return app


def test_touch_phases():
    app = _app()
    app.update(dt=1 / 60)
    app.input.touch(0, 10.0, 20.0)
    app.update(dt=1 / 60)
    t = app.world.resource("touches")
    assert bool(t.just_pressed[0]) and bool(t.pressed[0])
    assert np.allclose(np.asarray(t.position[0]), [10.0, 20.0])
    app.update(dt=1 / 60)
    t = app.world.resource("touches")
    assert not bool(t.just_pressed[0]) and bool(t.pressed[0])
    app.input.touch_end(0)
    app.update(dt=1 / 60)
    t = app.world.resource("touches")
    assert bool(t.just_released[0]) and not bool(t.pressed[0])


def test_pinch_and_rotate_gestures():
    app = _app()
    app.input.touch(0, 0.0, 0.0)
    app.input.touch(1, 100.0, 0.0)
    app.update(dt=1 / 60)
    app.update(dt=1 / 60)                  # gesture baseline settles
    app.input.touch(1, 150.0, 0.0)         # spread fingers
    app.update(dt=1 / 60)
    t = app.world.resource("touches")
    assert abs(float(t.pinch_delta) - 50.0) < 1e-3
    # rotate: move finger 1 to the vertical
    app.input.touch(1, 0.0, 150.0)
    app.update(dt=1 / 60)
    t = app.world.resource("touches")
    assert abs(float(t.rotate_delta) - np.pi / 2) < 1e-3
    # lifting a finger invalidates the gesture (no spurious deltas)
    app.input.touch_end(1)
    app.update(dt=1 / 60)
    t = app.world.resource("touches")
    assert float(t.pinch_delta) == 0.0
