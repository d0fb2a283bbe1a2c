"""Input tests (ref model: bevy_input button_input.rs unit tests)."""

import jax.numpy as jnp
import numpy as np

from bevy_tpu import App, Query, Res, ResMut, Update, component, field
from bevy_tpu.ecs.system import system
from bevy_tpu.input import InputPlugin, KeyCode, MouseButton
from bevy_tpu.time import TimePlugin


def _app():
    app = App(capacity=16)
    app.add_plugins(TimePlugin(), InputPlugin())
    return app


def test_pressed_and_just_pressed_transitions():
    app = _app()
    app.update(dt=1 / 60)
    kb = app.world.resource("keyboard")
    assert not kb.pressed[KeyCode.Space]

    app.input.press(KeyCode.Space)
    app.update(dt=1 / 60)
    kb = app.world.resource("keyboard")
    assert kb.pressed[KeyCode.Space]
    assert kb.just_pressed[KeyCode.Space]

    app.update(dt=1 / 60)  # held
    kb = app.world.resource("keyboard")
    assert kb.pressed[KeyCode.Space]
    assert not kb.just_pressed[KeyCode.Space]

    app.input.release(KeyCode.Space)
    app.update(dt=1 / 60)
    kb = app.world.resource("keyboard")
    assert not kb.pressed[KeyCode.Space]
    assert kb.just_released[KeyCode.Space]


def test_mouse_position_and_delta():
    app = _app()
    app.input.move_to(100.0, 50.0)
    app.update(dt=1 / 60)
    app.input.move_to(110.0, 45.0)
    app.update(dt=1 / 60)
    m = app.world.resource("mouse")
    assert np.allclose(m.position, [110, 45])
    assert np.allclose(m.delta, [10, -5])


def test_input_drives_game_system():
    """A paddle-style system reading keyboard inside the jitted frame."""
    @component
    class Paddle:
        x = field((), jnp.float32)

    @system
    def move(q=Query(Paddle), kb=Res("keyboard")):
        left = kb.pressed[KeyCode.ArrowLeft]
        right = kb.pressed[KeyCode.ArrowRight]
        d = jnp.where(right, 1.0, 0.0) - jnp.where(left, 1.0, 0.0)
        q.paddle.x = q.paddle.x + d

    app = _app()
    app.add_systems(Update, move)
    e = app.world.spawn(Paddle())
    app.input.press(KeyCode.ArrowRight)
    for _ in range(3):
        app.update(dt=1 / 60)
    app.input.release(KeyCode.ArrowRight)
    app.input.press(KeyCode.ArrowLeft)
    app.update(dt=1 / 60)
    assert abs(float(app.world.get(e, Paddle).x) - 2.0) < 1e-6
