"""Observer tests (ref model: bevy_ecs observer/ tests — same-frame
immediacy vs buffered messages)."""

import jax.numpy as jnp

from bevy_tpu import App, Query, Res, ResMut, Update, component, field, resource
from bevy_tpu.ecs.observer import On, Trigger, event
from bevy_tpu.ecs.system import system
from bevy_tpu.time import TimePlugin


@event
class Damaged:
    amount = field((), jnp.float32)


@resource
class Tally:
    total = field((), jnp.float32)
    frames_seen = field((), jnp.int32)


def _app():
    app = App(capacity=16)
    app.add_plugins(TimePlugin())
    app.insert_resource(Tally())

    @system
    def attack(t=Trigger(Damaged, budget=4)):
        t.trigger(count=2, amount=5.0)

    @system
    def on_damaged(ev=On(Damaged), tally=ResMut(Tally)):
        fields, mask = ev.read()
        tally.total = tally.total + jnp.sum(
            jnp.where(mask, fields["amount"], 0.0))
        tally.frames_seen = tally.frames_seen + (ev.count() > 0)

    app.add_systems(Update, attack)
    app.add_observer(Damaged, on_damaged)
    return app


def test_observer_sees_events_same_frame():
    app = _app()
    app.update(dt=1 / 60)
    tally = app.world.resource(Tally)
    assert float(tally.total) == 10.0          # 2 events × 5.0, SAME frame
    assert int(tally.frames_seen) == 1


def test_buffer_clears_between_frames():
    app = _app()
    for _ in range(3):
        app.update(dt=1 / 60)
    tally = app.world.resource(Tally)
    assert float(tally.total) == 30.0          # no event carry-over
    assert int(tally.frames_seen) == 3
