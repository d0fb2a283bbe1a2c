"""Animation events (ref model: bevy_animation animation_event.rs —
payloads fire when a player's clock crosses authored timestamps)."""

import numpy as np
import jax.numpy as jnp

from bevy_tpu import App, Update
from bevy_tpu.animation import (
    AnimationEvent, AnimationPlayer, advance_players,
    make_animation_event_system,
)
from bevy_tpu.ecs.message import MessageReader
from bevy_tpu.ecs.query import ResMut
from bevy_tpu.ecs.system import system
from bevy_tpu.time import TimePlugin


def _app(events, speed=1.0):
    app = App(capacity=8)
    app.add_plugins(TimePlugin())
    app.world.register_component(AnimationPlayer)
    app.add_message(AnimationEvent, capacity=64)
    app.insert_resource("seen", {"codes": jnp.zeros(8, jnp.int32),
                                 "n": jnp.zeros((), jnp.int32)})
    app.world.spawn(AnimationPlayer(clip=0, speed=speed))
    durations = [1.0]
    app.add_systems(Update, advance_players(durations))
    app.add_systems(Update, make_animation_event_system(durations, events),
                    after="advance_animations")

    @system(name="collect")
    def collect(r=ResMut("seen"), msgs=MessageReader(AnimationEvent)):
        fields, mask = msgs.read()
        # messages persist two frames (ref: Messages double buffer);
        # keep only this frame's half to count each firing once
        half = mask.shape[0] // 2
        mask = mask.at[:half].set(False)
        k = jnp.sum(mask.astype(jnp.int32))
        lane = jnp.arange(fields["code"].shape[0], dtype=jnp.int32)
        rows = r.n + jnp.cumsum(mask.astype(jnp.int32)) - 1
        rows = jnp.where(mask, rows, 8)
        r.codes = r.codes.at[rows].set(fields["code"], mode="drop")
        r.n = r.n + k
        del lane

    app.add_systems(Update, collect, after="animation_events")
    return app


def test_event_fires_once_at_timestamp():
    app = _app([(0, 0.5, 7)])
    for _ in range(30):                       # 30 frames @ 1/60 = 0.5s
        app.update(dt=1 / 60)
    seen = app.world.resource("seen")
    assert int(seen.n) == 1, int(seen.n)
    assert int(seen.codes[0]) == 7


def test_event_fires_every_loop():
    app = _app([(0, 0.9, 3)])
    for _ in range(150):                      # 2.5s → crosses 0.9, 1.9
        app.update(dt=1 / 60)
    seen = app.world.resource("seen")
    assert int(seen.n) == 2, int(seen.n)


def test_wrong_clip_never_fires():
    app = _app([(1, 0.1, 5)])
    for _ in range(90):
        app.update(dt=1 / 60)
    assert int(app.world.resource("seen").n) == 0
