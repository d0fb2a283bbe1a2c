"""Removal detection tests (ref model: bevy_ecs RemovedComponents)."""

import jax.numpy as jnp

from bevy_tpu import (
    App, Commands, Query, Removed, ResMut, Update, With, component, field,
    resource,
)
from bevy_tpu.ecs.system import system
from bevy_tpu.time import TimePlugin


@component
class Shield:
    hp = field((), jnp.float32, default=1.0)


@component
class Unit:
    pass


@resource
class Count:
    seen = field((), jnp.int32)


def test_removed_filter_fires_once_per_removal():
    app = App(capacity=16)
    app.add_plugins(TimePlugin())
    app.insert_resource(Count())

    @system
    def on_shield_lost(q=Query(Removed(Shield)), c=ResMut(Count)):
        c.seen = c.seen + jnp.sum(q.mask.astype(jnp.int32))

    app.add_systems(Update, on_shield_lost)
    app.world.register_component(Unit)
    e = app.world.spawn(Unit(), Shield())
    app.update(dt=1 / 60)
    assert int(app.world.resource(Count).seen) == 0

    app.world.remove(e, Shield)
    app.update(dt=1 / 60)
    assert int(app.world.resource(Count).seen) == 1
    app.update(dt=1 / 60)   # must not re-fire
    assert int(app.world.resource(Count).seen) == 1


def test_removed_fires_for_device_despawn():
    app = App(capacity=16)
    app.add_plugins(TimePlugin())
    app.insert_resource(Count())

    @system
    def killer(q=Query(With(Shield)), commands=Commands()):
        commands.despawn(q.mask)

    @system
    def on_shield_lost(q=Query(Removed(Shield)), c=ResMut(Count)):
        c.seen = c.seen + jnp.sum(q.mask.astype(jnp.int32))

    app.add_systems(Update, [killer, on_shield_lost], chain=True)
    app.world.spawn(Shield())
    app.world.spawn(Shield())
    app.update(dt=1 / 60)
    app.update(dt=1 / 60)
    assert int(app.world.resource(Count).seen) == 2
