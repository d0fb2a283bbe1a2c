"""Generic relationship tests (ref model: bevy_ecs relationship/mod.rs —
custom Relationship pairs, reverse lookup, despawn policies)."""

import jax
import jax.numpy as jnp
import numpy as np

from bevy_tpu import App, Query, Read, Update, World, component, field
from bevy_tpu.ecs.relationship import (
    make_relationship_cleanup_system, related_mask, relationship, rel_to,
)
from bevy_tpu.ecs.system import system
from bevy_tpu.time import TimePlugin

Likes = relationship("Likes")
Guarding = relationship("Guarding")


@component
class Npc:
    charisma = field((), jnp.float32, default=1.0)


def test_relationship_reverse_lookup():
    w = World(capacity=16)
    star = w.spawn(Npc(charisma=9.0))
    fans = [w.spawn(Npc(), rel_to(Likes, star)) for _ in range(3)]
    other = w.spawn(Npc())
    w.spawn(Npc(), rel_to(Likes, other))

    m = np.asarray(jax.device_get(related_mask(w.state, Likes, star)))
    assert m.sum() == 3
    assert all(m[f.index] for f in fans)

    # stale generation: despawn the star, recycle its row — old fans must
    # NOT match the recycled entity
    w.despawn(star)
    reborn = w.spawn(Npc())             # same row, new generation
    assert reborn.index == star.index
    m2 = np.asarray(jax.device_get(related_mask(w.state, Likes, reborn)))
    assert m2.sum() == 0


def test_relationship_cleanup_policies():
    app = App(capacity=16)
    app.add_plugins(TimePlugin())
    app.world.register_component(Npc)
    app.world.register_component(Likes)
    app.world.register_component(Guarding)

    vip = app.world.spawn(Npc())
    fan = app.world.spawn(Npc(), rel_to(Likes, vip))
    guard = app.world.spawn(Npc(), rel_to(Guarding, vip))
    app.add_systems(Update, make_relationship_cleanup_system(Likes, "remove"))
    app.add_systems(Update,
                    make_relationship_cleanup_system(Guarding, "despawn"))

    app.update(dt=1 / 60)               # target alive: nothing changes
    assert app.world.has(fan, Likes) and app.world.is_alive(guard)

    app.world.despawn(vip)
    app.update(dt=1 / 60)
    assert app.world.is_alive(fan)      # "remove": relation dropped, row kept
    assert not app.world.has(fan, Likes)
    assert not app.world.is_alive(guard)  # "despawn": guard goes with the vip
