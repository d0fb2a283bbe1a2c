"""Buffered messages (reference twin: examples/ecs/event.rs — the
double-buffered Message channel: writers emit this frame, readers drain
this frame and next, then the ring rotates)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from bevy_tpu import (
    App, MessageReader, MessageWriter, Res, ResMut, Update, message,
)
from bevy_tpu.ecs.component import field, resource
from bevy_tpu.ecs.system import system
from bevy_tpu.time import Time, TimePlugin


@message
class DealDamage:
    amount = field((), jnp.float32)


@resource
class Health:
    value = field((), jnp.float32, default=100.0)
    hits = field((), jnp.int32)


def build_app():
    app = App(capacity=8)
    app.add_plugins(TimePlugin())
    app.add_message(DealDamage, capacity=8)
    app.insert_resource(Health())

    @system
    def attack(w=MessageWriter(DealDamage, budget=1), time=Res(Time)):
        # one hit every frame after the first half second
        fire = (time.elapsed > 0.5).astype(jnp.int32)
        w.send(count=fire, amount=jnp.asarray(3.0, jnp.float32))

    @system
    def apply_damage(r=MessageReader(DealDamage), hp=ResMut(Health)):
        fields, mask = r.read()
        dmg = jnp.sum(jnp.where(mask, fields["amount"], 0.0))
        hp.value = hp.value - dmg
        hp.hits = hp.hits + jnp.sum(mask.astype(jnp.int32))

    app.add_systems(Update, attack)
    app.add_systems(Update, apply_damage, after="attack")
    return app


def demo():
    app = build_app()
    for _ in range(60):
        app.update(dt=1 / 60)
    hp = app.world.state["res"]["health"]
    value = float(jax.device_get(hp["value"]))
    hits = int(jax.device_get(hp["hits"]))
    print(f"health {value:.0f} after {hits} hits")
    return value, hits


if __name__ == "__main__":
    demo()
