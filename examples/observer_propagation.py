"""Observer event bubbling (reference twin: examples/ecs/
observer_propagation.rs — an Attack on a goblin's armor bubbles up the
ChildOf chain so the goblin entity takes the damage)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from bevy_tpu import App, Query, ResMut, Update
from bevy_tpu.ecs.component import component, field
from bevy_tpu.ecs.observer import On, Trigger, event
from bevy_tpu.ecs.system import system
from bevy_tpu.time import TimePlugin
from bevy_tpu.transform import TransformPlugin, set_parent, transform_bundle


@component
class HitPoints:
    value = field((), jnp.float32, default=10.0)


@event
class Attack:
    row = field((), jnp.int32)
    damage = field((), jnp.float32)


def build_app():
    app = App(capacity=32)
    app.add_plugins(TimePlugin(), TransformPlugin())
    goblin = app.world.spawn(HitPoints(value=20.0), *transform_bundle())
    helmet = app.world.spawn(HitPoints(value=5.0), *transform_bundle())
    set_parent(app.world, helmet, goblin)
    target = helmet.index

    @system
    def swing(t=Trigger(Attack, budget=2)):
        t.trigger(count=1, row=jnp.asarray(target, jnp.int32),
                  damage=jnp.asarray(3.0, jnp.float32))

    @system
    def take_damage(ev=On(Attack, bubble=True),
                    q=Query(HitPoints)):
        # the helmet AND the goblin behind it both see the hit — the
        # reference's propagated Attack observer
        fields, valid = ev.read()
        dmg = jnp.max(jnp.where(valid, fields["damage"], 0.0))
        hit = ev.bubble_mask()
        q.hit_points.value = q.hit_points.value - \
            hit.astype(jnp.float32)[:q.hit_points.value.shape[0]] * dmg

    app.add_systems(Update, swing)
    app.add_observer(Attack, take_damage)
    return app, goblin, helmet


if __name__ == "__main__":
    app, goblin, helmet = build_app()
    for _ in range(3):
        app.update(dt=1 / 60)
    hp = np.asarray(jax.device_get(
        app.world.column(HitPoints, "value")))
    print("goblin hp:", hp[goblin.index], "helmet hp:", hp[helmet.index])
