"""Ability cooldown (reference twin: examples/usage/cooldown.rs — an
ability fires only when its timer has elapsed; batched timers tick on
device)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax.numpy as jnp

from bevy_tpu import App, Query, Res, ResMut, Update
from bevy_tpu.ecs.component import component, field
from bevy_tpu.ecs.system import system
from bevy_tpu.time import Time, TimePlugin


@component
class Ability:
    cooldown = field((), default=0.5)
    remaining = field((), default=0.0)
    casts = field((), jnp.int32, default=0)


def build_app():
    app = App(capacity=8)
    app.add_plugins(TimePlugin())
    app.world.spawn(Ability(cooldown=0.3))
    app.world.spawn(Ability(cooldown=0.7))

    @system
    def try_cast(q=Query(Ability), time=Res(Time)):
        rem = jnp.maximum(q.ability.remaining - time.delta, 0.0)
        ready = rem <= 0.0
        # cast whenever ready (the button held down)
        q.ability.casts = q.ability.casts + ready.astype(jnp.int32)
        q.ability.remaining = jnp.where(ready, q.ability.cooldown, rem)

    app.add_systems(Update, try_cast)
    return app


def main():
    import jax
    app = build_app()
    for _ in range(120):          # 2 seconds
        app.update(dt=1 / 60)
    casts = np.asarray(jax.device_get(
        app.world.state["comp"]["ability"]["f"]["casts"]))[:2]
    print(f"casts in 2s: fast={casts[0]} slow={casts[1]} "
          "(0.3s vs 0.7s cooldowns)")


if __name__ == "__main__":
    main()
