"""Generic systems (reference twin: examples/ecs/generic_system.rs — one
system definition instantiated for several component types; the Rust
generic parameter becomes a Python factory closure)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax.numpy as jnp

from bevy_tpu import App, Query, Update
from bevy_tpu.ecs.component import component, field
from bevy_tpu.ecs.system import system
from bevy_tpu.time import TimePlugin


@component
class Hp:
    value = field((), jnp.float32, default=10.0)


@component
class Mana:
    value = field((), jnp.float32, default=5.0)


def make_decay_system(comp, rate: float):
    """decay::<T> — the generic system, stamped per component type."""
    attr = comp.__name__.lower()

    @system(name=f"decay_{attr}")
    def decay(q=Query(comp)):
        view = getattr(q, attr)
        view.value = jnp.maximum(view.value - rate, 0.0)

    return decay


def build_app():
    app = App(capacity=8)
    app.add_plugins(TimePlugin())
    app.world.spawn(Hp(), Mana())
    app.world.spawn(Hp(value=3.0))
    app.add_systems(Update, [make_decay_system(Hp, 0.5),
                             make_decay_system(Mana, 0.25)])
    return app


if __name__ == "__main__":
    app = build_app()
    for _ in range(10):
        app.update(dt=1 / 60)
    hp = app.world.state["comp"]["hp"]["f"]["value"]
    mana = app.world.state["comp"]["mana"]["f"]["value"]
    print("hp:", [round(float(x), 2) for x in hp[:2]],
          "mana:", round(float(mana[0]), 2))
