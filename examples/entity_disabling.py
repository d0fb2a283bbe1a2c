"""Entity disabling (reference twin: examples/ecs/entity_disabling.rs —
Disabled entities vanish from default queries and reappear on enable)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax.numpy as jnp

from bevy_tpu import App, Query, ResMut, Update
from bevy_tpu.ecs.component import component, field
from bevy_tpu.ecs.system import system
from bevy_tpu.ecs.world import Disabled
from bevy_tpu.time import TimePlugin


@component
class Goblin:
    hp = field((), default=10.0)


def build_app():
    app = App(capacity=8)
    app.add_plugins(TimePlugin())
    app.world.spawn(Goblin())
    app.world.spawn(Goblin())
    victim = app.world.spawn(Goblin())
    app.insert_resource("tally", {"n": jnp.zeros((), jnp.int32)})

    @system
    def count_goblins(q=Query(Goblin), tally=ResMut("tally")):
        # default query: Disabled rows are filtered out of q.mask
        tally.n = jnp.sum(q.mask.astype(jnp.int32))

    app.add_systems(Update, count_goblins)
    app._victim = victim
    return app


def main():
    import jax
    import numpy as np

    app = build_app()
    counts = []

    def step():
        app.update(dt=1 / 60)
        counts.append(int(np.asarray(jax.device_get(
            app.world.state["res"]["tally"]["n"]))))

    step()
    app.world.insert(app._victim, Disabled())   # hide
    step()
    app.world.remove(app._victim, Disabled)     # enable again
    step()
    print("visible goblin counts per frame:", counts)


if __name__ == "__main__":
    main()
