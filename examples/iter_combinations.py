"""N-body attraction over entity pairs (reference twin:
examples/ecs/iter_combinations.rs — Query::iter_combinations; here the
TPU form is a dense pair matrix masked by `pair_combinations`, an
O(n^2) vector op instead of a scalar iterator)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax.numpy as jnp

from bevy_tpu import App, Query, Res, Update
from bevy_tpu.ecs.component import component, field
from bevy_tpu.ecs.query import pair_combinations
from bevy_tpu.ecs.system import system
from bevy_tpu.time import Time, TimePlugin
from bevy_tpu.transform import Transform, TransformPlugin, transform_bundle

G = 20.0


@component
class Body:
    mass = field((), jnp.float32, default=1.0)
    velocity = field(3)


def build_app(n=8):
    app = App(capacity=32)
    app.add_plugins(TimePlugin(), TransformPlugin())
    import numpy as np
    rng = np.random.RandomState(0)
    for i in range(n):
        app.world.spawn(
            Body(mass=float(rng.uniform(0.5, 2.0)),
                 velocity=rng.uniform(-1, 1, 3).astype(np.float32)),
            *transform_bundle(translation=rng.uniform(-5, 5, 3)))

    @system
    def gravity(q=Query(Transform, Body), time=Res(Time)):
        pos = q.transform.translation                    # (cap, 3)
        mass = q.body.mass
        idx_i, idx_j, valid = pair_combinations(q.mask)  # upper triangle
        d = pos[idx_j] - pos[idx_i]                      # i -> j
        r2 = jnp.sum(d * d, -1) + 1e-3
        inv = jnp.where(valid, G / (r2 * jnp.sqrt(r2)), 0.0)
        f_ij = (inv * mass[idx_j])[:, None] * d          # accel on i
        f_ji = -(inv * mass[idx_i])[:, None] * d         # reaction on j
        acc = jnp.zeros_like(pos).at[idx_i].add(f_ij).at[idx_j].add(f_ji)
        q.body.velocity = q.body.velocity + acc * time.delta
        q.transform.translation = pos + q.body.velocity * time.delta

    app.add_systems(Update, gravity)
    return app


if __name__ == "__main__":
    app = build_app()
    for _ in range(30):
        app.update(dt=1 / 60)
    import numpy as np
    pos = np.asarray(app.world.state["comp"]["transform"]["f"]["translation"])
    print("center of motion:", pos[:8].mean(0).round(3))
