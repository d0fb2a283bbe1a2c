"""Query pair combinations (ref model: examples/ecs/iter_combinations.rs
— gravity between every body pair)."""

import jax.numpy as jnp
import numpy as np

from bevy_tpu import App, Update
from bevy_tpu.ecs.component import component, field
from bevy_tpu.ecs.query import Query, pair_combinations
from bevy_tpu.ecs.system import system


@component
class Body:
    pos = field(3)
    vel = field(3)
    mass = field((), jnp.float32, default=1.0)


def test_nbody_pair_gravity_symmetry():
    app = App(capacity=8)
    app.world.spawn(Body(pos=(1.0, 0.0, 0.0)))
    app.world.spawn(Body(pos=(-1.0, 0.0, 0.0)))
    app.world.spawn(Body(pos=(0.0, 2.0, 0.0), mass=2.0))

    @system(name="gravity")
    def gravity(q=Query(Body)):
        i, j, ok = pair_combinations(q.mask)
        d = q.body.pos[j] - q.body.pos[i]
        r2 = jnp.sum(d * d, -1)
        f = jnp.where(ok, 1.0 / jnp.maximum(r2, 1e-4), 0.0)[:, None] * d
        acc = jnp.zeros_like(q.body.vel)
        acc = acc.at[i].add(f * q.body.mass[j, None])
        acc = acc.at[j].add(-f * q.body.mass[i, None])
        q.body.vel = q.body.vel + acc * (1 / 60)

    app.add_systems(Update, gravity)
    app.update(dt=1 / 60)
    v = np.asarray(jnp.stack([app.world.get(k, Body).vel for k in range(3)]))
    # momentum conserved: sum(m*v) == 0
    m = np.asarray([1.0, 1.0, 2.0])[:, None]
    assert np.allclose((m * v).sum(0), 0.0, atol=1e-6)
    # bodies attract: body 0 accelerates toward -x ... toward body 1 and up
    assert v[0, 0] < 0 and v[1, 0] > 0


def test_combinations_exclude_unmatched():
    mask = jnp.asarray([True, False, True, True])
    i, j, ok = pair_combinations(mask)
    pairs = {(int(a), int(b)) for a, b, o in
             zip(np.asarray(i), np.asarray(j), np.asarray(ok)) if o}
    assert pairs == {(0, 2), (0, 3), (2, 3)}
