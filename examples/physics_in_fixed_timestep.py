"""Physics in the fixed timestep (reference twin:
examples/movement/physics_in_fixed_timestep.rs — simulate in
FixedUpdate, render-interpolate in Update)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax.numpy as jnp

from bevy_tpu import App, FixedUpdate, Query, Res, Update
from bevy_tpu.ecs.component import component, field
from bevy_tpu.ecs.system import system
from bevy_tpu.time import Time, TimeFixed, TimePlugin
from bevy_tpu.transform import Transform, TransformPlugin, transform_bundle


@component
class Body:
    prev = field(3)
    curr = field(3)
    vel = field(3, default=(2.0, 0.0, 0.0))


def build_app(hz=30.0):
    app = App(capacity=8)
    app.add_plugins(TimePlugin(), TransformPlugin())
    app.world.spawn(Body(), *transform_bundle())
    app.insert_resource(TimeFixed(timestep=1.0 / hz))

    @system
    def integrate(q=Query(Body)):
        dt = 1.0 / hz
        q.body.prev = q.body.curr
        # bounce in a [-3, 3] box on x
        nxt = q.body.curr + q.body.vel * dt
        flip = (jnp.abs(nxt[:, 0]) > 3.0)
        q.body.vel = q.body.vel * jnp.where(flip, -1.0, 1.0)[:, None]
        q.body.curr = q.body.curr + q.body.vel * dt

    @system
    def interpolate(q=Query(Transform, Body), fixed=Res(TimeFixed)):
        # overstep fraction blends previous and current fixed states
        # (ref: Time<Fixed>::overstep_fraction)
        a = jnp.clip(fixed.overstep / jnp.maximum(fixed.timestep, 1e-9),
                     0.0, 1.0)
        q.transform.translation = q.body.prev + \
            (q.body.curr - q.body.prev) * a

    app.add_systems(FixedUpdate, integrate)
    app.add_systems(Update, interpolate)
    return app


def main():
    import jax
    app = build_app()
    for _ in range(90):
        app.update(dt=1 / 60)
    tr = np.asarray(jax.device_get(
        app.world.state["comp"]["transform"]["f"]["translation"]))[0]
    print(f"interpolated position after 1.5s: {tr[0]:.2f}")


if __name__ == "__main__":
    main()
