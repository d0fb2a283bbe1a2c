"""Animated transform (reference twin:
examples/animation/animated_transform.rs — translation/rotation/scale
keyframe curves drive an entity's Transform)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax.numpy as jnp

from bevy_tpu import App, Query, Res, Update, With
from bevy_tpu.ecs.component import component, field
from bevy_tpu.ecs.system import system
from bevy_tpu.time import Time, TimePlugin
from bevy_tpu.transform import Transform, TransformPlugin, transform_bundle


@component
class Orbiter:
    phase = field((), default=0.0)


def build_app():
    app = App(capacity=8)
    app.add_plugins(TimePlugin(), TransformPlugin())
    app.world.spawn(Orbiter(), *transform_bundle())
    app.world.spawn(Orbiter(phase=np.pi), *transform_bundle())

    @system
    def animate(q=Query(Transform, Orbiter), time=Res(Time)):
        # keyframed orbit + spin + breathing scale, all sampled per frame
        t = time.elapsed + q.orbiter.phase
        q.transform.translation = jnp.stack(
            [2.0 * jnp.cos(t), 0.4 * jnp.sin(2 * t), 2.0 * jnp.sin(t)], -1)
        half = t * 0.5
        q.transform.rotation = jnp.stack(
            [jnp.zeros_like(t), jnp.sin(half), jnp.zeros_like(t),
             jnp.cos(half)], -1)
        s = 1.0 + 0.25 * jnp.sin(3.0 * t)
        q.transform.scale = jnp.stack([s, s, s], -1)

    app.add_systems(Update, animate)
    return app


def main():
    import jax
    app = build_app()
    for _ in range(30):
        app.update(dt=1 / 60)
    tr = np.asarray(jax.device_get(
        app.world.state["comp"]["transform"]["f"]["translation"]))
    print(f"orbiters at x={tr[0, 0]:.2f} and x={tr[1, 0]:.2f} "
          "(opposite phases)")


if __name__ == "__main__":
    main()
