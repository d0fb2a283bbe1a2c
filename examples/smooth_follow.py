"""Smooth follow (reference twin: examples/movement/smooth_follow.rs —
a follower eases toward a moving target with frame-rate-independent
exponential smoothing)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax.numpy as jnp

from bevy_tpu import App, Query, Res, Update, With
from bevy_tpu.ecs.component import component
from bevy_tpu.ecs.system import system
from bevy_tpu.time import Time, TimePlugin
from bevy_tpu.transform import Transform, TransformPlugin, transform_bundle


@component
class Target:
    pass


@component
class Follower:
    pass


def build_app():
    app = App(capacity=8)
    app.add_plugins(TimePlugin(), TransformPlugin())
    app.world.spawn(Target(), *transform_bundle())
    app.world.spawn(Follower(), *transform_bundle(translation=(5, 0, 0)))

    @system
    def move_target(q=Query(Transform, With(Target)), time=Res(Time)):
        t = time.elapsed
        q.transform.translation = jnp.broadcast_to(
            jnp.stack([3.0 * jnp.sin(t), 0.0 * t, 3.0 * jnp.cos(t)]),
            q.transform.translation.shape)

    @system
    def follow(f=Query(Transform, With(Follower)),
               tgt=Query(Transform, With(Target)), time=Res(Time)):
        target = tgt.transform.translation[0]
        # decay-constant smoothing: independent of frame rate
        k = 1.0 - jnp.exp(-3.0 * time.delta)
        f.transform.translation = f.transform.translation + \
            (target[None] - f.transform.translation) * k

    app.add_systems(Update, [move_target, follow], chain=True)
    return app


def main():
    import jax
    app = build_app()
    for _ in range(120):
        app.update(dt=1 / 60)
    tr = np.asarray(jax.device_get(
        app.world.state["comp"]["transform"]["f"]["translation"]))
    d = np.linalg.norm(tr[1] - tr[0])
    print(f"follower {d:.2f} units behind target after 2s")


if __name__ == "__main__":
    main()
