"""Eased motion (reference twins: examples/animation/eased_motion.rs +
easing_functions.rs — entities animate between two poses through
different easing curves, all lanes evaluated in one vector op)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax.numpy as jnp

from bevy_tpu import App, Query, Res, Update
from bevy_tpu.ecs.component import component, field
from bevy_tpu.ecs.system import system
from bevy_tpu.math.curve import EASE_FUNCTIONS
from bevy_tpu.time import Time, TimePlugin
from bevy_tpu.transform import Transform, TransformPlugin, transform_bundle

NAMES = ["cubic_in", "cubic_out", "cubic_in_out", "elastic_out",
         "bounce_out"]


@component
class Eased:
    kind = field((), jnp.int32)          # index into NAMES
    period = field((), jnp.float32, default=2.0)


def build_app():
    app = App(capacity=16)
    app.add_plugins(TimePlugin(), TransformPlugin())
    for i, _ in enumerate(NAMES):
        app.world.spawn(Eased(kind=i),
                        *transform_bundle(translation=(0.0, 2.0 * i, 0.0)))

    @system
    def animate(q=Query(Transform, Eased), time=Res(Time)):
        t = (time.elapsed % q.eased.period) / q.eased.period   # 0..1 saw
        # evaluate every easing curve, select per-lane by kind — the
        # lax.switch-free TPU form for a small static set
        stack = jnp.stack([EASE_FUNCTIONS[n](t) for n in NAMES])       # (K, cap)
        v = jnp.take_along_axis(stack, q.eased.kind[None, :], 0)[0]
        pos = q.transform.translation
        q.transform.translation = pos.at[:, 0].set(10.0 * v)

    app.add_systems(Update, animate)
    return app


if __name__ == "__main__":
    app = build_app()
    for _ in range(30):
        app.update(dt=1 / 60)
    import numpy as np
    x = np.asarray(
        app.world.state["comp"]["transform"]["f"]["translation"])[:5, 0]
    print("x at t=0.25:", [round(float(v), 2) for v in x])
