"""Device->host readback (reference twin: examples/shader/gpu_readback.rs
— run a compute pass and read the buffer back; here a jitted reduction
over device state is fetched with jax.device_get, the TPU readback
position of bevy_render/src/gpu_readback.rs:125)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from bevy_tpu import App, Query, ResMut, Update
from bevy_tpu.ecs.component import component, field
from bevy_tpu.ecs.system import system
from bevy_tpu.time import TimePlugin


@component
class Charge:
    value = field((), default=0.0)


def build_app(n=4096):
    app = App(capacity=8192)
    app.add_plugins(TimePlugin())
    app.insert_resource("charge_total", {"sum": jnp.zeros((), jnp.float32)})
    vals = np.linspace(0.0, 1.0, n, dtype=np.float32)
    app.world.spawn_batch([Charge(value=vals)], n)

    @system
    def accumulate(q=Query(Charge), tot=ResMut("charge_total")):
        q.charge.value = q.charge.value * 1.001
        tot.sum = jnp.sum(q.charge.value)

    app.add_systems(Update, accumulate)
    return app


def main():
    app = build_app()
    for _ in range(5):
        app.update(dt=1 / 60)
    # the readback: one scalar device->host fetch per frame boundary
    total = float(np.asarray(jax.device_get(
        app.world.state["res"]["charge_total"]["sum"])))
    print(f"device-computed charge total: {total:.3f}")


if __name__ == "__main__":
    main()
