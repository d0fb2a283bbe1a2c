"""Async compute (reference twins: examples/async_tasks/async_compute.rs
+ external_source_external_thread.rs — offload blocking work to the
task pool and feed results back into the frame via a host system; the
asset worker pool is the same machinery)."""

from __future__ import annotations

import sys
import time as pytime
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax.numpy as jnp

from bevy_tpu import App, ResMut, Update
from bevy_tpu.ecs.component import field, resource
from bevy_tpu.ecs.system import system
from bevy_tpu.time import TimePlugin


@resource
class MineField:
    """Results of background 'chunk generation' tasks."""
    chunks_done = field((), jnp.int32)
    total_ore = field((), jnp.float32)


def generate_chunk(seed):
    """The blocking task (ref: the spawned AsyncComputeTaskPool task)."""
    pytime.sleep(0.1)                     # pretend it's expensive
    return (seed * 37 % 11) / 10.0


def build_app():
    app = App(capacity=4)
    app.add_plugins(TimePlugin())
    app.insert_resource(MineField())
    pool = ThreadPoolExecutor(max_workers=4)
    pending = [pool.submit(generate_chunk, s) for s in range(16)]

    @system(host=True)
    def collect(mf=ResMut(MineField)):
        # drain finished tasks without blocking the frame
        done = [f for f in pending if f.done()]
        for f in done:
            pending.remove(f)
            mf.total_ore = mf.total_ore + f.result()
            mf.chunks_done = mf.chunks_done + 1

    app.add_systems(Update, collect)
    app._async_pending = pending           # for the demo loop below
    return app


if __name__ == "__main__":
    app = build_app()
    frames = 0
    while app._async_pending and frames < 300:
        app.update(dt=1 / 60)
        pytime.sleep(1 / 60)               # real frame pacing
        frames += 1
    mf = app.world.resource(MineField)
    print(f"collected {int(mf.chunks_done)} chunks over {frames} frames, "
          f"total ore {float(mf.total_ore):.1f}")
