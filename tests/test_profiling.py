"""Profiler capture + XPlane summary (ref model: docs/profiling.md
workflow — spans per system, frame totals)."""

import numpy as np
import pytest


def test_trace_and_summarize(tmp_path):
    pytest.importorskip("tensorflow.tsl.profiler.protobuf.xplane_pb2")
    from bevy_tpu import App, Update
    from bevy_tpu.ecs.query import ResMut
    from bevy_tpu.ecs.system import system
    from bevy_tpu.profiling import summarize_trace, trace_frames

    app = App(capacity=8)
    app.insert_resource("acc", {"v": np.zeros((64, 64), np.float32)})

    @system(name="spin")
    def spin(r=ResMut("acc")):
        import jax.numpy as jnp
        r.v = jnp.tanh(r.v @ r.v.T + 1.0)

    app.add_systems(Update, spin)
    run = trace_frames(app, frames=2, logdir=str(tmp_path))
    rows = summarize_trace(run, frames=2)
    if not rows:                          # host-only backend: host planes
        rows = summarize_trace(run, frames=2, device_only=False)
    assert rows, "no profiler events captured"
    assert all(ms >= 0 for _, ms in rows)
