"""ECS micro-benchmarks (reference twin: benches/benches/bevy_ecs/ —
iter_simple, heavy_compute, fragmented iteration, spawning, events,
observers, schedule overhead; criterion → a simple ms table here).

Run: python benches/ecs_benches.py  (add --json for machine output).
Each case builds an App, jits one frame, and times steady-state frames
with device_get sync (the honest tunnel-safe method)."""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from bevy_tpu import (
    App, MessageReader, MessageWriter, Query, Res, ResMut, Update,
    component, field, message,
)
from bevy_tpu.ecs.system import system
from bevy_tpu.time import TimePlugin


@component
class Position:
    value = field(3)


@component
class Velocity:
    value = field(3)


@component
class HeavyMat:
    m = field((4, 4))


def _time_app(app, frames=30, warmup=3):
    step = jax.jit(app.frame_fn(), donate_argnums=0)
    state = app.world.state
    for _ in range(warmup):
        state = step(state)
    jax.device_get(state["frame"])
    t0 = time.perf_counter()
    for _ in range(frames):
        state = step(state)
    jax.device_get(state["frame"])
    return (time.perf_counter() - t0) / frames * 1000.0


def bench_iter_simple(n=100_000):
    """ref: iter_simple — pos += vel over N entities."""
    app = App(capacity=1 << (n + 8).bit_length())
    app.add_plugins(TimePlugin())

    @system
    def movement(q=Query(Position, Velocity)):
        q.position.value = jnp.where(q.mask[:, None],
                                     q.position.value + q.velocity.value,
                                     q.position.value)

    app.add_systems(Update, movement)
    app.world.spawn_batch([Position(value=np.zeros((n, 3), np.float32)),
                           Velocity(value=np.ones((n, 3), np.float32))], n)
    return _time_app(app)


def bench_heavy_compute(n=4096):
    """ref: heavy_compute — per-entity 4x4 matrix powers."""
    app = App(capacity=1 << (n + 8).bit_length())
    app.add_plugins(TimePlugin())

    @system
    def heavy(q=Query(HeavyMat)):
        m = q.heavy_mat.m
        for _ in range(4):
            m = jnp.einsum("nij,njk->nik", m, m)
        q.heavy_mat.m = jnp.where(q.mask[:, None, None], m, q.heavy_mat.m)

    app.add_systems(Update, heavy)
    eye = np.broadcast_to(np.eye(4, dtype=np.float32) * 1.0001, (n, 4, 4))
    app.world.spawn_batch([HeavyMat(m=eye.copy())], n)
    return _time_app(app)


def bench_fragmented(n_archetypes=64, per=512):
    """ref: fragmented iteration — many component combinations. Here:
    many component TYPES each on a slice of entities (the pool analog)."""
    app = App(capacity=1 << (n_archetypes * per + 8).bit_length())
    app.add_plugins(TimePlugin())
    comps = []
    for i in range(min(n_archetypes, 16)):   # 16 live pools
        c = component(type(f"Frag{i}", (), {"value": field(3)}))
        comps.append(c)
        app.world.register_component(c)

        def make(ci):
            @system(name=f"frag_move_{ci.__name__}")
            def mv(q=Query(ci)):
                col = getattr(q, _snake(ci.__name__))
                col.value = jnp.where(q.mask[:, None], col.value + 1.0,
                                      col.value)
            return mv

        app.add_systems(Update, make(c))
    for c in comps:
        app.world.spawn_batch(
            [c(value=np.zeros((per, 3), np.float32))], per)
    return _time_app(app)


def _snake(name):
    out = []
    for ch in name:
        if ch.isupper() and out:
            out.append("_")
        out.append(ch.lower())
    return "".join(out)


def bench_spawning(per_frame=1024):
    """ref: spawn/despawn world benches — in-jit device Commands churn:
    spawn a wave each frame, despawn everything aged one frame."""
    from bevy_tpu import Commands

    app = App(capacity=1 << 15)
    app.add_plugins(TimePlugin())

    @system
    def churn(q=Query(Position), commands=Commands(budget=per_frame)):
        # despawn last frame's wave, spawn a fresh one
        commands.despawn(q.mask)
        lane = jnp.arange(per_frame, dtype=jnp.float32)
        commands.spawn(Position(value=jnp.stack([lane, lane, lane], 1)),
                       count=per_frame)

    app.add_systems(Update, churn)
    return _time_app(app)


@message
class BenchMsg:
    value = field(())


def bench_messages(n_msgs=2048):
    """ref: events send/iter benches (double-buffered messages)."""
    app = App(capacity=256)
    app.add_plugins(TimePlugin())
    app.add_message(BenchMsg, capacity=n_msgs)

    @system
    def writer(msgs=MessageWriter(BenchMsg, budget=n_msgs)):
        msgs.send(count=n_msgs,
                  value=jnp.arange(n_msgs, dtype=jnp.float32))

    @system
    def reader(msgs=MessageReader(BenchMsg), acc=ResMut("bench_acc")):
        fields, mask = msgs.read()
        acc.total = acc.total + jnp.sum(
            jnp.where(mask, fields["value"], 0.0))

    app.insert_resource("bench_acc", {"total": jnp.zeros(())})
    app.add_systems(Update, writer, reader)
    return _time_app(app)


def bench_schedule_overhead(n_systems=64):
    """ref: scheduling benches — many empty-ish systems in one frame."""
    app = App(capacity=256)
    app.add_plugins(TimePlugin())
    app.insert_resource("tick_acc", {"v": jnp.zeros(())})

    for i in range(n_systems):
        def make(k):
            @system(name=f"noop_{k}")
            def noop(acc=ResMut("tick_acc")):
                acc.v = acc.v + 1.0
            return noop
        app.add_systems(Update, make(i))
    return _time_app(app)


CASES = {
    "iter_simple_100k": bench_iter_simple,
    "heavy_compute_4k_mat4": bench_heavy_compute,
    "fragmented_16x512": bench_fragmented,
    "spawn_despawn_1k_per_frame": bench_spawning,
    "messages_4k": bench_messages,
    "schedule_64_systems": bench_schedule_overhead,
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", action="store_true")
    ap.add_argument("--only", default=None)
    args = ap.parse_args()
    results = {}
    for name, fn in CASES.items():
        if args.only and args.only not in name:
            continue
        ms = fn()
        results[name] = round(ms, 4)
        if not args.json:
            print(f"{name:32s} {ms:9.3f} ms/frame", flush=True)
    if args.json:
        print(json.dumps(results))


if __name__ == "__main__":
    main()
