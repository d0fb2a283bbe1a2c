"""App layer tests (ref twin: tests/how_to_test_apps.rs — build App, insert
resources, update, assert; deterministic time via manual dt ≈
TimeUpdateStrategy::ManualDuration)."""

import jax.numpy as jnp
import numpy as np
import pytest

from bevy_tpu import (
    App, Update, FixedUpdate, Startup, PostUpdate, component, field, resource,
    system, Query, Res, ResMut, Commands,
)
from bevy_tpu.app.app import AppExit
from bevy_tpu.ecs.message import MessageWriter
from bevy_tpu.time import Time, TimeFixed, TimePlugin, FrameCount


@component
class P:
    value = field(2)


@component
class V:
    value = field(2)


@resource
class Hits:
    n = field((), jnp.int32)


def test_app_basic_update():
    app = App(capacity=16)
    app.add_plugins(TimePlugin())
    app.world.spawn(P(value=(0.0, 0.0)), V(value=(1.0, 0.0)))

    @system
    def move(q=Query(P, V), t=Res(Time)):
        q.p.value = q.p.value + q.v.value * t.delta

    app.add_systems(Update, move)
    for _ in range(3):
        app.update(dt=0.1)
    np.testing.assert_allclose(app.world.get(0, P).value, [0.3, 0.0], atol=1e-5)
    assert app.frame == 3
    assert int(app.world.resource(FrameCount).count) == 3


def test_fixed_update_runs_at_fixed_rate():
    app = App(capacity=16)
    app.add_plugins(TimePlugin())
    app.insert_resource(TimeFixed(timestep=0.1))
    app.insert_resource(Hits())

    @system
    def tick(h=ResMut(Hits)):
        h.n = h.n + 1

    app.add_systems(FixedUpdate, tick)
    # 0.24s of virtual time → 2 fixed steps, 0.04 overstep
    # (dt stays under Virtual::max_delta = 0.25 so nothing is clamped)
    app.update(dt=0.24)
    assert int(app.world.resource(Hits).n) == 2
    assert float(app.world.resource(TimeFixed).overstep) == pytest.approx(0.04, abs=1e-5)
    # another 0.07 → exactly one more step (0.04+0.07 = 0.11 ≥ 0.1 with
    # fp32 slack)
    app.update(dt=0.07)
    assert int(app.world.resource(Hits).n) == 3


def test_fixed_time_visible_as_generic_time():
    app = App(capacity=16)
    app.add_plugins(TimePlugin())
    app.insert_resource(TimeFixed(timestep=0.25))
    app.insert_resource(Hits())
    seen = []

    @system
    def observe(t=Res(Time), h=ResMut(Hits)):
        # inside FixedMain the generic Time must be the fixed clock
        h.n = h.n + jnp.asarray(jnp.abs(t.delta - 0.25) < 1e-6, jnp.int32)

    app.add_systems(FixedUpdate, observe)
    app.update(dt=0.25)
    app.update(dt=0.25)
    assert int(app.world.resource(Hits).n) == 2


def test_startup_runs_once():
    app = App(capacity=16)
    app.insert_resource(Hits())

    @system
    def init(h=ResMut(Hits)):
        h.n = h.n + 1

    app.add_systems(Startup, init)
    app.update(dt=0.1)
    app.update(dt=0.1)
    assert int(app.world.resource(Hits).n) == 1


def test_host_system_structural_edit_mid_frame():
    app = App(capacity=16)
    app.insert_resource(Hits())

    @system(host=True)
    def spawner(world):
        if world.entity_count(P) < 2:
            world.spawn(P(value=(9.0, 9.0)))

    @system
    def count(q=Query(P), h=ResMut(Hits)):
        h.n = q.count()

    app.add_systems(Update, spawner)
    app.add_systems(PostUpdate, count)
    app.update(dt=0.1)
    assert int(app.world.resource(Hits).n) == 1
    app.update(dt=0.1)
    assert int(app.world.resource(Hits).n) == 2
    app.update(dt=0.1)
    assert int(app.world.resource(Hits).n) == 2


def test_app_exit_message():
    app = App(capacity=16)

    @system
    def quit_now(w=MessageWriter(AppExit, budget=1)):
        w.send_one(code=0)

    app.add_systems(Update, quit_now)
    app.run(max_frames=100, dt=0.01)
    assert app.frame <= 2


def test_run_if_condition():
    app = App(capacity=16)
    app.add_plugins(TimePlugin())
    app.insert_resource(Hits())

    @system
    def cond_after_two(f=Res(FrameCount)):
        return f.count > 2

    @system
    def bump(h=ResMut(Hits)):
        h.n = h.n + 1

    app.add_systems(Update, bump, run_if=cond_after_two)
    for _ in range(5):
        app.update(dt=0.1)
    assert int(app.world.resource(Hits).n) == 3


def test_fallible_systems_error_handler():
    import jax.numpy as jnp
    import pytest
    from bevy_tpu import App, ResMut, Update, field, resource
    from bevy_tpu.ecs.system import system
    from bevy_tpu.time import TimePlugin

    @resource
    class Counter:
        n = field((), jnp.int32)

    def build(handler=None):
        app = App(capacity=4)
        app.add_plugins(TimePlugin())
        app.insert_resource(Counter())

        @system
        def broken(c=ResMut(Counter)):
            raise RuntimeError("boom")

        @system
        def healthy(c=ResMut(Counter)):
            c.n = c.n + 1

        app.add_systems(Update, broken, healthy)
        if handler is not None:
            app.set_error_handler(handler)
        return app

    # default: panic (ref: the default GLOBAL_ERROR_HANDLER)
    with pytest.raises(RuntimeError, match="boom"):
        build().update(dt=1 / 60)

    # warn: failing system skipped, the rest of the frame still runs
    app = build("warn")
    app.update(dt=1 / 60)
    app.update(dt=1 / 60)
    assert int(app.world.resource(Counter).n) == 2

    # custom handler receives (exc, system)
    seen = []
    app = build(lambda e, s: seen.append((str(e), s.name)))
    app.update(dt=1 / 60)
    assert seen and seen[0] == ("boom", "broken")

    # returned-Exception form (the Result::Err twin)
    app2 = App(capacity=4)
    app2.add_plugins(TimePlugin())
    app2.insert_resource(Counter())

    @system
    def soft_fail(c=ResMut(Counter)):
        c.n = c.n + 100          # staged write must be DISCARDED
        return ValueError("nope")

    app2.add_systems(Update, soft_fail)
    app2.set_error_handler("ignore")
    app2.update(dt=1 / 60)
    assert int(app2.world.resource(Counter).n) == 0
