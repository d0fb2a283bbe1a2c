"""Stepping debugger tests (ref model: bevy_ecs stepping.rs tests —
paused schedules, per-system stepping, continue_frame)."""

import jax.numpy as jnp

from bevy_tpu import App, ResMut, Update, field, resource
from bevy_tpu.ecs.system import system
from bevy_tpu.stepping import Stepping
from bevy_tpu.time import TimePlugin


@resource
class Trace:
    a = field((), jnp.int32)
    b = field((), jnp.int32)


def _app():
    app = App(capacity=4)
    app.add_plugins(TimePlugin())
    app.insert_resource(Trace())

    @system
    def sys_a(t=ResMut(Trace)):
        t.a = t.a + 1

    @system
    def sys_b(t=ResMut(Trace)):
        t.b = t.b + 1

    app.add_systems(Update, sys_a, sys_b, chain=True)
    return app


def test_stepping_pauses_and_steps():
    app = _app()
    st = Stepping(app).add_schedule(Update)

    app.update(dt=1 / 60)                      # not enabled: runs normally
    tr = app.world.resource(Trace)
    assert (int(tr.a), int(tr.b)) == (1, 1)

    st.enable()
    app.update(dt=1 / 60)                      # paused: nothing ran
    tr = app.world.resource(Trace)
    assert (int(tr.a), int(tr.b)) == (1, 1)

    assert st.step() == "sys_a"                # one system at a time
    tr = app.world.resource(Trace)
    assert (int(tr.a), int(tr.b)) == (2, 1)

    assert st.continue_() == ["sys_b"]         # the rest of the frame
    tr = app.world.resource(Trace)
    assert (int(tr.a), int(tr.b)) == (2, 2)

    assert st.step() == "sys_a"                # cursor wrapped to a new pass

    st.disable()
    app.update(dt=1 / 60)                      # fused back into the frame
    tr = app.world.resource(Trace)
    assert (int(tr.a), int(tr.b)) == (4, 3)
