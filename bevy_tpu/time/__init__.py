"""Time (reference twin: bevy_time — Time<Real>/Time<Virtual>/Time<Fixed>
with overstep accumulator, `src/fixed.rs:69,181`; `run_fixed_main_schedule`
drains the accumulator `fixed.rs:243`; `TimeUpdateStrategy` manual clock for
deterministic tests `src/lib.rs:113`).

The generic `Time` resource follows the current context clock: virtual time
in the main schedules, fixed time inside FixedMain (the App's fixed loop
swaps it, exactly like the reference).
"""

import jax.numpy as jnp

from bevy_tpu.app.plugin import Plugin
from bevy_tpu.app.main_schedule import First
from bevy_tpu.ecs.component import field, resource
from bevy_tpu.ecs.query import Res, ResMut
from bevy_tpu.ecs.system import system

DEFAULT_FIXED_HZ = 64.0  # ref: bevy_time Fixed default 64 Hz


@resource
class Time:
    delta = field((), jnp.float32)
    elapsed = field((), jnp.float32)


@resource
class TimeReal:
    delta = field((), jnp.float32)
    elapsed = field((), jnp.float32)


@resource
class TimeVirtual:
    delta = field((), jnp.float32)
    elapsed = field((), jnp.float32)
    relative_speed = field((), jnp.float32, default=1.0)
    paused = field((), jnp.bool_, default=False)
    max_delta = field((), jnp.float32, default=0.25)  # ref: Virtual::max_delta

@resource
class TimeFixed:
    timestep = field((), jnp.float32, default=1.0 / DEFAULT_FIXED_HZ)
    overstep = field((), jnp.float32)
    elapsed = field((), jnp.float32)


@resource
class FrameInput:
    """Host→device per-frame input written by App.update (dt, frame no)."""
    dt = field((), jnp.float32)


@resource
class FrameCount:
    count = field((), jnp.int32)


@system(name="time_system")
def time_system(inp=Res(FrameInput),
                real=ResMut(TimeReal),
                virt=ResMut(TimeVirtual),
                time=ResMut(Time),
                fixed=ResMut(TimeFixed),
                frames=ResMut(FrameCount)):
    dt = inp.dt
    real.delta = dt
    real.elapsed = real.elapsed + dt
    vdt = jnp.minimum(dt, virt.max_delta) * virt.relative_speed
    vdt = jnp.where(virt.paused, 0.0, vdt)
    virt.delta = vdt
    virt.elapsed = virt.elapsed + vdt
    time.delta = vdt
    time.elapsed = virt.elapsed  # generic clock follows virtual
    # accumulate the fixed overstep (drained by the App's fixed loop,
    # ref: run_fixed_main_schedule fixed.rs:243)
    fixed.overstep = fixed.overstep + vdt
    frames.count = frames.count + 1


class TimePlugin(Plugin):
    def build(self, app):
        app.init_resource(Time())
        app.init_resource(TimeReal())
        app.init_resource(TimeVirtual())
        app.init_resource(TimeFixed())
        app.init_resource(FrameInput())
        app.init_resource(FrameCount())
        app.add_systems(First, time_system)


# ----------------------------------------------------------------------
# Timer / Stopwatch as array helpers (ref: bevy_time Timer/Stopwatch).
# Batched: a column of timers is a dict of arrays, tickable in one VPU op.

def timer_new(duration, repeating=False, shape=()):
    return {
        "elapsed": jnp.zeros(shape, jnp.float32),
        "duration": jnp.broadcast_to(jnp.asarray(duration, jnp.float32), shape),
        "repeating": jnp.broadcast_to(jnp.asarray(repeating, jnp.bool_), shape),
        "finished": jnp.zeros(shape, jnp.bool_),
    }


def timer_tick(timer, dt):
    """Returns (new_timer, just_finished mask)."""
    elapsed = timer["elapsed"] + dt
    finished = elapsed >= timer["duration"]
    just = finished & ~timer["finished"] | (finished & timer["repeating"])
    wrapped = jnp.where(
        timer["repeating"] & finished,
        elapsed % jnp.maximum(timer["duration"], 1e-9), elapsed)
    new = {
        "elapsed": jnp.where(timer["repeating"], wrapped,
                             jnp.minimum(elapsed, timer["duration"])),
        "duration": timer["duration"],
        "repeating": timer["repeating"],
        "finished": finished & ~timer["repeating"],
    }
    return new, just
