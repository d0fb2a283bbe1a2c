"""Custom schedules (reference twin: examples/ecs/custom_schedule.rs —
create a new schedule label and insert it into the Main order so its
systems run at a chosen point each frame)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from bevy_tpu import App, ResMut, Update
from bevy_tpu.app.main_schedule import ScheduleLabel
from bevy_tpu.ecs.component import field, resource
from bevy_tpu.ecs.system import system

# a brand-new schedule label (ref: ScheduleLabel derive)
SingleThreadedUpdate = ScheduleLabel("SingleThreadedUpdate")


@resource
class RunOrder:
    custom_stamp = field((), jnp.int32, default=-1)
    update_stamp = field((), jnp.int32, default=-1)
    clock = field((), jnp.int32)


def build_app():
    app = App(capacity=8)
    app.insert_resource(RunOrder())

    # insert the custom schedule right after Update in the Main order
    # (ref: MainScheduleOrder::insert_after, main_schedule.rs:214)
    idx = app.main_order.index(Update)
    app.main_order.insert(idx + 1, SingleThreadedUpdate)

    @system
    def in_update(o=ResMut(RunOrder)):
        o.clock = o.clock + 1
        o.update_stamp = o.clock

    @system
    def in_custom(o=ResMut(RunOrder)):
        o.clock = o.clock + 1
        o.custom_stamp = o.clock

    app.add_systems(Update, in_update)
    app.add_systems(SingleThreadedUpdate, in_custom)
    return app


def demo():
    app = build_app()
    app.update(dt=1 / 60)
    o = app.world.state["res"]["run_order"]
    up = int(jax.device_get(o["update_stamp"]))
    cu = int(jax.device_get(o["custom_stamp"]))
    print(f"Update ran at stamp {up}, custom schedule at stamp {cu}")
    assert cu > up, "custom schedule must run after Update"
    return up, cu


if __name__ == "__main__":
    demo()
