"""Sub-states (reference twin: examples/state/sub_states.rs — a Paused
sub-state that only exists while the parent state is InGame, resetting
to its initial value on every re-entry)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax.numpy as jnp

from bevy_tpu import App, Res, ResMut, Update
from bevy_tpu.ecs.component import field, resource
from bevy_tpu.ecs.system import system
from bevy_tpu.input import InputPlugin, KeyCode
from bevy_tpu.state import (
    NextState, OnEnter, add_state, add_sub_state, in_state,
)
from bevy_tpu.time import TimePlugin


class AppState:
    MENU = 0
    IN_GAME = 1


class Paused:
    RUNNING = 0
    PAUSED = 1


@resource
class Sim:
    steps = field((), jnp.int32)     # advances only while RUNNING
    pauses = field((), jnp.int32)    # OnEnter(PAUSED) count


def build_app():
    app = App(capacity=4)
    app.add_plugins(TimePlugin(), InputPlugin())
    app.insert_resource(Sim())
    add_state(app, "app", AppState.MENU, [AppState.MENU, AppState.IN_GAME])
    add_sub_state(app, "paused", Paused.RUNNING,
                  [Paused.RUNNING, Paused.PAUSED],
                  parent="app", parent_value=AppState.IN_GAME)

    @system
    def start(kb=Res("keyboard"), ns=NextState("app")):
        ns.set(jnp.where(kb.just_pressed[KeyCode.Enter],
                         AppState.IN_GAME, AppState.MENU))

    @system
    def toggle_pause(kb=Res("keyboard"), ns=NextState("paused"),
                     cur=Res("state_paused")):
        want = jnp.where(cur.current == Paused.RUNNING,
                         Paused.PAUSED, Paused.RUNNING)
        ns.set(jnp.where(kb.just_pressed[KeyCode.Space],
                         want, cur.current))

    @system
    def step_sim(s=ResMut(Sim)):
        s.steps = s.steps + 1

    @system
    def on_pause(s=ResMut(Sim)):
        s.pauses = s.pauses + 1

    app.add_systems(Update, start, run_if=in_state("app", AppState.MENU))
    app.add_systems(Update, toggle_pause,
                    run_if=in_state("app", AppState.IN_GAME))
    app.add_systems(Update, step_sim,
                    run_if=in_state("paused", Paused.RUNNING))
    app.add_systems(OnEnter("paused", Paused.PAUSED), on_pause)
    return app


if __name__ == "__main__":
    app = build_app()
    app.update(dt=1 / 60)                    # menu frame
    app.input.press(KeyCode.Enter)
    app.update(dt=1 / 60)                    # request IN_GAME
    app.input.release(KeyCode.Enter)
    for _ in range(3):
        app.update(dt=1 / 60)                # sim runs
    app.input.press(KeyCode.Space)
    app.update(dt=1 / 60)                    # request pause
    app.input.release(KeyCode.Space)
    for _ in range(3):
        app.update(dt=1 / 60)                # paused: no steps
    s = app.world.resource(Sim)
    print(f"sim steps: {int(s.steps)}  pauses entered: {int(s.pauses)}")
