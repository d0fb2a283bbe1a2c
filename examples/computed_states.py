"""Computed and sub-states (reference twin:
examples/state/computed_states.rs + sub_states.rs — a game state
machine with a derived "in-menu overlay" computed state and a tutorial
sub-state that only exists while playing)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from bevy_tpu import App, ResMut, Update
from bevy_tpu.ecs.component import field, resource
from bevy_tpu.ecs.system import system
from bevy_tpu.state import (
    NextState, OnEnter, OnExit, add_computed_state, add_state,
    add_sub_state, in_state,
)


class AppState:
    MENU = 0
    PLAYING = 1
    PAUSED = 2


class Tutorial:          # sub-state: exists only while PLAYING
    ON = 0
    OFF = 1


@resource
class Log:
    overlay_enters = field((), jnp.int32)
    tutorial_frames = field((), jnp.int32)


def build_app():
    app = App(capacity=16)
    app.insert_resource(Log())
    add_state(app, "app", AppState.MENU,
              [AppState.MENU, AppState.PLAYING, AppState.PAUSED])
    # derived overlay: shown whenever not actively playing
    # (ref: ComputedStates::compute)
    add_computed_state(
        app, "overlay", values=[0, 1], sources=["app"],
        compute=lambda s: jnp.where(s["app"] == AppState.PLAYING, 0, 1),
        initial=1)
    # tutorial sub-state, re-initialized each time PLAYING is entered
    # (ref: SubStates #[source(AppState = AppState::Playing)])
    add_sub_state(app, "tutorial", Tutorial.ON, [Tutorial.ON, Tutorial.OFF],
                  parent="app", parent_value=AppState.PLAYING)

    @system
    def on_overlay_enter(log=ResMut(Log)):
        log.overlay_enters = log.overlay_enters + 1

    @system
    def tutorial_tick(log=ResMut(Log)):
        log.tutorial_frames = log.tutorial_frames + 1

    app.add_systems(OnEnter("overlay", 1), on_overlay_enter)
    app.add_systems(Update, tutorial_tick,
                    run_if=in_state("tutorial", Tutorial.ON))
    return app


def demo():
    app = build_app()
    app.update(dt=1 / 60)                                # menu
    app.world.set_resource_field("state_app", "next", AppState.PLAYING)
    for _ in range(3):
        app.update(dt=1 / 60)                            # playing+tutorial
    app.world.set_resource_field("state_app", "next", AppState.PAUSED)
    app.update(dt=1 / 60)                                # overlay returns
    log = app.world.state["res"]["log"]
    enters = int(jax.device_get(log["overlay_enters"]))
    tut = int(jax.device_get(log["tutorial_frames"]))
    print(f"overlay entered {enters}x, tutorial ticked {tut} frames")
    return enters, tut


if __name__ == "__main__":
    demo()
