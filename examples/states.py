"""App states (reference twin: examples/state/states.rs — a Menu/InGame
state machine with OnEnter/OnExit schedules and `in_state` run
conditions driving which systems tick)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax.numpy as jnp

from bevy_tpu import App, Res, ResMut, Update
from bevy_tpu.ecs.component import field, resource
from bevy_tpu.ecs.system import system
from bevy_tpu.state import NextState, OnEnter, OnExit, add_state, in_state
from bevy_tpu.time import Time, TimePlugin


class GameState:
    MENU = 0
    IN_GAME = 1


@resource
class Stats:
    menu_frames = field((), jnp.int32)
    game_frames = field((), jnp.int32)
    entered_game = field((), jnp.int32)   # OnEnter(IN_GAME) fire count


def build_app():
    app = App(capacity=8)
    app.add_plugins(TimePlugin())
    app.insert_resource(Stats())
    add_state(app, "game", GameState.MENU,
              [GameState.MENU, GameState.IN_GAME])

    @system
    def menu_tick(s=ResMut(Stats), time=Res(Time), ns=NextState("game")):
        s.menu_frames = s.menu_frames + 1
        # "press play" after half a second
        ns.set(jnp.where(time.elapsed > 0.5,
                         GameState.IN_GAME, GameState.MENU))

    @system
    def game_tick(s=ResMut(Stats)):
        s.game_frames = s.game_frames + 1

    @system
    def setup_game(s=ResMut(Stats)):
        s.entered_game = s.entered_game + 1

    app.add_systems(Update, menu_tick,
                    run_if=in_state("game", GameState.MENU))
    app.add_systems(Update, game_tick,
                    run_if=in_state("game", GameState.IN_GAME))
    app.add_systems(OnEnter("game", GameState.IN_GAME), setup_game)
    return app


if __name__ == "__main__":
    app = build_app()
    for _ in range(60):
        app.update(dt=1 / 60)
    s = app.world.resource(Stats)
    print(f"menu_frames={int(s.menu_frames)} game_frames={int(s.game_frames)}"
          f" entered_game={int(s.entered_game)}")
