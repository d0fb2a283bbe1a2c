"""ECS guided tour (reference twin: examples/ecs/ecs_guide.rs — a tiny
"game" driven entirely by ECS machinery: resources, queries, Commands,
Local state, system ordering and run criteria).

The scenario: players accumulate random scores each round; the game
ends after `max_rounds`. Device-resident columns hold the scores (the
TPU-first twist: scoring is one vectorized system, not a per-entity
loop)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from bevy_tpu import App, Query, Read, Res, ResMut, Update
from bevy_tpu.ecs.component import component, field, resource
from bevy_tpu.ecs.system import system


@component
class Player:
    index = field((), jnp.int32)


@component
class Score:
    value = field((), jnp.int32)
    streak = field((), jnp.int32)       # consecutive scoring rounds


@resource
class GameState:
    round = field((), jnp.int32)
    winning_score = field((), jnp.int32)
    done = field((), jnp.int32)


@resource
class GameRules:
    max_rounds = field((), jnp.int32, default=10)
    max_players = field((), jnp.int32, default=4)


def build_app(n_players=3, max_rounds=10):
    app = App(capacity=64)
    app.insert_resource(GameRules(max_rounds=max_rounds))
    app.insert_resource(GameState(winning_score=15))

    for i in range(n_players):
        app.world.spawn(Player(index=i), Score())

    @system(name="new_round")
    def new_round(rules=Res(GameRules), state=ResMut(GameState)):
        state.round = jnp.where(state.done == 0, state.round + 1,
                                state.round)

    @system(name="score")
    def score(q=Query(Player, Score), state=Res(GameState)):
        # deterministic per-round "dice": hash of (round, player index)
        x = (state.round * 1103515245 + q.score.value * 97 +
             jnp.arange(q.score.value.shape[0], dtype=jnp.int32) * 7919)
        gained = (x % 3 == 0) & q.mask & (state.done == 0)
        q.score.value = q.score.value + gained.astype(jnp.int32)
        q.score.streak = jnp.where(gained, q.score.streak + 1, 0)

    @system(name="game_over")
    def game_over(q=Query(Read(Score)), rules=Res(GameRules),
                  state=ResMut(GameState)):
        best = jnp.max(jnp.where(q.mask, q.score.value, 0))
        over = (best >= state.winning_score) | \
            (state.round >= rules.max_rounds)
        state.done = over.astype(jnp.int32)

    app.add_systems(Update, new_round)
    app.add_systems(Update, score, after="new_round")
    app.add_systems(Update, game_over, after="score")
    return app


if __name__ == "__main__":
    app = build_app()
    for _ in range(12):
        app.update(dt=1 / 60)
    state = app.world.state
    scores = np.asarray(jax.device_get(
        app.world.column(Score, "value")))
    gs = state["res"]["game_state"]
    print("rounds:", int(jax.device_get(gs["round"])),
          "done:", int(jax.device_get(gs["done"])),
          "scores:", scores[:4].tolist())
