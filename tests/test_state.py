"""State machine tests (ref model: bevy_state in-crate tests —
OnEnter/OnExit firing order, in_state run conditions)."""

import jax.numpy as jnp

from bevy_tpu import App, Res, ResMut, Update, field, resource
from bevy_tpu.ecs.system import system
from bevy_tpu.state import (
    CurrentState, NextState, OnEnter, OnExit, add_state, in_state,
)
from bevy_tpu.time import TimePlugin


class GameState:
    MENU = 0
    PLAYING = 1
    PAUSED = 2


@resource
class Log:
    enters = field((), jnp.int32)
    exits = field((), jnp.int32)
    updates = field((), jnp.int32)


def _app():
    app = App(capacity=16)
    app.add_plugins(TimePlugin())
    app.insert_resource(Log())
    add_state(app, "game", GameState.MENU,
              [GameState.MENU, GameState.PLAYING, GameState.PAUSED])
    return app


def test_transition_runs_exit_then_enter():
    app = _app()

    @system
    def on_exit_menu(log=ResMut(Log)):
        log.exits = log.exits + 1

    @system
    def on_enter_playing(log=ResMut(Log)):
        log.enters = log.enters + 1

    @system
    def request(ns=NextState("game"), log=Res(Log)):
        ns.set(GameState.PLAYING)

    app.add_systems(OnExit("game", GameState.MENU), on_exit_menu)
    app.add_systems(OnEnter("game", GameState.PLAYING), on_enter_playing)
    app.add_systems(Update, request)

    app.update(dt=1 / 60)  # request fires AFTER this frame's transition
    assert int(app.world.resource("state_game").current) == GameState.MENU
    app.update(dt=1 / 60)  # transition applies at StateTransition
    assert int(app.world.resource("state_game").current) == GameState.PLAYING
    log = app.world.resource(Log)
    assert int(log.exits) == 1
    assert int(log.enters) == 1
    app.update(dt=1 / 60)  # self-transition (PLAYING→PLAYING) must not refire
    log = app.world.resource(Log)
    assert int(log.enters) == 1


def test_in_state_run_condition():
    app = _app()

    @system
    def count(log=ResMut(Log)):
        log.updates = log.updates + 1

    @system
    def to_playing(ns=NextState("game")):
        ns.set(GameState.PLAYING)

    app.add_systems(Update, count, run_if=in_state("game", GameState.PLAYING))
    app.add_systems(Update, to_playing)
    app.update(dt=1 / 60)   # still MENU during Update
    assert int(app.world.resource(Log).updates) == 0
    app.update(dt=1 / 60)   # transition happened before this Update
    app.update(dt=1 / 60)
    assert int(app.world.resource(Log).updates) == 2


def test_state_scoped_cleanup():
    """StateScoped entities despawn when their state value is exited."""
    from bevy_tpu.state import state_scoped
    from bevy_tpu import component as _component, field as _field
    import jax.numpy as jnp

    @_component
    class MenuItem:
        pass

    app = _app()

    @system
    def to_playing(ns=NextState("game")):
        ns.set(GameState.PLAYING)

    app.world.register_component(MenuItem)
    e = app.world.spawn(MenuItem(), state_scoped("game", GameState.MENU))
    keeper = app.world.spawn(MenuItem())
    app.add_systems(Update, to_playing)
    app.update(dt=1 / 60)   # still MENU during this frame's transition
    assert app.world.entity_count(MenuItem) == 2
    app.update(dt=1 / 60)   # transition MENU→PLAYING fires cleanup
    assert app.world.entity_count(MenuItem) == 1
    assert not app.world.is_alive(e)
    assert app.world.is_alive(keeper)


def test_sub_states():
    from bevy_tpu.state import add_sub_state

    class Battle:
        SELECT = 0
        ATTACK = 1

    app = _app()
    add_sub_state(app, "battle", Battle.SELECT,
                  [Battle.SELECT, Battle.ATTACK],
                  parent="game", parent_value=GameState.PLAYING)

    @system
    def on_enter_select(log=ResMut(Log)):
        log.enters = log.enters + 1

    @system
    def on_exit_battle_any(log=ResMut(Log)):
        log.exits = log.exits + 1

    app.add_systems(OnEnter("battle", Battle.SELECT), on_enter_select)
    app.add_systems(OnExit("battle", Battle.SELECT), on_exit_battle_any)

    @system
    def count_in_attack(log=ResMut(Log)):
        log.updates = log.updates + 1

    app.add_systems(Update, count_in_attack,
                    run_if=in_state("battle", Battle.SELECT))

    # while parent is MENU, the sub-state does not exist
    app.update(dt=1 / 60)
    assert int(app.world.resource(Log).updates) == 0
    assert not bool(app.world.resource("state_battle").exists)

    # enter PLAYING → sub-state initializes to SELECT, OnEnter fires once
    @system
    def to_playing(ns=NextState("game")):
        ns.set(GameState.PLAYING)

    app.add_systems(Update, to_playing)
    app.update(dt=1 / 60)  # transition applies next frame's StateTransition
    app.update(dt=1 / 60)
    log = app.world.resource(Log)
    assert bool(app.world.resource("state_battle").exists)
    assert int(log.enters) == 1
    assert int(app.world.resource(Log).updates) >= 1

    # own transition within the sub-state fires OnExit(SELECT)
    @system
    def to_attack(ns=NextState("battle")):
        ns.set(Battle.ATTACK)

    app.schedules[Update].entries = [
        e for e in app.schedules[Update].entries
        if e.system.name not in ("to_playing",)]
    app.schedules[Update]._order = None
    app._plan_cache.clear()
    app.add_systems(Update, to_attack)
    app.update(dt=1 / 60)
    app.update(dt=1 / 60)
    assert int(app.world.resource("state_battle").current) == Battle.ATTACK
    assert int(app.world.resource(Log).exits) == 1


def test_computed_state():
    """A derived 'paused-or-menu' overlay state recomputes from its source
    and fires enter/exit on change."""
    import jax.numpy as jnp
    from bevy_tpu.state import add_computed_state

    app = _app()

    # overlay = 1 when game is not PLAYING
    add_computed_state(
        app, "overlay", values=[0, 1], sources=["game"],
        compute=lambda s: jnp.where(s["game"] == GameState.PLAYING, 0, 1),
        initial=1)

    @system
    def on_overlay_off(log=ResMut(Log)):
        log.exits = log.exits + 1

    app.add_systems(OnExit("overlay", 1), on_overlay_off)

    @system
    def to_playing(ns=NextState("game")):
        ns.set(GameState.PLAYING)

    app.add_systems(Update, to_playing)
    app.update(dt=1 / 60)
    assert int(app.world.resource("state_overlay").current) == 1
    app.update(dt=1 / 60)   # game→PLAYING, overlay recomputes to 0
    assert int(app.world.resource("state_overlay").current) == 0
    assert int(app.world.resource(Log).exits) == 1
    app.update(dt=1 / 60)   # stable: no refire
    assert int(app.world.resource(Log).exits) == 1
