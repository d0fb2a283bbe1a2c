"""Game menu (reference twin: examples/games/game_menu.rs — a
menu → settings → in-game state machine whose UI screens are
StateScoped entities: each screen's nodes despawn automatically when
its state is exited; keyboard drives the transitions)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax.numpy as jnp

from bevy_tpu import App, Query, Res, Update, With
from bevy_tpu.ecs.component import component
from bevy_tpu.ecs.system import system
from bevy_tpu.input import InputPlugin, KeyCode
from bevy_tpu.render import (
    AtlasBuilder, Camera2d, RenderPlugin, SpritePlugin, TextureAtlas,
)
from bevy_tpu.state import NextState, add_state, state_scoped
from bevy_tpu.time import TimePlugin
from bevy_tpu.transform import TransformPlugin, transform_bundle
from bevy_tpu.ui import Style, UiPlugin
from bevy_tpu.ui_theme import Theme


class Screen:
    MENU = 0
    SETTINGS = 1
    IN_GAME = 2


@component
class MenuRoot:
    pass


def build_app(width=320, height=240):
    app = App(capacity=128)
    builder = AtlasBuilder(256, 256)
    app.add_plugins(TimePlugin(), InputPlugin(), TransformPlugin(),
                    RenderPlugin(width=width, height=height), SpritePlugin(),
                    UiPlugin(width=width, height=height,
                             atlas_builder=builder))
    app.insert_resource(TextureAtlas.RESOURCE, {"data": builder.build()})
    app.world.spawn(Camera2d(), *transform_bundle())
    add_state(app, "screen", Screen.MENU,
              [Screen.MENU, Screen.SETTINGS, Screen.IN_GAME])
    ui, th = app.ui, Theme()

    def spawn_screen(value, bg):
        """One panel + two themed buttons, all StateScoped to `value`."""
        panel = ui.spawn_node(app.world, Style(
            width=200, height=140, left=60, top=40, padding=12, gap=10,
            background=bg))
        app.world.insert(panel, MenuRoot(),
                         state_scoped("screen", value))
        for primary in (True, False):
            b = th.button(ui, app.world, parent=panel, primary=primary)
            app.world.insert(b, state_scoped("screen", value))
        return panel

    # Screen construction runs host-tier (structural spawns): a host
    # system watches the state value and rebuilds the screen on each
    # entry edge — StateScoped handles the matching despawn on exit.
    # (OnEnter schedules are jitted transition segments, so the
    # device-side OnEnter hook stays for device work; host spawns key
    # off the edge here instead.)
    colors = {Screen.MENU: th.color("panel.bg"),
              Screen.SETTINGS: (0.25, 0.2, 0.3, 1.0),
              Screen.IN_GAME: (0.1, 0.25, 0.12, 1.0)}
    last = {"value": Screen.MENU}

    @system(host=True)
    def build_screens(cur=Res("state_screen")):
        value = int(cur.current)
        if value != last["value"]:
            last["value"] = value
            spawn_screen(value, colors[value])

    @system
    def navigate(kb=Res("keyboard"), ns=NextState("screen"),
                 cur=Res("state_screen")):
        c = cur.current
        # Enter advances MENU→IN_GAME / SETTINGS→MENU; S opens settings;
        # Escape returns to MENU
        want = jnp.where(
            kb.just_pressed[KeyCode.Enter],
            jnp.where(c == Screen.MENU, Screen.IN_GAME, Screen.MENU),
            jnp.where(kb.just_pressed[KeyCode.KeyS] & (c == Screen.MENU),
                      Screen.SETTINGS,
                      jnp.where(kb.just_pressed[KeyCode.Escape],
                                Screen.MENU, c)))
        ns.set(want)

    app.add_systems(Update, [navigate, build_screens])
    # spawn the first screen (OnEnter doesn't fire for the initial state)
    spawn_screen(Screen.MENU, th.color("panel.bg"))
    return app


def count_roots(app):
    import numpy as np
    comp = app.world.state["comp"]["menu_root"]
    return int(np.asarray(comp["has"] &
                          app.world.state["ent"]["alive"]).sum())


if __name__ == "__main__":
    app = build_app()
    app.update(dt=1 / 60)
    print("menu screens:", count_roots(app))
    app.input.press(KeyCode.KeyS)
    app.update(dt=1 / 60)      # request settings
    app.input.release(KeyCode.KeyS)
    app.update(dt=1 / 60)      # transition applies; menu scoped-despawns
    print("after S (settings):", count_roots(app))
    app.input.press(KeyCode.Escape)
    app.update(dt=1 / 60)
    app.input.release(KeyCode.Escape)
    app.update(dt=1 / 60)
    print("after Esc (menu):", count_roots(app))
