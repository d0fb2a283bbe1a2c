"""Alien Cake Addict (reference twin:
examples/showcase/alien_cake_addict.rs — "Eat the cakes. Eat them
all." A complete 3D grid game: arrow-key movement with a cooldown,
timed bonus spawns, score, and a Playing/GameOver state machine with
restart)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax.numpy as jnp

from bevy_tpu import App, Query, Res, ResMut, Update, With
from bevy_tpu.ecs.component import component, field
from bevy_tpu.ecs.system import system
from bevy_tpu.input import InputPlugin, KeyCode
from bevy_tpu.render import RenderPlugin
from bevy_tpu.render.camera import Camera3d
from bevy_tpu.render.mesh import cuboid, uv_sphere
from bevy_tpu.render.mesh3d import (
    AmbientLight, DirectionalLight, Mesh3d, MeshMaterial, Mesh3dPlugin,
)
from bevy_tpu.time import Time, TimePlugin
from bevy_tpu.transform import Transform, TransformPlugin, transform_bundle

BOARD = 8
MOVE_COOLDOWN = 0.18
CAKE_PERIOD = 3.0        # ref: BonusSpawnTimer 5s, shortened for demos


class GameState:
    PLAYING = 0
    GAME_OVER = 1


@component
class PlayerTag:
    pass


@component
class CakeTag:
    pass


def _heights(seed=4):
    rng = np.random.default_rng(seed)
    return (rng.random((BOARD, BOARD)) * 0.25).astype(np.float32)


def build_app(width=320, height=200, backend="pallas_interpret", seed=4):
    app = App(capacity=128)
    plugin = Mesh3dPlugin(backend=backend)
    tile = plugin.add_mesh(cuboid(0.9, 0.3, 0.9))
    body = plugin.add_mesh(cuboid(0.5, 0.8, 0.5))
    cake_mesh = plugin.add_mesh(uv_sphere(0.28, 12, 8))
    app.add_plugins(TimePlugin(), TransformPlugin(), InputPlugin(),
                    RenderPlugin(width=width, height=height), plugin)
    app.insert_resource(AmbientLight(brightness=0.3))
    app.world.spawn(Camera3d(),
                    *transform_bundle(translation=(BOARD / 2 - 0.5, 7.0,
                                                   BOARD + 3.0),
                                      rotation=(-0.33, 0.0, 0.0, 0.944)))
    app.world.spawn(DirectionalLight(),
                    *transform_bundle(rotation=(-0.4, 0.2, 0.0, 0.9)))
    hts = _heights(seed)
    for i in range(BOARD):
        for j in range(BOARD):
            g = 0.55 + 0.25 * ((i + j) % 2)
            app.world.spawn(
                Mesh3d(mesh=tile),
                MeshMaterial(base_color=(0.2 * g, 0.8 * g, 0.3 * g, 1.0)),
                *transform_bundle(translation=(i, hts[i, j], j)))
    player = app.world.spawn(
        Mesh3d(mesh=body),
        MeshMaterial(base_color=(0.85, 0.3, 0.6, 1.0)), PlayerTag(),
        *transform_bundle(translation=(BOARD // 2,
                                       hts[BOARD // 2, BOARD // 2] + 0.55,
                                       BOARD // 2)))
    # ONE cake entity, pre-spawned and parked under the board when
    # inactive — spawning per bonus would retrace the frame jit (the
    # structural-mutation rule of ARCHITECTURE.md); position toggling
    # is the capacity-stable TPU-native form of spawn_bonus
    cake = app.world.spawn(
        Mesh3d(mesh=cake_mesh),
        MeshMaterial(base_color=(0.95, 0.8, 0.2, 1.0),
                     emissive=(0.4, 0.3, 0.05)), CakeTag(),
        *transform_bundle(translation=(0.0, -5.0, 0.0)))
    game = {"i": BOARD // 2, "j": BOARD // 2, "score": 0,
            "cooldown": 0.0, "cake": None, "cake_timer": 0.0,
            "cake_i": -1, "cake_j": -1, "rng": np.random.default_rng(seed),
            "player": player, "cake_ent": cake, "hts": hts,
            "over": False, "state": GameState.PLAYING}
    app._game = game

    @system(host=True)
    def playing(world):
        """Host game logic (ref: move_player + spawn_bonus +
        scoreboard_system under run_if(in_state(Playing)))."""
        g = app._game
        if g["state"] != GameState.PLAYING:
            return
        dt = 1.0 / 60.0
        g["cooldown"] = max(0.0, g["cooldown"] - dt)
        keys = app.input.keys
        if g["cooldown"] <= 0.0:
            di = dj = 0
            if keys[KeyCode.ArrowUp]:
                dj = -1
            elif keys[KeyCode.ArrowDown]:
                dj = 1
            elif keys[KeyCode.ArrowLeft]:
                di = -1
            elif keys[KeyCode.ArrowRight]:
                di = 1
            if di or dj:
                g["i"] = int(np.clip(g["i"] + di, 0, BOARD - 1))
                g["j"] = int(np.clip(g["j"] + dj, 0, BOARD - 1))
                g["cooldown"] = MOVE_COOLDOWN
                world.set_field(g["player"], Transform, "translation",
                                np.asarray([g["i"],
                                            g["hts"][g["i"], g["j"]] + 0.55,
                                            g["j"]], np.float32))
        # cake spawn / decay (ref: spawn_bonus — an uneaten cake costs
        # 3 points and game-overs below zero)
        g["cake_timer"] += dt
        if g["cake_timer"] >= CAKE_PERIOD:
            g["cake_timer"] = 0.0
            if g["cake"] is not None:
                g["score"] -= 3           # uneaten cake expires
                g["cake"] = None
                if g["score"] < 0:
                    g["over"] = True
                    g["state"] = GameState.GAME_OVER
                    world.set_field(g["cake_ent"], Transform,
                                    "translation",
                                    np.asarray([0, -5.0, 0], np.float32))
                    return
            ci = int(g["rng"].integers(0, BOARD))
            cj = int(g["rng"].integers(0, BOARD))
            g["cake_i"], g["cake_j"] = ci, cj
            g["cake"] = True
            world.set_field(g["cake_ent"], Transform, "translation",
                            np.asarray([ci, g["hts"][ci, cj] + 0.65, cj],
                                       np.float32))
        # eat (ref: the Playing update's cake collision)
        if g["cake"] is not None and (g["i"], g["j"]) == \
                (g["cake_i"], g["cake_j"]):
            g["cake"] = None
            g["score"] += 2
            world.set_field(g["cake_ent"], Transform, "translation",
                            np.asarray([0, -5.0, 0], np.float32))

    @system(host=True)
    def game_over(world):
        """ref: game_over_keyboard — Space restarts."""
        g = app._game
        if g["state"] != GameState.GAME_OVER:
            return
        if app.input.keys[KeyCode.Space]:
            g["score"] = 0
            g["over"] = False
            g["state"] = GameState.PLAYING

    app.add_systems(Update, [playing, game_over])
    return app


def main():
    app = build_app()
    g = app._game
    # scripted session: run toward cakes for a while
    for f in range(240):
        # steer toward the live cake
        for k in (KeyCode.ArrowUp, KeyCode.ArrowDown, KeyCode.ArrowLeft,
                  KeyCode.ArrowRight):
            app.input.release(k)
        if g["cake"] is not None:
            if g["cake_i"] > g["i"]:
                app.input.press(KeyCode.ArrowRight)
            elif g["cake_i"] < g["i"]:
                app.input.press(KeyCode.ArrowLeft)
            elif g["cake_j"] > g["j"]:
                app.input.press(KeyCode.ArrowDown)
            elif g["cake_j"] < g["j"]:
                app.input.press(KeyCode.ArrowUp)
        app.update(dt=1 / 60)
    print(f"score after 4s of cake chasing: {g['score']} "
          f"(game over: {g['over']})")


if __name__ == "__main__":
    main()
