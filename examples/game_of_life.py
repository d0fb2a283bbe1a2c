"""Conway game of life as a jitted compute pass (reference twin:
examples/shader/compute_shader_game_of_life.rs — the compute-shader
ping-pong texture; here the grid steps inside the frame jit and writes
the framebuffer directly, the TPU-native fullscreen compute)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax.numpy as jnp
import numpy as np

from bevy_tpu import App, ResMut, Update
from bevy_tpu.app.main_schedule import Render
from bevy_tpu.ecs.system import system
from bevy_tpu.render import RenderPlugin
from bevy_tpu.render.plugin import OVERLAY_SET, RenderTarget
from bevy_tpu.time import TimePlugin


@system
def life_step(life=ResMut("life_grid")):
    g = life.cells
    # toroidal 8-neighbour count via rolls (one fused XLA stencil)
    nb = sum(jnp.roll(jnp.roll(g, dy, 0), dx, 1)
             for dy in (-1, 0, 1) for dx in (-1, 0, 1)
             if (dy, dx) != (0, 0))
    life.cells = jnp.where((g > 0.5) & ((nb == 2) | (nb == 3)) |
                           (g < 0.5) & (nb == 3), 1.0, 0.0)


@system(name="life_blit")
def life_blit(life=ResMut("life_grid"),
              target=ResMut(RenderTarget.RESOURCE)):
    g = life.cells
    h, w = g.shape
    _, hh, ww = target.color.shape
    sy, sx = hh // h, ww // w
    up = jnp.repeat(jnp.repeat(g, sy, 0), sx, 1)[:hh, :ww]
    rgb = jnp.stack([up * 0.9, up * 0.8, up * 0.3 + 0.05])
    target.color = jnp.concatenate(
        [rgb, jnp.ones((1, hh, ww), jnp.float32)], 0)


def build_app(width=256, height=144, grid=(72, 128), seed=7):
    app = App(capacity=4)
    app.add_plugins(TimePlugin(), RenderPlugin(width=width, height=height))
    rng = np.random.default_rng(seed)
    cells = (rng.random(grid) < 0.3).astype(np.float32)
    app.insert_resource("life_grid", {"cells": jnp.asarray(cells)})
    app.add_systems(Update, life_step)
    app.add_systems(Render, life_blit, in_set=OVERLAY_SET)
    return app


if __name__ == "__main__":
    app = build_app()
    for _ in range(60):
        app.update(dt=1 / 60)
    import jax
    alive = int(np.asarray(jax.device_get(
        app.world.state["res"]["life_grid"]["cells"])).sum())
    print(f"alive cells after 60 generations: {alive}")
