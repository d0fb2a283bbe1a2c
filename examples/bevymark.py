"""bevymark stress test (reference twin: examples/stress_tests/bevymark.rs —
continuous 10k birds/sec spawning, gravity, edge bounce; the structural-
mutation-under-load workload of BASELINE.md).

TPU design note: the reference spawns via Commands each frame; here the
in-jit device-tier Commands claim free rows from the fixed-capacity pools
with a static per-frame budget — no retrace while capacity holds
(ARCHITECTURE.md "structural mutation under jit").
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax.numpy as jnp

from bevy_tpu import App, Commands, Query, Read, Res, Update, component, field
from bevy_tpu.color import srgba
from bevy_tpu.ecs.system import system
from bevy_tpu.render import (
    AtlasBuilder, Camera2d, ClearColor, RenderPlugin, Sprite, SpritePlugin,
    TextureAtlas,
)
from bevy_tpu.time import Time, TimePlugin
from bevy_tpu.transform import GlobalTransform, Transform, TransformPlugin, transform_bundle

# ref: bevymark.rs constants
BIRD_SPEED = 500.0       # horizontal launch speed
GRAVITY = -980.0
MAX_VELOCITY = 750.0
BIRD_SIZE = 32.0
SPAWN_PER_SEC = 10_000


@component
class Bird:
    velocity = field(2)


def _hash01(x):
    """Counter-based pseudo-random in [0,1) (deterministic under jit)."""
    x = (x * 1103515245 + 12345) & 0x7FFFFFFF
    x = (x * 1103515245 + 12345) & 0x7FFFFFFF
    return (x % 65536).astype(jnp.float32) / 65536.0


def make_spawn_system(handle, half_w, half_h, budget=256):
    u0, v0 = handle["uv_min"]
    u1, v1 = handle["uv_max"]

    @system(name="spawn_birds")
    def spawn_birds(commands=Commands(budget=budget), time=Res(Time),
                    frames=Res("frame_count")):
        count = jnp.minimum(
            jnp.asarray(SPAWN_PER_SEC, jnp.float32) * time.delta,
            budget).astype(jnp.int32)
        lane = jnp.arange(budget, dtype=jnp.int32)
        seed = frames.count * budget + lane
        vx = BIRD_SPEED * (0.5 + 0.5 * _hash01(seed))
        vy = MAX_VELOCITY * (_hash01(seed + 7919) - 0.5)
        vel = jnp.stack([vx, vy], 1)
        commands.spawn(
            Bird(velocity=vel),
            Sprite(size=(BIRD_SIZE, BIRD_SIZE), uv_min=(u0, v0),
                   uv_max=(u1, v1), tex=handle["tex"],
                   color=jnp.stack([
                       0.5 + 0.5 * _hash01(seed + 13),
                       0.5 + 0.5 * _hash01(seed + 101),
                       0.5 + 0.5 * _hash01(seed + 211),
                       jnp.ones(budget)], 1)),
            Transform(translation=jnp.stack(
                [jnp.full(budget, -half_w + BIRD_SIZE),
                 jnp.full(budget, half_h - BIRD_SIZE),
                 _hash01(seed + 31) * 10.0], 1)),
            GlobalTransform(),
            count=count)

    return spawn_birds


def make_movement_system(half_w, half_h):
    @system(name="bird_movement")
    def bird_movement(q=Query(Transform, Bird), time=Res(Time)):
        """ref: movement_system + collision_system (gravity + edge bounce)."""
        dt = time.delta
        pos = q.transform.translation
        vel = q.bird.velocity
        new_pos2 = pos[:, :2] + vel * dt
        vy = vel[:, 1] + GRAVITY * dt
        # bounce (ref: reflect when past half extents)
        hx = half_w - BIRD_SIZE / 2
        hy = half_h - BIRD_SIZE / 2
        vx = jnp.where(jnp.abs(new_pos2[:, 0]) > hx, -vel[:, 0], vel[:, 0])
        vy = jnp.where(new_pos2[:, 1] < -hy, jnp.abs(vy),
                       jnp.where(new_pos2[:, 1] > hy, -jnp.abs(vy), vy))
        vy = jnp.clip(vy, -MAX_VELOCITY, MAX_VELOCITY)
        q.bird.velocity = jnp.stack([vx, vy], 1)
        q.transform.translation = pos.at[:, :2].set(
            jnp.stack([jnp.clip(new_pos2[:, 0], -hx, hx),
                       jnp.clip(new_pos2[:, 1], -hy, hy)], 1))

    return bird_movement


def build_app(width=1280, height=720, capacity=49152, spawn_budget=256,
              max_per_tile=1024, max_visible=49152, sprite_batch=8,
              sample_dtype="bf16", mode="splat") -> App:
    # capacity right-sized to the benchmark population (steady state
    # ~30k live + ~6k spawned during measurement; the round-4 profile
    # showed ~7 ms of capacity-sized mask/column copies at 131072 —
    # the same lever as many_cubes' world right-sizing). Growth past
    # capacity retraces (ARCHITECTURE.md), so long-running sessions
    # still work — they just pay one recompile per doubling.
    app = App(capacity=capacity)
    app.add_plugins(TimePlugin(), TransformPlugin(),
                    RenderPlugin(width=width, height=height),
                    SpritePlugin(max_visible=min(max_visible, capacity),
                                 max_per_tile=max_per_tile,
                                 pairs_per_sprite=2,  # birds span <= 2 windows
                                 sprite_batch=sprite_batch,
                                 # sort-free window-splat raster + GPU-
                                 # texture-filter-class bf16 sampling;
                                 # birds never rotate and the bird texture
                                 # is a tinted alpha mask (RGB == 1), so
                                 # the kernel's static specializations
                                 # apply (see ops/raster2d_splat.py)
                                 mode=mode, sample_dtype=sample_dtype,
                                 rotated=False, alpha_only=True))
    app.insert_resource(ClearColor(color=tuple(np.asarray(srgba(0.1, 0.1, 0.12)))))

    # atlas sized to content: its width/height are the K dims of the
    # raster kernel's separable sampling matmuls
    atlas = AtlasBuilder(32, 32)
    yy, xx = np.mgrid[0:32, 0:32]
    d = np.sqrt((xx - 15.5) ** 2 + (yy - 15.5) ** 2)
    bird = np.ones((32, 32, 4), np.float32)
    bird[..., 3] = np.clip(15.5 - d + 0.5, 0, 1)
    handle = atlas.add(bird, "bird", srgb=False)
    app.insert_resource(TextureAtlas.RESOURCE, {"data": atlas.build()})

    app.world.spawn(Camera2d(), *transform_bundle())
    app.world.register_component(Bird)
    app.add_systems(Update, [
        make_spawn_system(handle, width / 2, height / 2, spawn_budget),
        make_movement_system(width / 2, height / 2)], chain=True)
    return app


def main():
    import time as pytime
    import jax

    app = build_app()
    step = jax.jit(app.frame_fn(), donate_argnums=0)
    state = app.world.state
    for _ in range(3):
        state = step(state)
    jax.device_get(state["frame"])
    # let the bird population build up, then measure steady state
    for _ in range(150):
        state = step(state)
    jax.device_get(state["frame"])
    t0 = pytime.perf_counter()
    n = 30
    for _ in range(n):
        state = step(state)
    jax.device_get(state["frame"])
    ms = (pytime.perf_counter() - t0) / n * 1000.0
    alive = int(np.asarray(jax.device_get(state["ent"]["alive"])).sum())
    print(f"bevymark {alive} birds: {ms:.3f} ms/frame")


if __name__ == "__main__":
    main()
