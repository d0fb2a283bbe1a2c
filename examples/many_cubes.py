"""many_cubes stress test (reference twin:
examples/stress_tests/many_cubes.rs — cube-grid layout, deterministic
orbiting camera in --benchmark mode; BASELINE.md target: 160k cubes
≤16 ms/frame end-to-end).

The full frame — transform update, vertex transform (batched MXU matmul via
the uniform-mesh path), backface+frustum setup, tile binning, z-buffered
raster, Lambert shading — is one jitted step.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax.numpy as jnp

from bevy_tpu import App, Query, Read, Res, Update, With
from bevy_tpu.ecs.system import system
from bevy_tpu.math.quat import quat_from_euler
from bevy_tpu.render import RenderPlugin
from bevy_tpu.render.camera import Camera3d
from bevy_tpu.render.mesh import cuboid
from bevy_tpu.render.mesh3d import (
    AmbientLight, DirectionalLight, Mesh3d, MeshMaterial, Mesh3dPlugin,
)
from bevy_tpu.time import Time, TimePlugin
from bevy_tpu.transform import (
    GlobalTransform, Transform, TransformPlugin, transform_bundle,
)


@system
def orbit_camera(q=Query(Transform, With(Camera3d)), time=Res(Time)):
    """ref: many_cubes.rs --benchmark deterministic camera orbit."""
    t = time.elapsed * 0.2
    radius = 60.0
    eye = jnp.stack([jnp.sin(t) * radius, 12.0, jnp.cos(t) * radius])
    # look-at center: yaw to face origin, slight pitch down
    yaw = jnp.arctan2(eye[0], eye[2])
    pitch = -jnp.arctan2(12.0, radius)
    rot = quat_from_euler(yaw, pitch, jnp.zeros(()))
    q.transform.translation = jnp.where(q.mask[:, None], eye,
                                        q.transform.translation)
    q.transform.rotation = jnp.where(q.mask[:, None], rot,
                                     q.transform.rotation)


def build_app(n_cubes=160_000, width=1280, height=720, capacity=None,
              max_per_tile=3072, pairs_per_tri=2, backend="auto",
              tile_h=16, tile_w=128, window_budget=131072,
              eval_tris=8, cull_budget=65536, shards=None) -> App:
    # size the world to the scene (+ a little headroom): every pool-wide
    # op (propagation, culls, masks) scales with capacity, and the next
    # power of two above 160k would be 1.6x the content
    cap = capacity or ((n_cubes + 4103) // 8 * 8)
    app = App(capacity=cap)
    # eval_tris=8: a convex cube shows at most ~7 front-facing triangles,
    # so the compacted-cluster eval loop caps safely (see raster3d_splat).
    # cull_budget: instance-level frustum cull compacts to <=64k cubes
    # before the vertex stage (the orbit peaks at ~55k visible).
    if cull_budget is not None and cull_budget >= n_cubes:
        cull_budget = None
    plugin = Mesh3dPlugin(max_per_tile=max_per_tile, tile_h=tile_h,
                          tile_w=tile_w, window_budget=window_budget,
                          eval_tris=eval_tris, cull_budget=cull_budget,
                          pairs_per_tri=pairs_per_tri, backend=backend,
                          shards=shards)
    cube_id = plugin.add_mesh(cuboid(1.0, 1.0, 1.0))
    app.add_plugins(TimePlugin(), TransformPlugin(),
                    RenderPlugin(width=width, height=height), plugin)
    app.add_systems(Update, orbit_camera)

    app.world.spawn(Camera3d(), *transform_bundle(translation=(0.0, 12.0, 60.0)))
    app.world.spawn(DirectionalLight(illuminance=1.0),
                    *transform_bundle(rotation=(-0.3826834, 0.0, 0.0, 0.9238795)))

    # cube grid (ref: many_cubes.rs cube layout)
    side = int(np.ceil(n_cubes ** (1 / 3)))
    idx = np.arange(n_cubes)
    spacing = 2.5
    gx = (idx % side - side / 2) * spacing
    gy = (idx // side % side - side / 2) * spacing
    gz = (idx // (side * side) - side / 2) * spacing
    xyz = np.stack([gx, gy, gz], 1).astype(np.float32)
    tint = np.stack([
        0.5 + 0.5 * np.sin(idx * 0.37),
        0.5 + 0.5 * np.sin(idx * 0.53 + 2.0),
        0.5 + 0.5 * np.sin(idx * 0.71 + 4.0),
        np.ones(n_cubes),
    ], 1).astype(np.float32)
    app.world.spawn_batch([
        Mesh3d(mesh=cube_id),
        MeshMaterial(base_color=tint),
        Transform(translation=xyz),
        GlobalTransform(translation=xyz),
    ], n_cubes)
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
    t0 = pytime.perf_counter()
    n = 20
    for _ in range(n):
        state = step(state)
    jax.device_get(state["frame"])
    ms = (pytime.perf_counter() - t0) / n * 1000.0
    print(f"many_cubes {app.world.entity_count(Mesh3d)}: {ms:.3f} ms/frame")


if __name__ == "__main__":
    main()
