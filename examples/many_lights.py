"""many_lights stress test (reference twin:
examples/stress_tests/many_lights.rs — 100k point lights; the clustered
light-binning + per-cluster shading workload of BASELINE.md row 4).

Scene: a field of cubes on a huge flattened-cube floor (single shared mesh
keeps the uniform G-buffer path), lit by a grid of tinted point lights.
Geometry raster → G-buffer, tile-binned lights → one deferred shade kernel.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax.numpy as jnp

from bevy_tpu import App
from bevy_tpu.render import RenderPlugin
from bevy_tpu.render.camera import Camera3d
from bevy_tpu.render.deferred import DeferredLightingPlugin, PointLight
from bevy_tpu.render.mesh import cuboid
from bevy_tpu.render.mesh3d import (
    AmbientLight, DirectionalLight, Mesh3d, MeshMaterial, Mesh3dPlugin,
)
from bevy_tpu.time import TimePlugin
from bevy_tpu.transform import (
    GlobalTransform, Transform, TransformPlugin, transform_bundle,
)


def build_app(n_lights=100_000, n_cubes=1024, width=1280, height=720,
              capacity=None, backend="auto", max_lights_per_tile=512,
              light_range=6.0, camera=(0.0, 50.0, 90.0),
              pairs_per_light=3) -> App:
    # capacity right-sized to the scene (the binning pair arrays and
    # every pool-wide op scale with it; the r5 profile showed the
    # 524k-pair sort/gather chain at power-of-two capacity ~5.4 ms —
    # same lever as many_cubes/bevymark). pairs_per_light=3: with the
    # r5 view-space-box light bounds the bench camera measures ~285k
    # real pairs (pair_overflow == 0 at the 306k cap; it was ~1.05M
    # before the fix — a below-camera stripe of lights projected
    # full-screen rects and displaced real lights past the cap).
    cap = capacity or ((n_lights + n_cubes + 1031) // 8 * 8)
    app = App(capacity=cap)
    plugin = Mesh3dPlugin(backend=backend, deferred=True)
    cube_id = plugin.add_mesh(cuboid(1.0, 1.0, 1.0))
    app.add_plugins(TimePlugin(), TransformPlugin(),
                    RenderPlugin(width=width, height=height), plugin,
                    DeferredLightingPlugin(
                        backend=backend,
                        pairs_per_light=pairs_per_light,
                        max_lights_per_tile=max_lights_per_tile))
    app.insert_resource(AmbientLight(brightness=0.02))

    app.world.spawn(Camera3d(), *transform_bundle(
        translation=camera,
        rotation=(-0.26, 0.0, 0.0, 0.966)))  # pitch down ~30°
    app.world.spawn(DirectionalLight(illuminance=0.1),
                    *transform_bundle(rotation=(-0.38, 0.0, 0.0, 0.925)))

    # floor: one flattened cube instance (keeps the mesh set uniform)
    app.world.spawn(
        Mesh3d(mesh=cube_id),
        MeshMaterial(base_color=(0.35, 0.35, 0.38, 1.0)),
        *transform_bundle(translation=(0.0, -0.55, 0.0),
                          scale=(400.0, 1.0, 400.0)))

    # cube field
    side_c = int(np.ceil(np.sqrt(n_cubes)))
    ic = np.arange(n_cubes)
    cxyz = np.stack([(ic % side_c - side_c / 2) * 6.0,
                     np.full(n_cubes, 0.5),
                     (ic // side_c - side_c / 2) * 6.0], 1).astype(np.float32)
    app.world.spawn_batch([
        Mesh3d(mesh=cube_id),
        MeshMaterial(base_color=(0.8, 0.8, 0.8, 1.0)),
        Transform(translation=cxyz),
        GlobalTransform(translation=cxyz),
    ], n_cubes)

    # light grid hovering above the floor (ref: 100k lights on a sphere —
    # a plane-filling grid lights actual geometry here)
    side = max(1, int(np.ceil(np.sqrt(n_lights))))
    il = np.arange(n_lights)
    spacing = 380.0 / side
    lxyz = np.stack([(il % side - side / 2) * spacing,
                     np.full(n_lights, 1.5),
                     (il // side - side / 2) * spacing], 1).astype(np.float32)
    tint = np.stack([0.5 + 0.5 * np.sin(il * 0.3),
                     0.5 + 0.5 * np.sin(il * 0.31 + 2),
                     0.5 + 0.5 * np.sin(il * 0.37 + 4)], 1).astype(np.float32)
    app.world.spawn_batch([
        PointLight(color=tint, intensity=3.0, range=light_range),
        Transform(translation=lxyz),
        GlobalTransform(translation=lxyz),
    ], n_lights)
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
    print(f"many_lights {app.world.entity_count(PointLight)}: "
          f"{ms:.3f} ms/frame")


if __name__ == "__main__":
    main()
