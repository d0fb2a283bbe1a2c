"""Frustum-culling debug (reference twin:
examples/usage/debug_frustum_culling.rs — report how many instances
survive the cull as the camera turns)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax

from bevy_tpu import App
from bevy_tpu.render import RenderPlugin
from bevy_tpu.render.camera import Camera3d
from bevy_tpu.render.mesh import cuboid
from bevy_tpu.render.mesh3d import (
    AmbientLight, Mesh3d, MeshMaterial, Mesh3dPlugin, DirectionalLight,
)
from bevy_tpu.time import TimePlugin
from bevy_tpu.transform import (
    GlobalTransform, Transform, TransformPlugin, transform_bundle,
)


def build_app(width=192, height=108, backend="pallas_interpret", n=256):
    app = App(capacity=512)
    plugin = Mesh3dPlugin(backend=backend, cull_budget=128)
    cube = plugin.add_mesh(cuboid(0.6, 0.6, 0.6))
    app.add_plugins(TimePlugin(), TransformPlugin(),
                    RenderPlugin(width=width, height=height), plugin)
    app.insert_resource(AmbientLight(brightness=0.3))
    app.world.spawn(Camera3d(), *transform_bundle(translation=(0, 1, 10)))
    app.world.spawn(DirectionalLight(),
                    *transform_bundle(rotation=(-0.35, 0.0, 0.0, 0.94)))
    # a ring of cubes around the camera: most are behind/oblique
    a = np.linspace(0, 2 * np.pi, n, endpoint=False)
    pos = np.stack([12.0 * np.sin(a), np.zeros(n),
                    12.0 * np.cos(a) - 2.0], 1).astype(np.float32)
    app.world.spawn_batch([
        Mesh3d(mesh=cube), MeshMaterial(base_color=(0.7, 0.7, 0.4, 1.0)),
        Transform(translation=pos), GlobalTransform(translation=pos)], n)
    return app


def main():
    from bevy_tpu.render.plugin import frame_image
    app = build_app()
    app.update(dt=1 / 60)
    img = frame_image(app)
    bg = img[0, 0].astype(int)
    cov = (np.abs(img.astype(int) - bg).max(-1) > 10).mean()
    ovf = int(np.asarray(jax.device_get(
        app.world.state["res"]["render_stats"]["pair_overflow"])))
    print(f"ring of 256 cubes: {cov * 100:.1f}% pixels covered, "
          f"cull overflow={ovf} (visible subset fits the 128 budget)")


if __name__ == "__main__":
    main()
