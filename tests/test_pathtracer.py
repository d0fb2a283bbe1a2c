"""Reference pathtracer (ref model: bevy_solari's pathtracer — emissive
lighting, progressive accumulation, color bleed)."""

import numpy as np

from bevy_tpu import App
from bevy_tpu.render import RenderPlugin
from bevy_tpu.render.camera import Camera3d
from bevy_tpu.render.mesh import cuboid
from bevy_tpu.render.mesh3d import (
    Mesh3d, MeshMaterial, Mesh3dPlugin,
)
from bevy_tpu.render.pathtracer import PathtracerPlugin
from bevy_tpu.render.plugin import frame_image
from bevy_tpu.time import TimePlugin
from bevy_tpu.transform import TransformPlugin, transform_bundle


def _build():
    app = App(capacity=32)
    plugin = Mesh3dPlugin(backend="xla")
    cube = plugin.add_mesh(cuboid(1.0, 1.0, 1.0))
    app.add_plugins(TimePlugin(), TransformPlugin(),
                    RenderPlugin(width=96, height=64), plugin,
                    PathtracerPlugin(plugin, bounces=3, chunk=2048,
                                     sky=(0.0, 0.0, 0.0)))
    # floor (white), red wall on the left, emissive panel above
    app.world.spawn(Mesh3d(mesh=cube),
                    MeshMaterial(base_color=(0.85, 0.85, 0.85, 1.0)),
                    *transform_bundle(translation=(0.0, -0.55, 0.0),
                                      scale=(8.0, 0.1, 8.0)))
    app.world.spawn(Mesh3d(mesh=cube),
                    MeshMaterial(base_color=(0.9, 0.1, 0.1, 1.0)),
                    *transform_bundle(translation=(-2.0, 0.5, 0.0),
                                      scale=(0.1, 2.0, 6.0)))
    app.world.spawn(Mesh3d(mesh=cube),
                    MeshMaterial(base_color=(1.0, 1.0, 1.0, 1.0),
                                 emissive=(6.0, 6.0, 6.0)),
                    *transform_bundle(translation=(0.0, 2.5, 0.0),
                                      scale=(3.0, 0.1, 3.0)))
    app.world.spawn(Camera3d(), *transform_bundle(
        translation=(1.5, 1.2, 4.5), rotation=(-0.08, 0.12, 0.0, 0.99)))
    return app


def test_pathtracer_accumulates_and_bounces_light():
    import jax
    app = _build()
    for _ in range(6):
        app.update(dt=1 / 60)
    acc = app.world.state["res"]["pt_accum"]
    assert float(jax.device_get(acc["count"])) == 6.0
    img = frame_image(app).astype(np.float32)
    # the floor is lit only via bounced emissive light (sky is black)
    floor = img[40:60, 30:80]
    assert floor.max() > 25, floor.max()
    # color bleed: floor pixels near the red wall are redder than far ones
    near_wall = img[36:56, 4:18]
    far_wall = img[36:56, 70:90]
    ratio_near = near_wall[..., 0].mean() / max(near_wall[..., 1].mean(), 1)
    ratio_far = far_wall[..., 0].mean() / max(far_wall[..., 1].mean(), 1)
    assert ratio_near > ratio_far + 0.05, (ratio_near, ratio_far)


def test_pathtracer_converges():
    """Variance of the running mean shrinks with more samples."""
    app = _build()
    app.update(dt=1 / 60)
    img1 = frame_image(app).astype(np.float32)
    prev = img1
    diffs = []
    for _ in range(5):
        app.update(dt=1 / 60)
        cur = frame_image(app).astype(np.float32)
        diffs.append(np.abs(cur - prev).mean())
        prev = cur
    # successive frame deltas of the accumulated mean decrease
    assert diffs[-1] < diffs[0], diffs
