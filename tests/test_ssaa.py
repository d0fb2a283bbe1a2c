"""Supersampled AA (ref model: Msaa — here ordered-grid supersampling
resolved at readback)."""

import numpy as np

from bevy_tpu import App
from bevy_tpu.render import RenderPlugin
from bevy_tpu.render.camera import Camera3d
from bevy_tpu.render.mesh import cuboid
from bevy_tpu.render.mesh3d import (
    DirectionalLight, Mesh3d, MeshMaterial, Mesh3dPlugin,
)
from bevy_tpu.render.plugin import frame_image
from bevy_tpu.time import TimePlugin
from bevy_tpu.transform import TransformPlugin, transform_bundle


def _scene(ssaa):
    app = App(capacity=16)
    plugin = Mesh3dPlugin(backend="pallas_interpret")
    cube = plugin.add_mesh(cuboid(1.0, 1.0, 1.0))
    app.add_plugins(TimePlugin(), TransformPlugin(),
                    RenderPlugin(width=96, height=64, ssaa=ssaa), plugin)
    app.world.spawn(Camera3d(), *transform_bundle(translation=(0, 0, 3)))
    app.world.spawn(DirectionalLight(illuminance=1.0),
                    *transform_bundle(rotation=(-0.3, 0.2, 0.0, 0.93)))
    # tilted cube: aliased silhouette edges
    app.world.spawn(Mesh3d(mesh=cube),
                    MeshMaterial(base_color=(0.9, 0.9, 0.9, 1.0)),
                    *transform_bundle(rotation=(0.2, 0.3, 0.1, 0.93)))
    app.update(dt=1 / 60)
    return frame_image(app)


def test_ssaa_same_framing_smoother_edges():
    a = _scene(1).astype(float)
    b = _scene(2).astype(float)
    assert a.shape == b.shape                      # resolved to logical
    # same silhouette coverage (framing unchanged)
    ca = (np.abs(a - a[0, 0]).max(-1) > 10).mean()
    cb = (np.abs(b - b[0, 0]).max(-1) > 10).mean()
    assert abs(ca - cb) < 0.02, (ca, cb)
    # smoother edges: more intermediate gray levels on silhouettes
    def intermediates(img):
        g = img[..., :3].mean(-1)
        lo, hi = g.min(), g.max()
        return ((g > lo + 25) & (g < hi - 25)).sum()
    assert intermediates(b) > intermediates(a) * 1.3
