"""Order-independent transparency (ref model: bevy_core_pipeline oit —
a transparent pane tints what's behind it; two panes blend regardless of
submission order)."""

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


def _scene(panes):
    app = App(capacity=32)
    plugin = Mesh3dPlugin(backend="pallas_interpret")
    cube = plugin.add_mesh(cuboid(1.0, 1.0, 1.0))
    app.add_plugins(TimePlugin(), TransformPlugin(),
                    RenderPlugin(width=160, height=96), plugin)
    app.world.spawn(Camera3d(), *transform_bundle(translation=(0, 0, 8.0)))
    app.world.spawn(DirectionalLight(illuminance=1.0),
                    *transform_bundle(rotation=(-0.38, 0.0, 0.0, 0.92)))
    # opaque white backdrop
    app.world.spawn(Mesh3d(mesh=cube),
                    MeshMaterial(base_color=(0.9, 0.9, 0.9, 1.0)),
                    *transform_bundle(translation=(0.0, 0.0, -2.0),
                                      scale=(10.0, 8.0, 0.5)))
    for color, z in panes:
        app.world.spawn(Mesh3d(mesh=cube),
                        MeshMaterial(base_color=color),
                        *transform_bundle(translation=(0.0, 0.0, z),
                                          scale=(3.0, 2.0, 0.1)))
    app.update(dt=1 / 60)
    return frame_image(app).astype(int)


def test_transparent_pane_tints_backdrop():
    base = _scene([])
    tinted = _scene([((1.0, 0.1, 0.1, 0.5), 2.0)])
    c0 = base[48, 80]
    c1 = tinted[48, 80]
    # red-tinted but backdrop still visible (not fully red, not unchanged)
    assert c1[0] >= c0[0] - 10
    assert c1[1] < c0[1] - 25, (c0, c1)
    assert c1[1] > 40
    # outside the pane: unchanged
    assert np.abs(base[10, 10].astype(int) - tinted[10, 10].astype(int)).max() <= 3


def test_oit_order_independent():
    a = _scene([((1.0, 0.1, 0.1, 0.5), 2.0), ((0.1, 0.1, 1.0, 0.5), 3.0)])
    b = _scene([((0.1, 0.1, 1.0, 0.5), 3.0), ((1.0, 0.1, 0.1, 0.5), 2.0)])
    assert np.abs(a - b).max() <= 2, "submission order changed the image"


def test_transparent_behind_opaque_hidden():
    """A pane behind the opaque backdrop must not show."""
    base = _scene([])
    hidden = _scene([((1.0, 0.1, 0.1, 0.9), -5.0)])
    assert np.abs(base - hidden).max() <= 2
