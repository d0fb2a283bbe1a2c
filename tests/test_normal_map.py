"""Normal mapping (ref model: StandardMaterial::normal_map_texture +
pbr_functions.wesl apply_normal_mapping — perturbed normals change the
lighting response across a flat face)."""

import numpy as np

from bevy_tpu import App
from bevy_tpu.render import RenderPlugin
from bevy_tpu.render.camera import Camera3d
from bevy_tpu.render.mesh import cuboid
from bevy_tpu.render.mesh3d import (
    DirectionalLight, Mesh3d, MeshMaterial, Mesh3dPlugin,
)
from bevy_tpu.render.plugin import frame_image
from bevy_tpu.render.texture import AtlasBuilder
from bevy_tpu.time import TimePlugin
from bevy_tpu.transform import TransformPlugin, transform_bundle


def _render(with_nm):
    atlas = AtlasBuilder(128, 128)
    white = atlas.add(np.full((4, 4, 4), 255, np.uint8))
    # normal map: left half tilts normals left, right half tilts right
    nm = np.zeros((16, 16, 4), np.uint8)
    nm[:, :8] = (40, 128, 230, 255)     # x ≈ -0.7
    nm[:, 8:] = (215, 128, 230, 255)    # x ≈ +0.7
    nm_h = atlas.add(nm, srgb=False)

    app = App(capacity=16)
    plugin = Mesh3dPlugin(atlas=atlas, backend="pallas_interpret")
    cube = plugin.add_mesh(cuboid(1.0, 1.0, 1.0))
    app.add_plugins(TimePlugin(), TransformPlugin(),
                    RenderPlugin(width=128, height=96), plugin)
    app.world.spawn(Camera3d(), *transform_bundle(translation=(0, 0, 2.2)))
    # light from the left so tilted normals split bright/dark
    app.world.spawn(DirectionalLight(illuminance=1.0),
                    *transform_bundle(rotation=(0.0, -0.3826834, 0.0,
                                                0.9238795)))
    kw = dict(uv_min=white["uv_min"], uv_max=white["uv_max"])
    if with_nm:
        kw.update(nm_min=nm_h["uv_min"], nm_max=nm_h["uv_max"])
    app.world.spawn(Mesh3d(mesh=cube),
                    MeshMaterial(base_color=(0.8, 0.8, 0.8, 1.0), **kw),
                    *transform_bundle())
    app.update(dt=1 / 60)
    return frame_image(app).astype(int)


def test_normal_map_splits_lighting():
    flat = _render(False)
    mapped = _render(True)
    cov = np.abs(mapped - mapped[0, 0]).max(-1) > 10
    ys, xs = np.where(cov)
    cx, cy = int(xs.mean()), int(ys.mean())
    left = mapped[cy, cx - 8][0]
    right = mapped[cy, cx + 8][0]
    # tilted normals: one half brighter than the other
    assert abs(int(left) - int(right)) > 15, (left, right)
    # the flat render has no such split
    fl = flat[cy, cx - 8][0]
    fr = flat[cy, cx + 8][0]
    assert abs(int(fl) - int(fr)) <= 6, (fl, fr)
