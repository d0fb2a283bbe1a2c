"""Lightmaps (ref model: bevy_pbr/src/lightmap — a per-instance atlas
rect adds baked light modulated by albedo)."""

import numpy as np

from bevy_tpu import App
from bevy_tpu.render import RenderPlugin
from bevy_tpu.render.camera import Camera3d
from bevy_tpu.render.mesh import cuboid
from bevy_tpu.render.mesh3d import (
    AmbientLight, DirectionalLight, Mesh3d, MeshMaterial, Mesh3dPlugin,
)
from bevy_tpu.render.plugin import frame_image
from bevy_tpu.render.texture import AtlasBuilder
from bevy_tpu.time import TimePlugin
from bevy_tpu.transform import TransformPlugin, transform_bundle


def _render(with_lightmap):
    atlas = AtlasBuilder(128, 128)
    # baked light: bright warm left half, dark right half
    lm = np.zeros((16, 16, 4), np.float32)
    lm[:, :8] = (2.0, 1.6, 0.8, 1.0)
    lm[:, 8:] = (0.0, 0.0, 0.2, 1.0)
    h = atlas.add(lm, srgb=False)
    app = App(capacity=16)
    plugin = Mesh3dPlugin(atlas=atlas, backend="pallas_interpret")
    cube = plugin.add_mesh(cuboid(1.0, 1.0, 1.0))
    app.add_plugins(TimePlugin(), TransformPlugin(),
                    RenderPlugin(width=128, height=96), plugin)
    app.insert_resource(AmbientLight(brightness=0.05))
    kw = dict(lm_min=h["uv_min"], lm_max=h["uv_max"]) if with_lightmap \
        else {}
    app.world.spawn(Mesh3d(mesh=cube),
                    MeshMaterial(base_color=(0.8, 0.8, 0.8, 1.0), **kw),
                    *transform_bundle())
    app.world.spawn(DirectionalLight(illuminance=0.2),
                    *transform_bundle(rotation=(-0.38, 0.0, 0.0, 0.92)))
    app.world.spawn(Camera3d(), *transform_bundle(translation=(0, 0, 2.2)))
    app.update(dt=1 / 60)
    return frame_image(app).astype(int)


def test_lightmap_adds_baked_light():
    base = _render(False)
    lit = _render(True)
    cov = np.abs(lit - lit[0, 0]).max(-1) > 10
    ys, xs = np.where(cov)
    cy, cx = int(ys.mean()), int(xs.mean())
    left = lit[cy, cx - 10][:3].sum()
    right = lit[cy, cx + 10][:3].sum()
    # baked-light split across the face; unlit render is uniform
    assert left > right + 60, (left, right)
    bl = base[cy, cx - 10][:3].sum()
    br = base[cy, cx + 10][:3].sum()
    assert abs(int(bl) - int(br)) < 25, (bl, br)
    assert left > bl + 40          # brighter than the unmapped render
