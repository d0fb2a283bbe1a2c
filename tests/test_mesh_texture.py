"""Textured 3D materials (ref: StandardMaterial::base_color_texture +
ATTRIBUTE_UV_0 sampling of pbr shading)."""

import numpy as np

from bevy_tpu import App
from bevy_tpu.render import RenderPlugin
from bevy_tpu.render.camera import Camera3d
from bevy_tpu.render.mesh import cuboid
from bevy_tpu.render.mesh3d import (
    AmbientLight, DirectionalLight, Mesh3d, MeshMaterial, Mesh3dPlugin,
)
from bevy_tpu.render.plugin import frame_image
from bevy_tpu.render.texture import AtlasBuilder, checkerboard
from bevy_tpu.time import TimePlugin
from bevy_tpu.transform import TransformPlugin, transform_bundle


def _render(textured):
    app = App(capacity=16)
    atlas = AtlasBuilder(128, 128)
    # half red / half green texture: unmistakable spatial variation
    img = np.zeros((32, 32, 4), np.float32)
    img[:, :16] = (1.0, 0.05, 0.05, 1.0)
    img[:, 16:] = (0.05, 1.0, 0.05, 1.0)
    h = atlas.add(img, srgb=False)
    plugin = Mesh3dPlugin(atlas=atlas, backend="pallas_interpret")
    cube = plugin.add_mesh(cuboid(1.0, 1.0, 1.0))
    app.add_plugins(TimePlugin(), TransformPlugin(),
                    RenderPlugin(width=128, height=96), plugin)
    app.world.spawn(Camera3d(), *transform_bundle(translation=(0, 0, 2.2)))
    app.world.spawn(DirectionalLight(illuminance=1.0),
                    *transform_bundle(rotation=(-0.38, 0.0, 0.0, 0.92)))
    kw = dict(uv_min=h["uv_min"], uv_max=h["uv_max"]) if textured else {}
    app.world.spawn(Mesh3d(mesh=cube),
                    MeshMaterial(base_color=(1.0, 1.0, 1.0, 1.0), **kw),
                    *transform_bundle())
    app.update(dt=1 / 60)
    return frame_image(app)


def test_base_color_texture_samples():
    img = _render(textured=True)
    cov = img[..., :3].sum(-1) > 20
    assert cov.mean() > 0.05
    # left half of the front face red-ish, right half green-ish
    ys, xs = np.where(cov)
    cx = int(xs.mean())
    left = img[ys.mean().astype(int), cx - 10]
    right = img[ys.mean().astype(int), cx + 10]
    assert int(left[0]) > int(left[1]) + 30, left
    assert int(right[1]) > int(right[0]) + 30, right


def test_untextured_material_unchanged():
    img = _render(textured=False)
    cov = img[..., :3].sum(-1) > 20
    ys, xs = np.where(cov)
    c = img[int(ys.mean()), int(xs.mean())]
    # flat white-ish face: channels close together
    assert abs(int(c[0]) - int(c[1])) < 12 and abs(int(c[1]) - int(c[2])) < 12
