"""StandardMaterial depth_bias + uv_transform (ref:
bevy_pbr/src/pbr_material.rs — depth_bias render-order offset,
uv_transform Affine2 on mesh UVs)."""

import numpy as np

from bevy_tpu import App
from bevy_tpu.render import RenderPlugin
from bevy_tpu.render.camera import Camera3d
from bevy_tpu.render.mesh import plane
from bevy_tpu.render.mesh3d import (
    AmbientLight, DirectionalLight, Mesh3d, MeshMaterial, Mesh3dPlugin,
)
from bevy_tpu.render.plugin import frame_image
from bevy_tpu.time import TimePlugin
from bevy_tpu.transform import TransformPlugin, transform_bundle

ROT_UP = (np.sin(np.pi / 4), 0.0, 0.0, np.cos(np.pi / 4))  # plane faces +z


def _app(plugin, w=128, h=96):
    app = App(capacity=16)
    app.add_plugins(TimePlugin(), TransformPlugin(),
                    RenderPlugin(width=w, height=h), plugin)
    app.insert_resource(AmbientLight(brightness=0.8))
    app.world.spawn(Camera3d(), *transform_bundle(translation=(0, 0, 4)))
    app.world.spawn(DirectionalLight(illuminance=0.3),
                    *transform_bundle(rotation=(-0.3, 0.2, 0.0, 0.93)))
    return app


def _coplanar(bias_green):
    plugin = Mesh3dPlugin(backend="pallas_interpret")
    quad = plugin.add_mesh(plane(2.0, 2.0))
    app = _app(plugin)
    # two EXACTLY coplanar quads: red first, green with optional bias
    app.world.spawn(Mesh3d(mesh=quad),
                    MeshMaterial(base_color=(1.0, 0.1, 0.1, 1.0)),
                    *transform_bundle(rotation=ROT_UP))
    app.world.spawn(Mesh3d(mesh=quad),
                    MeshMaterial(base_color=(0.1, 1.0, 0.1, 1.0),
                                 depth_bias=bias_green),
                    *transform_bundle(rotation=ROT_UP))
    app.update(dt=1 / 60)
    img = frame_image(app).astype(int)
    return img[48, 64]   # center pixel


def test_depth_bias_orders_coplanar_surfaces():
    biased = _coplanar(bias_green=1.0)
    assert biased[1] > biased[0] + 40, biased          # green wins
    debiased = _coplanar(bias_green=-1.0)
    assert debiased[0] > debiased[1] + 40, debiased    # red wins


def test_uv_transform_shifts_texture():
    """A half-red/half-blue texture on a quad: the identity transform
    shows red on the left; a [-1 flip + translate] transform mirrors
    it (ref: StandardMaterial::FLIP_HORIZONTAL semantics)."""
    def render(uvt):
        from bevy_tpu.render.texture import AtlasBuilder
        atlas = AtlasBuilder(16, 16)
        tex = np.zeros((8, 8, 4), np.uint8)
        tex[:, :4] = (255, 30, 30, 255)
        tex[:, 4:] = (30, 30, 255, 255)
        h = atlas.add(tex)
        plugin = Mesh3dPlugin(backend="pallas_interpret", atlas=atlas)
        quad = plugin.add_mesh(plane(2.5, 2.5))
        app = _app(plugin)
        app.world.spawn(
            Mesh3d(mesh=quad),
            MeshMaterial(base_color=(1.0, 1.0, 1.0, 1.0),
                         uv_min=h["uv_min"], uv_max=h["uv_max"],
                         uv_transform=uvt),
            *transform_bundle(rotation=ROT_UP))
        app.update(dt=1 / 60)
        return frame_image(app).astype(int)

    ident = render((1.0, 0.0, 0.0, 1.0, 0.0, 0.0))
    l, r = ident[48, 40], ident[48, 88]
    # one half red, the other blue (orientation depends on the mesher's
    # uv layout — just demand they differ)
    assert abs(int(l[0]) - int(r[0])) > 60, (l, r)
    flipped = render((-1.0, 0.0, 0.0, 1.0, 1.0, 0.0))
    fl, fr = flipped[48, 40], flipped[48, 88]
    assert fl[0] != l[0] or fr[0] != r[0]
    # mirrored: the red side swapped
    assert (l[0] > r[0]) != (fl[0] > fr[0]), (l, r, fl, fr)
