"""Parallax occlusion mapping (ref model: StandardMaterial
parallax_depth_scale / depth_map / max_parallax_layer_count +
bevy_pbr/src/render/parallax_mapping.wesl parallaxed_uv — layer march
with a secant refinement at the depth crossing)."""

import numpy as np

from bevy_tpu import App
from bevy_tpu.render import RenderPlugin
from bevy_tpu.render.camera import Camera3d
from bevy_tpu.render.mesh import plane
from bevy_tpu.render.mesh3d import (
    AmbientLight, DirectionalLight, Mesh3d, MeshMaterial, Mesh3dPlugin,
)
from bevy_tpu.render.plugin import frame_image
from bevy_tpu.render.texture import AtlasBuilder, checkerboard
from bevy_tpu.time import TimePlugin
from bevy_tpu.transform import TransformPlugin, transform_bundle


def _render(scale, rot=(-0.26, 0.0, 0.0, 0.966)):
    """A checkerboard plane with a step depth map, viewed obliquely."""
    atlas = AtlasBuilder(128, 128)
    tex = atlas.add(checkerboard(64, 8), srgb=False)
    # step depth map: left half deep (1), right half at the surface (0)
    dm = np.zeros((64, 64, 4), np.float32)
    dm[:, :32, 0] = 1.0
    dmap = atlas.add(dm, srgb=False)

    app = App(capacity=16)
    plugin = Mesh3dPlugin(backend="pallas_interpret", atlas=atlas,
                          parallax_layers=8)
    mesh = plugin.add_mesh(plane(2.0, 2.0))
    app.add_plugins(TimePlugin(), TransformPlugin(),
                    RenderPlugin(width=128, height=96), plugin)
    app.insert_resource(AmbientLight(brightness=0.35))
    app.world.spawn(Camera3d(), *transform_bundle(translation=(0, 1.2, 2.2),
                                                  rotation=rot))
    app.world.spawn(DirectionalLight(illuminance=2.0),
                    *transform_bundle(rotation=(-0.5, 0.2, 0.0, 0.84)))
    app.world.spawn(
        Mesh3d(mesh=mesh),
        MeshMaterial(base_color=(1.0, 1.0, 1.0, 1.0),
                     uv_min=tex["uv_min"], uv_max=tex["uv_max"],
                     dm_min=dmap["uv_min"], dm_max=dmap["uv_max"],
                     parallax_depth_scale=scale),
        *transform_bundle())
    app.update(dt=1 / 60)
    return frame_image(app).astype(float)


def test_parallax_shifts_texture():
    """Nonzero parallax_depth_scale must shift the sampled texels of the
    deep half (view-dependent offset), leaving the scale=0 render
    different on many pixels."""
    base = _render(0.0)
    pom = _render(0.12)
    diff = np.abs(pom - base)[..., :3].max(-1)
    assert (diff > 20).sum() > 40, (diff > 20).sum()


def test_parallax_zero_scale_is_identity():
    """scale == 0 disables POM per-material (rect present but pscale 0 —
    has_pom gate) so two renders agree exactly."""
    a = _render(0.0)
    b = _render(0.0)
    assert np.abs(a - b).max() == 0.0
