"""Fog (ref models: bevy_pbr DistanceFog falloff; volumetric fog with
shadowed light shafts)."""

import numpy as np

from bevy_tpu import App
from bevy_tpu.render import RenderPlugin
from bevy_tpu.render.camera import Camera3d
from bevy_tpu.render.fog import DistanceFogPlugin, VolumetricFogPlugin
from bevy_tpu.render.mesh import cuboid
from bevy_tpu.render.mesh3d import (
    DirectionalLight, Mesh3d, MeshMaterial, Mesh3dPlugin,
)
from bevy_tpu.render.plugin import frame_image
from bevy_tpu.time import TimePlugin
from bevy_tpu.transform import TransformPlugin, transform_bundle


def _scene(*fog_plugins):
    app = App(capacity=16)
    plugin = Mesh3dPlugin()
    cube = plugin.add_mesh(cuboid(1.0, 1.0, 1.0))
    app.add_plugins(TimePlugin(), TransformPlugin(),
                    RenderPlugin(width=160, height=96), plugin,
                    *fog_plugins)
    for zp, x, col in ((-3.0, -1.0, (1.0, 0.2, 0.2, 1.0)),
                       (-25.0, 6.0, (0.2, 1.0, 0.2, 1.0))):
        app.world.spawn(Mesh3d(mesh=cube), MeshMaterial(base_color=col),
                        *transform_bundle(translation=(x, 0.0, zp),
                                          scale=(1.5, 1.5, 1.5)))
    app.world.spawn(DirectionalLight(illuminance=1.0),
                    *transform_bundle(rotation=(-0.38, 0.0, 0.0, 0.92)))
    app.world.spawn(Camera3d(), *transform_bundle(translation=(0, 0, 2)))
    app.update(dt=1 / 60)
    return frame_image(app).astype(int)


def _cube_pixels(img, chan):
    bg = img[0, 0].astype(int)
    cov = np.abs(img.astype(int) - bg).max(-1) > 12
    mask = cov & (img[..., chan] >= img.max(-1) - 1)
    return mask


def test_distance_fog_fades_far_geometry():
    clear = _scene()
    foggy = _scene(DistanceFogPlugin(density=0.05))
    # far (green) cube fades toward fog color much more than the near one
    diff = np.abs(clear.astype(int) - foggy.astype(int)).max(-1)
    green = clear[..., 1] > clear[..., 0] + 30
    red = clear[..., 0] > clear[..., 1] + 30
    assert diff[green].mean() > diff[red].mean() + 10
    assert np.isfinite(foggy).all()


def test_volumetric_fog_adds_scatter():
    clear = _scene()
    foggy = _scene(VolumetricFogPlugin(density=0.08, steps=8))
    # the whole frame gains in-scattered light
    assert foggy[..., :3].astype(int).mean() > \
        clear[..., :3].astype(int).mean() + 3
