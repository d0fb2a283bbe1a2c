"""Irradiance volumes (ref model: bevy_pbr light_probe
irradiance_volume.rs — position-varying baked ambient cubes)."""

import numpy as np

from bevy_tpu import App
from bevy_tpu.render import RenderPlugin
from bevy_tpu.render.camera import Camera3d
from bevy_tpu.render.deferred import DeferredLightingPlugin, PointLight
from bevy_tpu.render.irradiance import IrradianceVolumePlugin
from bevy_tpu.render.mesh import cuboid
from bevy_tpu.render.mesh3d import (
    AmbientLight, Mesh3d, MeshMaterial, Mesh3dPlugin,
)
from bevy_tpu.render.plugin import frame_image
from bevy_tpu.time import TimePlugin
from bevy_tpu.transform import TransformPlugin, transform_bundle


def _render(with_volume):
    app = App(capacity=16)
    plugin = Mesh3dPlugin(backend="pallas_interpret", deferred=True)
    cube = plugin.add_mesh(cuboid(1.0, 1.0, 1.0))
    plugins = [TimePlugin(), TransformPlugin(),
               RenderPlugin(width=96, height=72), plugin,
               DeferredLightingPlugin(backend="pallas_interpret")]
    if with_volume:
        # 2x1x1 grid: red irradiance on the -x cell, green on +x, on
        # every axis face (so any normal picks it up)
        vox = np.zeros((2, 1, 1, 6, 3), np.float32)
        vox[0, ..., :, 0] = 2.0          # left: red
        vox[1, ..., :, 1] = 2.0          # right: green
        plugins.append(IrradianceVolumePlugin(
            vox, min_corner=(-4.0, -2.0, -4.0), max_corner=(4.0, 2.0, 4.0)))
    app.add_plugins(*plugins)
    app.insert_resource(AmbientLight(brightness=0.1))
    app.world.spawn(Camera3d(),
                    *transform_bundle(translation=(0.0, 1.5, 5.0),
                                      rotation=(-0.15, 0.0, 0.0, 0.989)))
    app.world.spawn(PointLight(intensity=1.5, range=30.0),
                    *transform_bundle(translation=(0.0, 3.0, 3.0)))
    # a wide white floor slab crossing both volume cells
    app.world.spawn(Mesh3d(mesh=cube),
                    MeshMaterial(base_color=(0.8, 0.8, 0.8, 1.0),
                                 perceptual_roughness=0.9),
                    *transform_bundle(translation=(0.0, -0.2, 0.0),
                                      scale=(7.0, 0.4, 6.0)))
    app.update(dt=1 / 60)
    return frame_image(app).astype(int)


def test_volume_adds_position_varying_irradiance():
    base = _render(False)
    lit = _render(True)
    h, w = base.shape[:2]
    row = int(h * 0.75)                   # on the floor
    left = lit[row, w // 4]
    right = lit[row, 3 * w // 4]
    # left floor tints red, right tints green
    assert left[0] > left[1] + 20, left
    assert right[1] > right[0] + 20, right
    # and both gained energy vs the volume-less render
    assert left[0] > base[row, w // 4][0] + 15
    assert right[1] > base[row, 3 * w // 4][1] + 15


def test_outside_volume_unchanged():
    """Pixels whose world position is outside the AABB take nothing:
    shrink the volume to a box behind the camera and compare."""
    app_imgs = []
    for corners in (((-50, -50, -50), (-40, -40, -40)),):
        app = App(capacity=16)
        plugin = Mesh3dPlugin(backend="pallas_interpret", deferred=True)
        cube = plugin.add_mesh(cuboid(1.0, 1.0, 1.0))
        vox = np.full((1, 1, 1, 6, 3), 5.0, np.float32)
        app.add_plugins(TimePlugin(), TransformPlugin(),
                        RenderPlugin(width=64, height=48), plugin,
                        DeferredLightingPlugin(
                            backend="pallas_interpret"),
                        IrradianceVolumePlugin(vox, *corners))
        app.insert_resource(AmbientLight(brightness=0.1))
        app.world.spawn(Camera3d(),
                        *transform_bundle(translation=(0.0, 1.5, 5.0)))
        app.world.spawn(PointLight(intensity=1.5, range=30.0),
                        *transform_bundle(translation=(0.0, 3.0, 3.0)))
        app.world.spawn(Mesh3d(mesh=cube),
                        MeshMaterial(base_color=(0.8, 0.8, 0.8, 1.0)),
                        *transform_bundle(translation=(0.0, 0.0, 0.0),
                                          scale=(4.0, 0.4, 4.0)))
        app.update(dt=1 / 60)
        app_imgs.append(frame_image(app).astype(int))
    img = app_imgs[0]
    # the 5.0 white volume is far away: nothing may glow
    assert img[..., :3].max() < 240, img[..., :3].max()
