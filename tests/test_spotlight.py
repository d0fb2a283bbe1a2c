"""Spot light tests (ref model: bevy_light SpotLight cone attenuation)."""

import numpy as np

from bevy_tpu import App
from bevy_tpu.render import RenderPlugin
from bevy_tpu.render.camera import Camera3d
from bevy_tpu.render.deferred import DeferredLightingPlugin, SpotLight
from bevy_tpu.render.mesh import cuboid
from bevy_tpu.render.mesh3d import (
    AmbientLight, DirectionalLight, Mesh3d, MeshMaterial, Mesh3dPlugin,
)
from bevy_tpu.render.plugin import frame_image
from bevy_tpu.time import TimePlugin
from bevy_tpu.transform import TransformPlugin, transform_bundle


def _floor_scene(outer_angle):
    app = App(capacity=32)
    plugin = Mesh3dPlugin(backend="pallas_interpret", deferred=True)
    cube = plugin.add_mesh(cuboid(1.0, 1.0, 1.0))
    app.add_plugins(TimePlugin(), TransformPlugin(),
                    RenderPlugin(width=160, height=96), plugin,
                    DeferredLightingPlugin(backend="pallas_interpret"))
    app.insert_resource(AmbientLight(brightness=0.02))
    app.world.spawn(Camera3d(), *transform_bundle(
        translation=(0.0, 6.0, 0.01),
        rotation=(-0.7071, 0.0, 0.0, 0.7071)))   # looking straight down
    app.world.spawn(DirectionalLight(illuminance=0.0), *transform_bundle())
    # flattened cube as floor
    app.world.spawn(Mesh3d(mesh=cube),
                    MeshMaterial(base_color=(0.8, 0.8, 0.8, 1.0)),
                    *transform_bundle(translation=(0.0, -0.5, 0.0),
                                      scale=(30.0, 1.0, 30.0)))
    # spot pointing straight down from above the floor
    app.world.spawn(
        SpotLight(color=(1.0, 0.2, 0.2), intensity=6.0, range=10.0,
                  inner_angle=outer_angle * 0.7, outer_angle=outer_angle),
        *transform_bundle(translation=(0.0, 3.0, 0.0),
                          rotation=(-0.7071, 0.0, 0.0, 0.7071)))
    app.update(dt=1 / 60)
    return frame_image(app).astype(int)


def _lit_count(img):
    return int(((img[..., 0] - img[..., 2]) > 30).sum())


def test_spot_cone_limits_pool():
    narrow = _lit_count(_floor_scene(0.25))
    wide = _lit_count(_floor_scene(0.9))
    assert narrow > 5, "narrow cone lit nothing"
    assert wide > narrow * 1.5, (narrow, wide)


def test_spot_does_not_light_behind():
    img = _floor_scene(0.4)
    h, w = img.shape[:2]
    # pool centered under the light (screen center); corners stay unlit
    center = img[h // 2, w // 2]
    corner = img[5, 5]
    assert center[0] > corner[0] + 30, (center.tolist(), corner.tolist())
