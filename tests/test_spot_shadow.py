"""Spot-light shadows (ref model: the spot shadow views of
bevy_pbr/src/render/light.rs — an occluder blocks the cone's light)."""

import numpy as np

from bevy_tpu import App
from bevy_tpu.render import RenderPlugin
from bevy_tpu.render.camera import Camera3d
from bevy_tpu.render.deferred import DeferredLightingPlugin, SpotLight
from bevy_tpu.render.mesh import cuboid
from bevy_tpu.render.mesh3d import (
    AmbientLight, Mesh3d, MeshMaterial, Mesh3dPlugin,
)
from bevy_tpu.render.plugin import frame_image
from bevy_tpu.render.spot_shadow import SpotShadowPlugin
from bevy_tpu.time import TimePlugin
from bevy_tpu.transform import TransformPlugin, transform_bundle


def _scene(with_occluder, shadows=True):
    app = App(capacity=32)
    plugin = Mesh3dPlugin(backend="pallas_interpret", deferred=True)
    cube = plugin.add_mesh(cuboid(1.0, 1.0, 1.0))
    plugins = [TimePlugin(), TransformPlugin(),
               RenderPlugin(width=160, height=96), plugin,
               DeferredLightingPlugin(backend="pallas_interpret"),
               SpotShadowPlugin(plugin, size=256,
                                backend="pallas_interpret")]
    app.add_plugins(*plugins)
    app.insert_resource(AmbientLight(brightness=0.03))
    # camera looking down at the floor
    app.world.spawn(Camera3d(), *transform_bundle(
        translation=(0.0, 8.0, 0.01),
        rotation=(-0.7071, 0.0, 0.0, 0.7071)))
    # spot light above, pointing straight down
    app.world.spawn(SpotLight(intensity=60.0, range=30.0,
                              inner_angle=0.5, outer_angle=0.8,
                              shadows=int(shadows)),
                    *transform_bundle(
                        translation=(0.0, 6.0, 0.0),
                        rotation=(-0.7071, 0.0, 0.0, 0.7071)))
    # floor
    app.world.spawn(Mesh3d(mesh=cube),
                    MeshMaterial(base_color=(0.8, 0.8, 0.8, 1.0)),
                    *transform_bundle(translation=(0.0, -0.5, 0.0),
                                      scale=(16.0, 1.0, 16.0)))
    if with_occluder:
        app.world.spawn(Mesh3d(mesh=cube),
                        MeshMaterial(base_color=(0.8, 0.2, 0.2, 1.0)),
                        *transform_bundle(translation=(0.0, 2.0, 0.0)))
    app.update(dt=1 / 60)
    return frame_image(app).astype(int)


def test_spot_lights_floor():
    img = _scene(False)
    # lit pool in the middle of the floor, darker at the edges
    c = img[48, 80][:3].sum()
    e = img[48, 8][:3].sum()
    assert c > e + 60, (c, e)


def test_spot_occluder_shadows():
    lit = _scene(False)
    occ = _scene(True)
    # the occluder blocks the center: darker under it (ignore the
    # occluder's own lit top by comparing an off-center floor ring)
    diff = lit[..., :3].sum(-1) - occ[..., :3].sum(-1)
    assert diff.max() > 60, diff.max()
