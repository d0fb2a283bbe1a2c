"""Screen-space reflections (ref model: bevy_pbr ssr — a smooth floor
mirrors a bright cube above it)."""

import numpy as np

from bevy_tpu import App
from bevy_tpu.render import RenderPlugin
from bevy_tpu.render.camera import Camera3d
from bevy_tpu.render.deferred import DeferredLightingPlugin
from bevy_tpu.render.mesh import cuboid
from bevy_tpu.render.mesh3d import (
    AmbientLight, DirectionalLight, Mesh3d, MeshMaterial, Mesh3dPlugin,
)
from bevy_tpu.render.plugin import frame_image
from bevy_tpu.render.ssr import SsrPlugin
from bevy_tpu.time import TimePlugin
from bevy_tpu.transform import TransformPlugin, transform_bundle


def _scene(ssr):
    app = App(capacity=32)
    plugin = Mesh3dPlugin(backend="pallas_interpret", deferred=True)
    cube = plugin.add_mesh(cuboid(1.0, 1.0, 1.0))
    plugins = [TimePlugin(), TransformPlugin(),
               RenderPlugin(width=160, height=120), plugin,
               DeferredLightingPlugin(backend="pallas_interpret")]
    if ssr:
        plugins.append(SsrPlugin(steps=24, stride=0.6, thickness=0.8,
                                 max_roughness=0.6))
    app.add_plugins(*plugins)
    app.insert_resource(AmbientLight(brightness=0.1))
    # smooth metallic floor
    app.world.spawn(Mesh3d(mesh=cube),
                    MeshMaterial(base_color=(0.9, 0.9, 0.9, 1.0),
                                 metallic=1.0, perceptual_roughness=0.05),
                    *transform_bundle(translation=(0.0, -0.55, 0.0),
                                      scale=(12.0, 0.1, 12.0)))
    # bright red emissive cube floating above
    app.world.spawn(Mesh3d(mesh=cube),
                    MeshMaterial(base_color=(1.0, 0.1, 0.1, 1.0),
                                 emissive=(3.0, 0.2, 0.2),
                                 perceptual_roughness=0.9),
                    *transform_bundle(translation=(0.0, 1.0, -2.0)))
    app.world.spawn(DirectionalLight(illuminance=0.6),
                    *transform_bundle(rotation=(-0.38, 0.0, 0.0, 0.92)))
    app.world.spawn(Camera3d(), *transform_bundle(
        translation=(0.0, 1.6, 4.0), rotation=(-0.13, 0.0, 0.0, 0.99)))
    app.update(dt=1 / 60)
    return frame_image(app).astype(int)


def test_ssr_reflects_emissive_cube_on_floor():
    off = _scene(False)
    on = _scene(True)
    # the floor region below the cube picks up red (the reflection)
    diff_r = on[..., 0].astype(int) - off[..., 0].astype(int)
    floor = diff_r[70:115]            # lower half = floor
    assert floor.max() > 25, floor.max()
    # background sky pixels unchanged
    assert abs(int(on[5, 5, 0]) - int(off[5, 5, 0])) <= 3
