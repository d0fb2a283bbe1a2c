"""Volumetric transmission (ref model: StandardMaterial thickness /
attenuation_distance / attenuation_color — Beer-Lambert absorption of
the transmitted background — and diffuse_transmission, back-lit
flipped-normal translucency)."""

import numpy as np

from bevy_tpu import App
from bevy_tpu.render import RenderPlugin
from bevy_tpu.render.camera import Camera3d
from bevy_tpu.render.mesh import cuboid
from bevy_tpu.render.mesh3d import (
    AmbientLight, DirectionalLight, Mesh3d, MeshMaterial, Mesh3dPlugin,
)
from bevy_tpu.render.plugin import frame_image
from bevy_tpu.render.transmission import TransmissionPlugin
from bevy_tpu.time import TimePlugin
from bevy_tpu.transform import TransformPlugin, transform_bundle


def _glass_scene(**mat):
    app = App(capacity=32)
    plugin = Mesh3dPlugin(backend="pallas_interpret")
    cube = plugin.add_mesh(cuboid(1.0, 1.0, 1.0))
    app.add_plugins(TimePlugin(), TransformPlugin(),
                    RenderPlugin(width=160, height=96), plugin,
                    TransmissionPlugin(plugin, backend="pallas_interpret"))
    app.insert_resource(AmbientLight(brightness=0.25))
    app.world.spawn(Camera3d(), *transform_bundle(translation=(0, 0, 5)))
    app.world.spawn(DirectionalLight(illuminance=1.0),
                    *transform_bundle(rotation=(-0.3, 0.2, 0.0, 0.93)))
    # bright white wall behind
    app.world.spawn(Mesh3d(mesh=cube),
                    MeshMaterial(base_color=(0.9, 0.9, 0.9, 1.0),
                                 emissive=(0.5, 0.5, 0.5)),
                    *transform_bundle(translation=(0.0, 0.0, -2.0),
                                      scale=(8.0, 5.0, 0.2)))
    app.world.spawn(
        Mesh3d(mesh=cube),
        MeshMaterial(base_color=(1.0, 1.0, 1.0, 1.0),
                     specular_transmission=1.0,
                     perceptual_roughness=0.05, ior=1.5, **mat),
        *transform_bundle(translation=(0.0, 0.0, 1.0),
                          scale=(2.0, 2.0, 0.1)))
    app.update(dt=1 / 60)
    return frame_image(app).astype(float)


def test_attenuation_tints_transmission():
    """A thick absorbing volume with green attenuation_color must turn
    the white background green through the glass (Beer-Lambert), while
    attenuation_distance == 0 (off) keeps it neutral."""
    clear = _glass_scene()
    tinted = _glass_scene(thickness=2.0, attenuation_distance=1.0,
                          attenuation_color=(0.2, 1.0, 0.2))
    cy, cx = 48, 80
    # clear glass: near-neutral center
    assert abs(clear[cy, cx, 1] - clear[cy, cx, 0]) < 25, clear[cy, cx]
    # attenuated: green strongly dominates red
    assert tinted[cy, cx, 1] > tinted[cy, cx, 0] + 40, tinted[cy, cx]


def test_diffuse_transmission_backlight():
    """A translucent (diffuse_transmission=1) panel lit ONLY from behind
    reads brighter than an opaque one (flipped-normal Lambert)."""

    def scene(dtw):
        app = App(capacity=32)
        plugin = Mesh3dPlugin(backend="pallas_interpret")
        cube = plugin.add_mesh(cuboid(1.0, 1.0, 1.0))
        app.add_plugins(TimePlugin(), TransformPlugin(),
                        RenderPlugin(width=128, height=96), plugin,
                        TransmissionPlugin(plugin,
                                           backend="pallas_interpret"))
        app.insert_resource(AmbientLight(brightness=0.02))
        app.world.spawn(Camera3d(), *transform_bundle(translation=(0, 0, 4)))
        # light shining toward the camera (from behind the panel):
        # forward is -z rotated by 180deg about y => +z direction
        app.world.spawn(DirectionalLight(illuminance=3.0),
                        *transform_bundle(rotation=(0.0, 1.0, 0.0, 0.0)))
        app.world.spawn(
            Mesh3d(mesh=cube),
            MeshMaterial(base_color=(0.9, 0.85, 0.7, 1.0),
                         diffuse_transmission=dtw),
            *transform_bundle(translation=(0.0, 0.0, 0.0),
                              scale=(2.0, 2.0, 0.1)))
        app.update(dt=1 / 60)
        return frame_image(app).astype(float)

    lit = scene(1.0)
    dark = scene(0.0)
    cy, cx = 48, 64
    assert lit[cy, cx, :3].sum() > dark[cy, cx, :3].sum() + 60, \
        (lit[cy, cx], dark[cy, cx])
