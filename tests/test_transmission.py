"""Specular transmission (ref model: StandardMaterial
specular_transmission + the screen-space Transmissive3d phase — a glass
panel shows a tinted, refracted view of what is behind it)."""

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


def _scene(with_glass, tint=(0.8, 0.9, 1.0, 1.0), st=1.0):
    app = App(capacity=32)
    plugin = Mesh3dPlugin(backend="pallas_interpret")
    cube = plugin.add_mesh(cuboid(1.0, 1.0, 1.0))
    app.add_plugins(TimePlugin(), TransformPlugin(),
                    RenderPlugin(width=160, height=96), plugin,
                    TransmissionPlugin(plugin,
                                       backend="pallas_interpret"))
    app.insert_resource(AmbientLight(brightness=0.25))
    app.world.spawn(Camera3d(), *transform_bundle(translation=(0, 0, 5)))
    app.world.spawn(DirectionalLight(illuminance=1.0),
                    *transform_bundle(rotation=(-0.3, 0.2, 0.0, 0.93)))
    # bright green wall behind
    app.world.spawn(Mesh3d(mesh=cube),
                    MeshMaterial(base_color=(0.1, 0.9, 0.1, 1.0),
                                 emissive=(0.0, 0.4, 0.0)),
                    *transform_bundle(translation=(0.0, 0.0, -2.0),
                                      scale=(8.0, 5.0, 0.2)))
    if with_glass:
        app.world.spawn(
            Mesh3d(mesh=cube),
            MeshMaterial(base_color=tint, specular_transmission=st,
                         perceptual_roughness=0.05, ior=1.5),
            *transform_bundle(translation=(0.0, 0.0, 1.0),
                              scale=(2.0, 2.0, 0.1)))
    app.update(dt=1 / 60)
    return frame_image(app).astype(float)


def test_glass_shows_background_through():
    bg = _scene(False)
    glass = _scene(True)
    # center: still green-dominated through the clear glass — the
    # background is visible, not replaced by the panel's own color
    cy, cx = 48, 80
    assert glass[cy, cx, 1] > glass[cy, cx, 0], glass[cy, cx]
    assert glass[cy, cx, 1] > 60
    # near-clear glass changes the image only slightly
    assert np.abs(glass[cy, cx] - bg[cy, cx]).max() < 60


def test_tinted_glass_filters_background():
    bg = _scene(False)
    red = _scene(True, tint=(1.0, 0.25, 0.25, 1.0))
    cy, cx = 48, 80
    # the red tint absorbs the wall's green
    assert red[cy, cx, 1] < bg[cy, cx, 1] - 40, (red[cy, cx], bg[cy, cx])
    # outside the panel the wall is untouched
    assert abs(red[10, 10, 1] - bg[10, 10, 1]) < 8


def test_opaque_material_not_transmissive():
    solid = _scene(True, tint=(0.2, 0.2, 0.8, 1.0), st=0.0)
    cy, cx = 48, 80
    # st=0 renders in the opaque phase: blue wall hides the green
    assert solid[cy, cx, 2] > solid[cy, cx, 1], solid[cy, cx]
