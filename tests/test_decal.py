"""Decals (ref model: bevy_pbr clustered decals — a box projector stamps
color onto intersecting surfaces only)."""

import numpy as np

from bevy_tpu import App
from bevy_tpu.render import RenderPlugin
from bevy_tpu.render.camera import Camera3d
from bevy_tpu.render.decal import Decal, DecalPlugin
from bevy_tpu.render.deferred import DeferredLightingPlugin
from bevy_tpu.render.mesh import cuboid
from bevy_tpu.render.mesh3d import (
    AmbientLight, DirectionalLight, Mesh3d, MeshMaterial, Mesh3dPlugin,
)
from bevy_tpu.render.plugin import frame_image
from bevy_tpu.time import TimePlugin
from bevy_tpu.transform import TransformPlugin, transform_bundle


def _scene(with_decal):
    app = App(capacity=32)
    plugin = Mesh3dPlugin(backend="pallas_interpret", deferred=True)
    cube = plugin.add_mesh(cuboid(1.0, 1.0, 1.0))
    app.add_plugins(TimePlugin(), TransformPlugin(),
                    RenderPlugin(width=160, height=96), plugin,
                    DecalPlugin(),
                    DeferredLightingPlugin(backend="pallas_interpret"))
    app.insert_resource(AmbientLight(brightness=0.3))
    app.world.spawn(Mesh3d(mesh=cube),
                    MeshMaterial(base_color=(0.8, 0.8, 0.8, 1.0)),
                    *transform_bundle(translation=(0.0, -0.55, 0.0),
                                      scale=(12.0, 0.1, 12.0)))
    if with_decal:
        app.world.spawn(Decal(color=(1.0, 0.1, 0.1, 0.9)),
                        *transform_bundle(translation=(0.0, -0.4, -2.0),
                                          scale=(2.0, 1.0, 2.0)))
    app.world.spawn(DirectionalLight(illuminance=0.8),
                    *transform_bundle(rotation=(-0.38, 0.0, 0.0, 0.92)))
    app.world.spawn(Camera3d(), *transform_bundle(
        translation=(0.0, 4.0, 3.0), rotation=(-0.42, 0.0, 0.0, 0.91)))
    app.update(dt=1 / 60)
    return frame_image(app).astype(int)


def test_decal_stamps_floor():
    plain = _scene(False)
    stamped = _scene(True)
    dr = stamped[..., 0].astype(int) - stamped[..., 1].astype(int)
    # a red patch appears somewhere on the floor
    assert (dr > 40).sum() > 30, (dr > 40).sum()
    # and it's localized: most of the floor is unchanged
    changed = np.abs(stamped - plain).max(-1) > 20
    assert 0 < changed.mean() < 0.5
