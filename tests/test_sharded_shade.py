"""Row-band sharded deferred shade (VERDICT r2 #5): the 8-device mesh
shade must be image-identical to the single-device kernel — global ray
reconstruction via the params[34] row offset."""

import numpy as np
import pytest

from bevy_tpu import App
from bevy_tpu.render import RenderPlugin
from bevy_tpu.render.camera import Camera3d
from bevy_tpu.render.deferred import DeferredLightingPlugin, PointLight
from bevy_tpu.render.mesh import cuboid
from bevy_tpu.render.mesh3d import (
    AmbientLight, DirectionalLight, Mesh3d, MeshMaterial, Mesh3dPlugin,
)
from bevy_tpu.render.plugin import frame_image
from bevy_tpu.time import TimePlugin
from bevy_tpu.transform import TransformPlugin, transform_bundle


def _scene(shards):
    app = App(capacity=64)
    plugin = Mesh3dPlugin(backend="pallas_interpret", deferred=True)
    cube = plugin.add_mesh(cuboid(1.0, 1.0, 1.0))
    app.add_plugins(TimePlugin(), TransformPlugin(),
                    RenderPlugin(width=256, height=160), plugin,
                    DeferredLightingPlugin(backend="pallas_interpret",
                                           shards=shards))
    app.insert_resource(AmbientLight(brightness=0.1))
    app.world.spawn(Mesh3d(mesh=cube),
                    MeshMaterial(base_color=(0.8, 0.8, 0.8, 1.0)),
                    *transform_bundle(translation=(0.0, -0.55, -4.0),
                                      scale=(12.0, 0.1, 12.0)))
    for i in range(4):
        app.world.spawn(Mesh3d(mesh=cube),
                        MeshMaterial(base_color=(0.7, 0.4, 0.3, 1.0)),
                        *transform_bundle(
                            translation=(-3.0 + 2.0 * i, 0.0, -5.0)))
    for i in range(6):
        app.world.spawn(
            PointLight(color=(1.0, 0.6 + 0.05 * i, 0.3), intensity=2.0,
                       range=6.0),
            *transform_bundle(translation=(-4.0 + 1.6 * i, 1.5, -4.0)))
    app.world.spawn(DirectionalLight(illuminance=0.4),
                    *transform_bundle(rotation=(-0.38, 0.0, 0.0, 0.92)))
    app.world.spawn(Camera3d(), *transform_bundle(
        translation=(0.0, 2.5, 2.0), rotation=(-0.3, 0.0, 0.0, 0.954)))
    app.update(dt=1 / 60)
    return frame_image(app)


def test_sharded_shade_image_identical():
    import jax
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device CPU mesh")
    ref = _scene(None)
    sharded = _scene(8)
    assert ref.shape == sharded.shape
    diff = np.abs(ref.astype(int) - sharded.astype(int))
    assert diff.max() == 0, f"max diff {diff.max()}"
