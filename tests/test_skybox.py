"""Skybox (ref model: bevy_core_pipeline skybox — background-only draw,
geometry occludes the sky)."""

import numpy as np

from bevy_tpu import App
from bevy_tpu.render import RenderPlugin
from bevy_tpu.render.camera import Camera3d
from bevy_tpu.render.mesh import cuboid
from bevy_tpu.render.mesh3d import (
    DirectionalLight, Mesh3d, MeshMaterial, Mesh3dPlugin,
)
from bevy_tpu.render.plugin import frame_image
from bevy_tpu.render.skybox import SkyboxPlugin
from bevy_tpu.time import TimePlugin
from bevy_tpu.transform import TransformPlugin, transform_bundle


def _app(**sky_kwargs):
    app = App(capacity=16)
    plugin = Mesh3dPlugin()
    cube = plugin.add_mesh(cuboid(1.0, 1.0, 1.0))
    app.add_plugins(TimePlugin(), TransformPlugin(),
                    RenderPlugin(width=160, height=120), plugin,
                    SkyboxPlugin(**sky_kwargs))
    # camera tilted up a little so the frame spans sky + ground
    app.world.spawn(Camera3d(), *transform_bundle(
        translation=(0.0, 1.0, 5.0)))
    app.world.spawn(DirectionalLight(illuminance=1.0),
                    *transform_bundle(rotation=(-0.38, 0.0, 0.0, 0.92)))
    app.world.spawn(Mesh3d(mesh=cube),
                    MeshMaterial(base_color=(0.6, 0.3, 0.3, 1.0)),
                    *transform_bundle(translation=(0.0, 1.0, 0.0)))
    app.update(dt=1 / 60)
    return frame_image(app)


def test_procedural_sky_fills_background():
    img = _app()
    # top rows: sky (blue dominant); cube center still renders (reddish)
    top = img[2, 80]
    assert top[2] > top[0], f"sky not blue-ish: {top}"
    mid = img[60, 80]
    assert mid[0] > mid[2], f"cube overwritten by sky: {mid}"
    # ground-colored lower half differs from the top sky
    assert abs(int(img[115, 80][2]) - int(top[2])) > 20


def test_equirect_environment():
    env = np.zeros((8, 16, 3), np.float32)
    env[:4] = (0.0, 1.0, 0.0)     # upper hemisphere green
    env[4:] = (1.0, 0.0, 1.0)     # lower magenta
    img = _app(environment=env)
    top = img[2, 80]
    assert top[1] > 100 and top[0] < 100, top
    bottom = img[118, 80]
    assert bottom[0] > 100 and bottom[2] > 100 and bottom[1] < 100, bottom
