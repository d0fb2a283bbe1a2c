"""Environment-map lighting (ref model: EnvironmentMapLight — IBL
brightens geometry by environment color, split by normal direction)."""

import numpy as np

from bevy_tpu import App
from bevy_tpu.render import RenderPlugin
from bevy_tpu.render.camera import Camera3d
from bevy_tpu.render.deferred import DeferredLightingPlugin
from bevy_tpu.render.environment import (
    EnvironmentLightPlugin, prefilter_environment,
)
from bevy_tpu.render.mesh import cuboid
from bevy_tpu.render.mesh3d import (
    AmbientLight, DirectionalLight, Mesh3d, MeshMaterial, Mesh3dPlugin,
)
from bevy_tpu.render.plugin import frame_image
from bevy_tpu.time import TimePlugin
from bevy_tpu.transform import TransformPlugin, transform_bundle


def test_prefilter_irradiance_direction():
    env = np.zeros((16, 32, 3), np.float32)
    env[:8] = (0.0, 2.0, 0.0)          # green sky above
    env[8:] = (1.0, 0.0, 0.0)          # red ground below
    irr, spec = prefilter_environment(env)
    # up-facing irradiance dominated by sky green; down by ground red
    assert irr[0, 0, 1] > irr[0, 0, 0]
    assert irr[-1, 0, 0] > irr[-1, 0, 1]
    assert len(spec) == 4
    # blurred levels reduce contrast
    assert spec[-1].std() < spec[0].std()


def _scene(with_env):
    app = App(capacity=32)
    plugin = Mesh3dPlugin(backend="pallas_interpret", deferred=True)
    cube = plugin.add_mesh(cuboid(1.0, 1.0, 1.0))
    plugins = [TimePlugin(), TransformPlugin(),
               RenderPlugin(width=128, height=96), plugin,
               DeferredLightingPlugin(backend="pallas_interpret")]
    if with_env:
        env = np.zeros((16, 32, 3), np.float32)
        env[:8] = (0.0, 1.5, 0.0)
        env[8:] = (0.3, 0.0, 0.0)
        plugins.append(EnvironmentLightPlugin(env, intensity=1.0))
    app.add_plugins(*plugins)
    app.insert_resource(AmbientLight(brightness=0.02))
    app.world.spawn(Camera3d(), *transform_bundle(translation=(0, 1.2, 3.0)))
    app.world.spawn(DirectionalLight(illuminance=0.3),
                    *transform_bundle(rotation=(-0.38, 0.0, 0.0, 0.92)))
    app.world.spawn(Mesh3d(mesh=cube),
                    MeshMaterial(base_color=(0.8, 0.8, 0.8, 1.0)),
                    *transform_bundle())
    app.update(dt=1 / 60)
    return frame_image(app).astype(int)


def test_environment_light_brightens_with_sky_color():
    base = _scene(False)
    lit = _scene(True)
    # geometry gets brighter and picks up green from the sky-lit top
    diff = lit.astype(int) - base.astype(int)
    assert diff[..., 1].max() > 20
    # background pixels unchanged
    assert abs(int(lit[0, 0, 1]) - int(base[0, 0, 1])) <= 2
