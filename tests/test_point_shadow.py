"""Point-light cubemap shadows (ref model: the point-shadow views of
bevy_pbr/src/render/light.rs — six faces; occluders cast in any
direction)."""

import numpy as np

from bevy_tpu import App
from bevy_tpu.render import RenderPlugin
from bevy_tpu.render.camera import Camera3d
from bevy_tpu.render.deferred import DeferredLightingPlugin, PointLight
from bevy_tpu.render.mesh import cuboid
from bevy_tpu.render.mesh3d import (
    AmbientLight, Mesh3d, MeshMaterial, Mesh3dPlugin,
)
from bevy_tpu.render.plugin import frame_image
from bevy_tpu.render.point_shadow import PointShadowPlugin
from bevy_tpu.time import TimePlugin
from bevy_tpu.transform import TransformPlugin, transform_bundle


def _scene(with_occluder, shadows=True, occluder_at=(0.0, 2.0, 0.0)):
    app = App(capacity=32)
    plugin = Mesh3dPlugin(backend="pallas_interpret", deferred=True)
    cube = plugin.add_mesh(cuboid(1.0, 1.0, 1.0))
    plugins = [TimePlugin(), TransformPlugin(),
               RenderPlugin(width=160, height=96), plugin,
               DeferredLightingPlugin(backend="pallas_interpret"),
               PointShadowPlugin(plugin, size=128,
                                 backend="pallas_interpret")]
    app.add_plugins(*plugins)
    app.insert_resource(AmbientLight(brightness=0.03))
    # camera looking down at the floor
    app.world.spawn(Camera3d(), *transform_bundle(
        translation=(0.0, 8.0, 0.01),
        rotation=(-0.7071, 0.0, 0.0, 0.7071)))
    # point light above the floor
    app.world.spawn(PointLight(intensity=60.0, range=30.0,
                               shadows=int(shadows)),
                    *transform_bundle(translation=(0.0, 5.0, 0.0)))
    # floor
    app.world.spawn(Mesh3d(mesh=cube),
                    MeshMaterial(base_color=(0.8, 0.8, 0.8, 1.0)),
                    *transform_bundle(translation=(0.0, -0.5, 0.0),
                                      scale=(16.0, 1.0, 16.0)))
    if with_occluder:
        app.world.spawn(Mesh3d(mesh=cube),
                        MeshMaterial(base_color=(0.8, 0.2, 0.2, 1.0)),
                        *transform_bundle(translation=occluder_at))
    app.update(dt=1 / 60)
    return frame_image(app).astype(int)


def test_point_lights_floor():
    img = _scene(False)
    c = img[48, 80][:3].sum()
    e = img[48, 8][:3].sum()
    assert c > e + 40, (c, e)


def test_point_occluder_shadows_down():
    lit = _scene(False)
    occ = _scene(True)
    diff = lit[..., :3].sum(-1) - occ[..., :3].sum(-1)
    assert diff.max() > 60, diff.max()


def test_point_occluder_shadows_sideways():
    """Cubemap faces: an occluder OFF the -Y axis still shadows (the
    single-map spot approach could not)."""
    lit = _scene(False)
    occ = _scene(True, occluder_at=(2.5, 2.5, 0.0))
    diff = lit[..., :3].sum(-1) - occ[..., :3].sum(-1)
    # shadow lands on the floor farther out along +x
    h, w = diff.shape
    right = diff[:, w // 2:]
    assert right.max() > 60, right.max()


def test_unshadowed_matches_binned_kernel():
    """shadows=0 keeps the light in the binned kernel; scenes match."""
    a = _scene(False, shadows=False)
    b = _scene(False, shadows=True)
    d = np.abs(a.astype(float) - b.astype(float)).mean()
    assert d < 14.0, d
