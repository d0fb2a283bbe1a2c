"""Directional shadow tests (ref model: bevy shadow mapping — an occluder
between the light and the floor darkens the floor behind it)."""

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
from bevy_tpu.render.shadow import ShadowPlugin
from bevy_tpu.time import TimePlugin
from bevy_tpu.transform import TransformPlugin, transform_bundle


def _scene(with_shadows=True, with_occluder=True):
    app = App(capacity=32)
    plugin = Mesh3dPlugin(backend="pallas_interpret", deferred=True)
    cube = plugin.add_mesh(cuboid(1.0, 1.0, 1.0))
    plugins = [TimePlugin(), TransformPlugin(),
               RenderPlugin(width=160, height=96), plugin,
               DeferredLightingPlugin(backend="pallas_interpret")]
    if with_shadows:
        plugins.append(ShadowPlugin(plugin, size=256, extent=12.0,
                                    distance=20.0,
                                    backend="pallas_interpret"))
    app.add_plugins(*plugins)
    app.insert_resource(AmbientLight(brightness=0.05))
    # camera straight down onto the floor
    app.world.spawn(Camera3d(), *transform_bundle(
        translation=(0.0, 10.0, 0.01),
        rotation=(-0.7071, 0.0, 0.0, 0.7071)))
    # light tilted so the shadow lands offset from the cube
    app.world.spawn(DirectionalLight(illuminance=1.0),
                    *transform_bundle(rotation=(-0.35, 0.35, 0.0, 0.87)))
    # floor (flattened cube)
    app.world.spawn(Mesh3d(mesh=cube),
                    MeshMaterial(base_color=(0.8, 0.8, 0.8, 1.0)),
                    *transform_bundle(translation=(0.0, -0.5, 0.0),
                                      scale=(20.0, 1.0, 20.0)))
    if with_occluder:
        app.world.spawn(Mesh3d(mesh=cube),
                        MeshMaterial(base_color=(0.8, 0.2, 0.2, 1.0)),
                        *transform_bundle(translation=(0.0, 1.5, 0.0)))
    app.update(dt=1 / 60)
    return frame_image(app).astype(int)


def test_occluder_casts_shadow():
    lit = _scene(with_shadows=False)
    shadowed = _scene(with_shadows=True)
    # somewhere on the floor, the shadowed image is markedly darker
    diff = lit[..., 1] - shadowed[..., 1]
    assert diff.max() > 40, f"no shadow darkening (max diff {diff.max()})"
    dark_px = (diff > 40).sum()
    assert 10 < dark_px < lit.shape[0] * lit.shape[1] * 0.5, dark_px


def test_cascaded_shadows_match_single():
    """3 cascades produce the same shadow placement as one (tighter near
    maps refine, not move, the shadow; ref: CascadeShadowConfig)."""
    import bevy_tpu.render.shadow as sh

    def scene(cascades):
        app = App(capacity=32)
        plugin = Mesh3dPlugin(backend="pallas_interpret", deferred=True)
        cube = plugin.add_mesh(cuboid(1.0, 1.0, 1.0))
        app.add_plugins(
            TimePlugin(), TransformPlugin(),
            RenderPlugin(width=160, height=96), plugin,
            DeferredLightingPlugin(backend="pallas_interpret"),
            ShadowPlugin(plugin, size=256, extent=12.0, distance=20.0,
                         cascades=cascades, backend="pallas_interpret"))
        app.insert_resource(AmbientLight(brightness=0.05))
        app.world.spawn(Camera3d(), *transform_bundle(
            translation=(0.0, 10.0, 0.01),
            rotation=(-0.7071, 0.0, 0.0, 0.7071)))
        app.world.spawn(DirectionalLight(illuminance=1.0),
                        *transform_bundle(rotation=(-0.35, 0.35, 0.0, 0.87)))
        app.world.spawn(Mesh3d(mesh=cube),
                        MeshMaterial(base_color=(0.8, 0.8, 0.8, 1.0)),
                        *transform_bundle(translation=(0.0, -0.5, 0.0),
                                          scale=(20.0, 1.0, 20.0)))
        app.world.spawn(Mesh3d(mesh=cube),
                        MeshMaterial(base_color=(0.8, 0.2, 0.2, 1.0)),
                        *transform_bundle(translation=(0.0, 1.5, 0.0)))
        app.update(dt=1 / 60)
        return frame_image(app).astype(int)

    one = scene(1)
    three = scene(3)
    dark1 = one[..., 1] < 110
    dark3 = three[..., 1] < 110
    # same shadow region within a small tolerance
    assert np.mean(dark1 != dark3) < 0.04, np.mean(dark1 != dark3)
    assert dark3.sum() > 20


def test_no_occluder_no_shadow():
    a = _scene(with_shadows=True, with_occluder=False)
    b = _scene(with_shadows=False, with_occluder=False)
    # the floor itself must not self-shadow (bias holds)
    diff = np.abs(a[..., 1].astype(int) - b[..., 1].astype(int))
    assert (diff > 25).mean() < 0.02, f"self-shadowing acne: {(diff > 25).mean():.3f}"
