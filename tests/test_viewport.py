"""Multi-camera viewport tests (ref model: the split_screen /
picture-in-picture examples — Camera::viewport rects + Camera::order,
bevy_render/src/camera/camera.rs)."""

import numpy as np

from bevy_tpu import App
from bevy_tpu.render import RenderPlugin
from bevy_tpu.render.camera import Camera3d
from bevy_tpu.render.mesh import cuboid
from bevy_tpu.render.mesh3d import (
    DirectionalLight, Mesh3d, MeshMaterial, Mesh3dPlugin,
)
from bevy_tpu.render.plugin import frame_image
from bevy_tpu.time import TimePlugin
from bevy_tpu.transform import TransformPlugin, transform_bundle


def _split_app(w=128, h=64, right_layers=1):
    """Two side-by-side cameras; the right one's RenderLayers mask is
    configurable so tests can blank it out."""
    app = App(capacity=32)
    plugin = Mesh3dPlugin(backend="xla")
    cube_id = plugin.add_mesh(cuboid(1.0, 1.0, 1.0))
    app.add_plugins(TimePlugin(), TransformPlugin(),
                    RenderPlugin(width=w, height=h), plugin)
    app.world.spawn(Camera3d(order=0, vp_min=(0.0, 0.0), vp_max=(0.5, 1.0)),
                    *transform_bundle(translation=(0.0, 0.0, 3.0)))
    app.world.spawn(Camera3d(order=1, vp_min=(0.5, 0.0), vp_max=(1.0, 1.0),
                             layers=right_layers),
                    *transform_bundle(translation=(0.0, 0.0, 6.0)))
    app.world.spawn(Mesh3d(mesh=cube_id),
                    MeshMaterial(base_color=(1.0, 0.1, 0.1, 1.0)),
                    *transform_bundle())
    app.world.spawn(DirectionalLight(illuminance=1.0), *transform_bundle())
    return app


def test_split_screen_both_halves_draw():
    app = _split_app()
    app.update(dt=1 / 60)
    img = frame_image(app)
    h, w = img.shape[:2]
    left = img[h // 2, w // 4]
    right = img[h // 2, 3 * w // 4]
    assert left[0] > 150, f"left cam cube missing: {left}"
    assert right[0] > 150, f"right cam cube missing: {right}"
    # cube pixels are saturated red; the clear color (88,88,102) is not
    cube = (img[..., 0].astype(int) > 150) & \
        (img[..., 0].astype(int) > img[..., 2].astype(int) + 50)
    red_l = cube[:, : w // 2].sum()
    red_r = cube[:, w // 2:].sum()
    # right camera is twice as far: its cube covers ~1/4 the pixels
    assert red_l > red_r * 2, (red_l, red_r)


def test_viewport_scissors_to_rect():
    # right camera excluded via layers: its half must stay clear color even
    # though the LEFT camera's cube geometry extends past x = w/2 in world
    app = _split_app(right_layers=2)
    app.update(dt=1 / 60)
    img = frame_image(app)
    h, w = img.shape[:2]
    assert img[h // 2, w // 4][0] > 150
    right_half = img[:, w // 2:]
    cube_r = (right_half[..., 0].astype(int) > 150) & \
        (right_half[..., 0].astype(int) > right_half[..., 2].astype(int) + 50)
    assert cube_r.sum() == 0, "scissor leaked pixels"


def test_single_camera_unchanged():
    # one camera with default viewport = identical to the pre-viewport path
    app = App(capacity=32)
    plugin = Mesh3dPlugin(backend="xla")
    cube_id = plugin.add_mesh(cuboid(1.0, 1.0, 1.0))
    app.add_plugins(TimePlugin(), TransformPlugin(),
                    RenderPlugin(width=128, height=64), plugin)
    app.world.spawn(Camera3d(), *transform_bundle(translation=(0.0, 0.0, 3.0)))
    app.world.spawn(Mesh3d(mesh=cube_id),
                    MeshMaterial(base_color=(1.0, 0.1, 0.1, 1.0)),
                    *transform_bundle())
    app.world.spawn(DirectionalLight(illuminance=1.0), *transform_bundle())
    app.update(dt=1 / 60)
    img = frame_image(app)
    assert img[32, 64][0] > 150


def test_split_screen_pallas_kernel_scissor():
    # same scene through the pallas kernels (interpret mode on CPU): the
    # in-kernel scissor must clip edge-straddling triangles identically
    app_p = App(capacity=32)
    plugin = Mesh3dPlugin(backend="pallas_interpret")
    from bevy_tpu.render.mesh import cuboid as _cuboid
    cube_id = plugin.add_mesh(_cuboid(1.0, 1.0, 1.0))
    app_p.add_plugins(TimePlugin(), TransformPlugin(),
                      RenderPlugin(width=128, height=64), plugin)
    app_p.world.spawn(Camera3d(order=0, vp_min=(0.0, 0.0), vp_max=(0.5, 1.0)),
                      *transform_bundle(translation=(0.0, 0.0, 3.0)))
    app_p.world.spawn(Camera3d(order=1, vp_min=(0.5, 0.0), vp_max=(1.0, 1.0),
                               layers=2),
                      *transform_bundle(translation=(0.0, 0.0, 6.0)))
    app_p.world.spawn(Mesh3d(mesh=cube_id),
                      MeshMaterial(base_color=(1.0, 0.1, 0.1, 1.0)),
                      *transform_bundle())
    app_p.world.spawn(DirectionalLight(illuminance=1.0), *transform_bundle())
    app_p.update(dt=1 / 60)
    img = frame_image(app_p)
    h, w = img.shape[:2]
    assert img[h // 2, w // 4][0] > 150, "left cube missing (pallas)"
    right_half = img[:, w // 2:]
    cube_r = (right_half[..., 0].astype(int) > 150) & \
        (right_half[..., 0].astype(int) > right_half[..., 2].astype(int) + 50)
    assert cube_r.sum() == 0, "pallas scissor leaked pixels"
