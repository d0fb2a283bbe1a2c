"""RectLight area lights (ref model: bevy_light/src/rect_light.rs —
one-sided rectangular emitter, representative-point shading)."""

import numpy as np

from bevy_tpu import App
from bevy_tpu.render import RenderPlugin
from bevy_tpu.render.camera import Camera3d
from bevy_tpu.render.deferred import DeferredLightingPlugin, RectLight
from bevy_tpu.render.mesh import cuboid
from bevy_tpu.render.mesh3d import (
    AmbientLight, Mesh3d, MeshMaterial, Mesh3dPlugin,
)
from bevy_tpu.render.plugin import frame_image
from bevy_tpu.time import TimePlugin
from bevy_tpu.transform import TransformPlugin, transform_bundle

W, H = 192, 96
DOWN = (-0.70710678, 0.0, 0.0, 0.70710678)   # -Z emission → -Y (down)
UP = (0.70710678, 0.0, 0.0, 0.70710678)      # -Z emission → +Y (up)


def _app(rot, rw=6.0, rh=6.0, color=(1.0, 0.2, 0.1)):
    app = App(capacity=16)
    plugin = Mesh3dPlugin(backend="pallas_interpret", deferred=True)
    floor = plugin.add_mesh(cuboid(40.0, 0.2, 40.0))
    app.add_plugins(TimePlugin(), TransformPlugin(),
                    RenderPlugin(width=W, height=H), plugin,
                    DeferredLightingPlugin(backend="pallas_interpret"))
    app.insert_resource(AmbientLight(brightness=0.02))
    app.world.spawn(Camera3d(), *transform_bundle(
        translation=(0.0, 10.0, 14.0),
        rotation=(-0.3, 0.0, 0.0, 0.954)))
    app.world.spawn(Mesh3d(mesh=floor),
                    MeshMaterial(base_color=(0.8, 0.8, 0.8, 1.0)),
                    *transform_bundle(translation=(0.0, -0.1, 0.0)))
    app.world.spawn(RectLight(color=color, intensity=40.0, range=8.0,
                              width=rw, height=rh),
                    *transform_bundle(translation=(0.0, 2.0, 0.0),
                                      rotation=rot))
    app.update(dt=1 / 60)
    return app


def _lit(img, thresh=30):
    rgb = img[..., :3].astype(int)
    sat = rgb.max(-1) - rgb.min(-1)
    return (sat > thresh)


def test_rect_light_is_one_sided():
    down = _app(DOWN)
    up = _app(UP)
    lit_down = _lit(frame_image(down)).sum()
    lit_up = _lit(frame_image(up)).sum()
    assert lit_down > 100, f"floor not lit by downward rect ({lit_down})"
    assert lit_up < 10, f"upward rect lit the floor behind it ({lit_up})"


def test_rect_extent_grows_lit_area():
    """A wide rect spreads its pool along its local X (representative
    point walks the rect), so the lit area grows with width."""
    wide = _lit(frame_image(_app(DOWN, rw=14.0, rh=1.0))).sum()
    narrow = _lit(frame_image(_app(DOWN, rw=1.0, rh=1.0))).sum()
    assert wide > narrow * 1.3, (int(wide), int(narrow))


def test_wide_rect_pool_is_anisotropic():
    """The lit pool of a 14x1 rect is much wider (screen x) than deep."""
    img = frame_image(_app(DOWN, rw=14.0, rh=1.0))
    lit = _lit(img)
    ys, xs = np.nonzero(lit)
    assert len(xs) > 50
    assert (xs.max() - xs.min()) > 2.0 * (ys.max() - ys.min())
