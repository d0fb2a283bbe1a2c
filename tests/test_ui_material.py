"""UI materials (ref model: bevy_ui_render/src/ui_material.rs — custom
per-node shading over the node rect, here a bake-time uv shader)."""

import numpy as np

from bevy_tpu import App
from bevy_tpu.input import InputPlugin
from bevy_tpu.render import Camera2d, RenderPlugin, SpritePlugin
from bevy_tpu.render.plugin import frame_image
from bevy_tpu.time import TimePlugin
from bevy_tpu.transform import TransformPlugin, transform_bundle
from bevy_tpu.ui import Style, UiPlugin

W, H = 128, 64


def _checker(u, v, size):
    c = ((np.floor(u * 8) + np.floor(v * 4)) % 2)[..., None]
    col = np.where(c > 0.5, np.asarray([1.0, 0.1, 0.1, 1.0]),
                   np.asarray([0.1, 0.1, 1.0, 1.0]))
    return col.astype(np.float32)


def _app(style):
    app = App(capacity=32)
    ui = UiPlugin(width=W, height=H)
    app.add_plugins(TimePlugin(), TransformPlugin(), InputPlugin(),
                    RenderPlugin(width=W, height=H), SpritePlugin(), ui)
    app.world.spawn(Camera2d(), *transform_bundle())
    root = ui.spawn_node(app.world, Style(width=W, height=H,
                                          align_items="center",
                                          justify_content="center"))
    ui.spawn_node(app.world, style, parent=root)
    app.update(dt=1 / 60)
    app.update(dt=1 / 60)
    return app


def test_ui_material_checker_renders():
    app = _app(Style(width=64, height=32, material=_checker,
                     material_key="checker"))
    img = frame_image(app).astype(int)
    center = img[H // 2 - 14:H // 2 + 14, W // 2 - 30:W // 2 + 30]
    red = ((center[..., 0] > 150) & (center[..., 2] < 100)).sum()
    blue = ((center[..., 2] > 150) & (center[..., 0] < 100)).sum()
    assert red > 100 and blue > 100, (red, blue)


def test_ui_material_composes_with_border():
    app = _app(Style(width=64, height=32, material=_checker,
                     material_key="checker", border=3.0,
                     border_color=(0.0, 1.0, 0.0, 1.0)))
    img = frame_image(app).astype(int)
    # border ring on top of the material at the node's top edge
    top = img[H // 2 - 16:H // 2 - 13, W // 2 - 20:W // 2 + 20]
    assert (top[..., 1] > 150).mean() > 0.5
