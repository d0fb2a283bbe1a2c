"""UI node decorations (ref models: bevy_ui border/border_radius,
gradients, box_shadow — ui_render rounded-box shading)."""

import numpy as np

from bevy_tpu import App
from bevy_tpu.input import InputPlugin
from bevy_tpu.render import Camera2d, RenderPlugin, SpritePlugin
from bevy_tpu.render.plugin import frame_image
from bevy_tpu.time import TimePlugin
from bevy_tpu.transform import TransformPlugin, transform_bundle
from bevy_tpu.ui import Style, UiPlugin


def _app(style):
    app = App(capacity=64)
    ui = UiPlugin(width=200, height=120)
    app.add_plugins(TimePlugin(), TransformPlugin(), InputPlugin(),
                    RenderPlugin(width=200, height=120), SpritePlugin(), ui)
    app.world.spawn(Camera2d(), *transform_bundle())
    root = ui.spawn_node(app.world, Style(
        width=200, height=120, align_items="center",
        justify_content="center"))
    ui.spawn_node(app.world, style, parent=root)
    app.update(dt=1 / 60)
    app.update(dt=1 / 60)          # second frame: atlas settled
    return frame_image(app).astype(int)


def test_border_radius_rounds_corners():
    img = _app(Style(width=80, height=60, border_radius=20.0,
                     background=(0.9, 0.2, 0.2, 1.0)))
    cy, cx = 60, 100
    assert img[cy, cx, 0] > 150                     # center filled
    # the sharp corner position is NOT filled (rounded off)
    assert img[cy - 28, cx - 38, 0] < 100
    # but the edge midpoints are
    assert img[cy, cx - 38, 0] > 150
    assert img[cy - 28, cx, 0] > 150


def test_border_ring_color():
    img = _app(Style(width=80, height=60, border=6.0,
                     border_color=(0.1, 0.9, 0.1, 1.0),
                     background=(0.2, 0.2, 0.9, 1.0)))
    cy, cx = 60, 100
    assert img[cy, cx, 2] > 130                     # blue fill center
    edge = img[cy, cx - 38]                         # inside border ring
    assert edge[1] > edge[2] + 50, edge             # green border


def test_vertical_gradient():
    img = _app(Style(width=80, height=60, gradient=(
        (1.0, 0.1, 0.1, 1.0), (0.1, 0.1, 1.0, 1.0), "vertical")))
    cy, cx = 60, 100
    top = img[cy - 25, cx]
    bot = img[cy + 25, cx]
    assert top[0] > top[2] + 60, top                # red at the top
    assert bot[2] > bot[0] + 60, bot                # blue at the bottom


def test_box_shadow_behind_node():
    img = _app(Style(width=60, height=40, background=(0.9, 0.9, 0.9, 1.0),
                     box_shadow=(10.0, 10.0, 8.0, (0.0, 0.0, 0.0, 0.9))))
    plain = _app(Style(width=60, height=40,
                       background=(0.9, 0.9, 0.9, 1.0)))
    # darker pixels below-right of the node where the shadow falls
    cy, cx = 60 + 24, 100 + 32
    assert img[cy, cx, :3].sum() < plain[cy, cx, :3].sum() - 40


def test_image_node_shows_texture():
    from bevy_tpu.render.texture import AtlasBuilder, TextureAtlas

    app = App(capacity=64)
    builder = AtlasBuilder(64, 64)
    img = np.zeros((8, 8, 4), np.float32)
    img[:, :4] = (1.0, 0.0, 1.0, 1.0)           # magenta left half
    img[:, 4:] = (1.0, 1.0, 0.0, 1.0)           # yellow right half
    h = builder.add(img, srgb=False)
    ui = UiPlugin(width=200, height=120, atlas_builder=builder)
    app.add_plugins(TimePlugin(), TransformPlugin(), InputPlugin(),
                    RenderPlugin(width=200, height=120), SpritePlugin(), ui)
    app.insert_resource(TextureAtlas.RESOURCE,
                        {"data": np.asarray(builder.data)})
    app.world.spawn(Camera2d(), *transform_bundle())
    root = ui.spawn_node(app.world, Style(
        width=200, height=120, align_items="center",
        justify_content="center"))
    ui.image(app.world, Style(width=80, height=40), h, parent=root)
    app.update(dt=1 / 60)
    out = frame_image(app).astype(int)
    left = out[60, 100 - 20]
    right = out[60, 100 + 20]
    assert left[0] > 150 and left[2] > 150 and left[1] < 120, left
    assert right[0] > 150 and right[1] > 150 and right[2] < 120, right
