"""Gizmos tests (ref model: bevy_gizmos immediate-mode semantics)."""

import jax.numpy as jnp
import numpy as np

from bevy_tpu import App, Update
from bevy_tpu.ecs.system import system
from bevy_tpu.render import Camera2d, RenderPlugin, SpritePlugin
from bevy_tpu.render.gizmos import Gizmos, GizmosPlugin
from bevy_tpu.render.plugin import frame_image
from bevy_tpu.time import TimePlugin
from bevy_tpu.transform import TransformPlugin, transform_bundle


def _app(draw_system):
    app = App(capacity=32)
    app.add_plugins(TimePlugin(), TransformPlugin(),
                    RenderPlugin(width=128, height=64), SpritePlugin(),
                    GizmosPlugin(capacity=64))
    app.world.spawn(Camera2d(), *transform_bundle())
    app.add_systems(Update, draw_system)
    return app


def test_line_2d_draws_and_is_immediate():
    @system
    def draw(g=Gizmos()):
        g.line_2d(jnp.asarray([-30.0, 0.0]), jnp.asarray([30.0, 0.0]),
                  color=(1.0, 0.0, 0.0, 1.0), width=2.0)

    app = _app(draw)
    app.update(dt=1 / 60)
    img = frame_image(app)
    assert img[32, 64, 0] > 150, "line not drawn through center"
    assert img[20, 64, 0] < 120, "line too thick / misplaced"

    # immediate mode: a frame without drawing leaves no line
    app.schedules[Update].entries.clear()
    app.schedules[Update]._order = None
    app._plan_cache.clear()
    app.update(dt=1 / 60)
    img2 = frame_image(app)
    assert img2[32, 64, 0] < 120, "gizmo persisted across frames"


def test_rect_outline():
    @system
    def draw(g=Gizmos()):
        g.rect_2d((0.0, 0.0), (40.0, 20.0), color=(0.0, 1.0, 0.0, 1.0),
                  width=2.0)

    app = _app(draw)
    app.update(dt=1 / 60)
    img = frame_image(app)
    assert img[32 - 10, 64, 1] > 150     # top edge
    assert img[32, 64 - 20, 1] > 150     # left edge
    assert img[32, 64, 1] < 120          # hollow center


def test_circle_2d_and_grid():
    @system
    def draw(g=Gizmos(budget=512)):
        g.circle_2d((0.0, 0.0), 20.0, color=(0.0, 0.0, 1.0, 1.0), width=2.0)
        g.grid_2d((0.0, 0.0), (16.0, 16.0), (6, 3),
                  color=(1.0, 1.0, 0.0, 1.0), width=1.0)

    app = _app(draw)
    app.update(dt=1 / 60)
    img = frame_image(app)
    # circle: blue on the ring (right point), not at center
    assert img[32, 64 + 20, 2] > 140
    # grid: yellow on the vertical rule at x=16 and horizontal at y=8
    assert img[32, 64 + 16, 1] > 100
    assert img[32 - 8, 64 + 40, 1] > 100


def test_3d_shapes_draw():
    from bevy_tpu.render.camera import Camera3d

    @system
    def draw3(g=Gizmos(budget=512)):
        g.sphere((0.0, 0.0, 0.0), 1.0, color=(1.0, 0.0, 1.0, 1.0))
        g.cuboid((0.0, 0.0, 0.0), (1.2, 1.2, 1.2),
                 color=(0.0, 1.0, 1.0, 1.0))
        g.axes((0.0, 0.0, 0.0), length=1.5)
        g.arrow((0.0, -1.5, 0.0), (0.0, 1.5, 0.0),
                color=(1.0, 1.0, 1.0, 1.0))

    app = App(capacity=32)
    app.add_plugins(TimePlugin(), TransformPlugin(),
                    RenderPlugin(width=128, height=96), SpritePlugin(),
                    GizmosPlugin(capacity=512))
    app.world.spawn(Camera3d(), *transform_bundle(translation=(0, 0, 5)))
    app.add_systems(Update, draw3)
    app.update(dt=1 / 60)
    img = frame_image(app).astype(int)
    bg = img[2, 2]
    cov = np.abs(img - bg).max(-1) > 30
    assert cov.mean() > 0.02, "3D gizmo shapes not visible"
    # sphere ring magenta near left edge of the unit sphere's projection
    assert cov[48 - 2:48 + 2, 30:98].any()


def test_retained_gizmos_persist_and_despawn():
    from bevy_tpu.render.gizmos import RetainedGizmo

    app = App(capacity=32)
    app.add_plugins(TimePlugin(), TransformPlugin(),
                    RenderPlugin(width=128, height=64), SpritePlugin(),
                    GizmosPlugin(capacity=64))
    app.world.spawn(Camera2d(), *transform_bundle())
    e = app.world.spawn(RetainedGizmo(
        a=(-30.0, 0.0, 0.0), b=(30.0, 0.0, 0.0),
        color=(1.0, 0.0, 0.0, 1.0), width=2.0, is3d=False))
    app.update(dt=1 / 60)
    app.update(dt=1 / 60)                     # persists with no re-issue
    img = frame_image(app)
    assert img[32, 64, 0] > 150
    app.world.despawn(e)
    app.update(dt=1 / 60)
    img = frame_image(app)
    assert img[32, 64, 0] < 120


def test_ui_debug_overlay_draws_rects():
    from bevy_tpu.input import InputPlugin
    from bevy_tpu.render.gizmos import UiDebugOverlayPlugin
    from bevy_tpu.ui import Style, UiPlugin

    app = App(capacity=64)
    ui = UiPlugin(width=128, height=64)
    app.add_plugins(TimePlugin(), TransformPlugin(), InputPlugin(),
                    RenderPlugin(width=128, height=64), SpritePlugin(),
                    ui, GizmosPlugin(capacity=256),
                    UiDebugOverlayPlugin())
    app.world.spawn(Camera2d(), *transform_bundle())
    root = ui.spawn_node(app.world, Style(width=128, height=64))
    ui.spawn_node(app.world, Style(width=40, height=20,
                                   background=(0, 0, 0, 0)), parent=root)
    app.update(dt=1 / 60)
    app.update(dt=1 / 60)
    img = frame_image(app)
    # overlay outline along the child's top edge (child at top-left)
    assert img[0:22, 0:42, 1].max() > 150


def test_frame_time_graph_draws():
    from bevy_tpu.dev_tools import FrameTimeGraphPlugin
    from bevy_tpu.render.plugin import frame_image as fi

    app = App(capacity=32)
    app.add_plugins(TimePlugin(), TransformPlugin(),
                    RenderPlugin(width=160, height=96), SpritePlugin(),
                    GizmosPlugin(capacity=512),
                    FrameTimeGraphPlugin(samples=32, width=100, height=30))
    app.world.spawn(Camera2d(), *transform_bundle())
    for _ in range(5):
        app.update(dt=1 / 60)
    img = fi(app)
    # the curve occupies the top-left corner region
    region = img[4:40, 4:110]
    assert (region.max(-1) > 120).sum() > 30


def test_stroke_text_2d_draws():
    """Stroke-font debug text (ref: bevy_gizmos stroke_text.rs)."""
    @system
    def draw(g=Gizmos(budget=512)):
        g.text_2d(jnp.asarray([-50.0, -5.0]), "HI 42!", size=20.0,
                  color=(1.0, 1.0, 0.0, 1.0), width=2.0)
        g.cross_2d(jnp.asarray([40.0, -20.0]), half_size=6.0,
                   color=(0.0, 1.0, 1.0, 1.0))

    app = App(capacity=32)
    app.add_plugins(TimePlugin(), TransformPlugin(),
                    RenderPlugin(width=128, height=64), SpritePlugin(),
                    GizmosPlugin(capacity=512))
    app.world.spawn(Camera2d(), *transform_bundle())
    app.add_systems(Update, draw)
    app.update(dt=1 / 60)
    img = frame_image(app)
    # text occupies the left-center band; lots of yellow stroke pixels
    band = img[10:50, 0:110]
    lit = ((band[..., 0] > 120) & (band[..., 1] > 120)).sum()
    assert lit > 60, f"stroke text not drawn ({lit} px)"
    # cross at world (40,-20) → screen (104, 52)
    assert img[52, 104, 1] > 120 and img[52, 104, 2] > 120


def test_stroke_font_measure():
    from bevy_tpu.render.stroke_font import layout, measure

    w, h = measure("AB\nC", 6.0)
    assert w == 10.0 and h == 18.0
    polys = layout("A", 6.0)
    assert len(polys) == 2  # two strokes in 'A'
    # lowercase maps to uppercase
    assert len(layout("a", 6.0)) == len(polys)
