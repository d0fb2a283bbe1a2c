"""Native layout solver + headless widgets (ref models: taffy's flex/grid
tests via bevy_ui layout, and bevy_ui_widgets checkbox/radio/slider/
scrollarea behavior)."""

import numpy as np

from bevy_tpu import App
from bevy_tpu.input import InputPlugin, MouseButton
from bevy_tpu.native.layout import (
    ABSOLUTE, ALIGN_CENTER, CENTER, GRID, ROW, SPACE_BETWEEN,
    fr, make_style, pct, px, solve,
)
from bevy_tpu.render import Camera2d, RenderPlugin, SpritePlugin
from bevy_tpu.time import TimePlugin
from bevy_tpu.transform import TransformPlugin, transform_bundle
from bevy_tpu.ui import (
    Checked, ScrollPosition, SliderValue, Style, UiNode, UiPlugin,
)


# ---- native solver ------------------------------------------------------

def test_flex_grow_and_gap():
    styles = [
        make_style(width=px(300), height=px(50), flex_direction=ROW, gap=20),
        make_style(flex_grow=1.0, height=px(50)),
        make_style(flex_grow=2.0, height=px(50)),
    ]
    lay = solve(styles, [-1, 0, 0], 800, 600)
    # 280 free split 1:2
    assert abs(lay[1][2] - 280 / 3) < 0.5
    assert abs(lay[2][2] - 560 / 3) < 0.5
    assert abs(lay[2][0] - (lay[1][2] + 20)) < 0.5


def test_percent_and_min_max():
    styles = [
        make_style(width=px(200), height=px(100)),
        make_style(width=pct(50), height=pct(25), min_height=px(30)),
    ]
    lay = solve(styles, [-1, 0], 800, 600)
    assert lay[1][2] == 100.0       # 50% of 200
    assert lay[1][3] == 30.0        # 25% = 25 clamped up to min 30


def test_justify_center_align_center():
    styles = [
        make_style(width=px(100), height=px(100), flex_direction=ROW,
                   justify_content=CENTER, align_items=ALIGN_CENTER),
        make_style(width=px(20), height=px(20)),
    ]
    lay = solve(styles, [-1, 0], 800, 600)
    assert abs(lay[1][0] - 40) < 0.5 and abs(lay[1][1] - 40) < 0.5


def test_space_between_wrap():
    styles = [make_style(width=px(100), height=px(100), flex_direction=ROW,
                         flex_wrap=True, justify_content=SPACE_BETWEEN)]
    for _ in range(3):
        styles.append(make_style(width=px(40), height=px(10)))
    lay = solve(styles, [-1, 0, 0, 0], 800, 600)
    # two fit per line (80 <= 100), third wraps
    assert lay[1][1] == lay[2][1] and lay[3][1] > lay[1][1]
    assert abs((lay[2][0] + lay[2][2]) - 100) < 0.5   # space-between edge


def test_grid_fr_tracks_and_span():
    styles = [
        make_style(display=GRID, width=px(300), height=px(100),
                   grid_cols=[px(50), fr(1), fr(1)], grid_rows=[px(40), px(40)]),
        make_style(),                                   # (0,0)
        make_style(grid_col_span=2),                    # (0,1)..(0,2)
        make_style(),                                   # (1,0) next row
    ]
    lay = solve(styles, [-1, 0, 0, 0], 800, 600)
    assert lay[1][2] == 50.0
    assert abs(lay[2][2] - 250) < 0.5                   # spans both fr cols
    assert lay[3][1] == 40.0 and lay[3][0] == 0.0


def test_absolute_inset():
    styles = [
        make_style(width=px(400), height=px(300)),
        make_style(position=ABSOLUTE, right=px(10), bottom=px(20),
                   width=px(50), height=px(30)),
    ]
    lay = solve(styles, [-1, 0], 800, 600)
    assert lay[1] == (340.0, 250.0, 50.0, 30.0)


# ---- widgets ------------------------------------------------------------

def _app(w=256, h=128):
    app = App(capacity=64)
    app.add_plugins(TimePlugin(), TransformPlugin(), InputPlugin(),
                    RenderPlugin(width=w, height=h), SpritePlugin(),
                    UiPlugin(width=w, height=h))
    app.world.spawn(Camera2d(), *transform_bundle())
    return app


def _click(app, x, y):
    app.input.move_to(x, y)
    app.input.press_mouse(MouseButton.Left)
    app.update(dt=1 / 60)
    app.input.release_mouse(MouseButton.Left)
    app.update(dt=1 / 60)


def test_checkbox_toggles():
    app = _app()
    cb = app.ui.checkbox(app.world, Style(width=20, height=20, left=30,
                                          top=30), checked=False)
    app.update(dt=1 / 60)
    assert int(app.world.get(cb, Checked).value) == 0
    _click(app, 40, 40)
    assert int(app.world.get(cb, Checked).value) == 1
    _click(app, 40, 40)
    assert int(app.world.get(cb, Checked).value) == 0


def test_radio_group_exclusive():
    app = _app()
    ui = app.ui
    panel = ui.spawn_node(app.world, Style(width=100, height=100, left=0,
                                           top=0, gap=10))
    r1 = ui.radio(app.world, Style(width=20, height=20), group=1,
                  parent=panel, checked=True)
    r2 = ui.radio(app.world, Style(width=20, height=20), group=1,
                  parent=panel)
    app.update(dt=1 / 60)
    assert int(app.world.get(r1, Checked).value) == 1
    # click the second radio: first clears
    _click(app, 10, 40)
    assert int(app.world.get(r2, Checked).value) == 1
    assert int(app.world.get(r1, Checked).value) == 0


def test_slider_drag():
    app = _app()
    s = app.ui.slider(app.world, Style(width=100, height=10, left=50,
                                       top=50), value=0.5)
    app.update(dt=1 / 60)
    # press at 75% of the track (x = 50 + 75)
    app.input.move_to(125.0, 55.0)
    app.input.press_mouse(MouseButton.Left)
    app.update(dt=1 / 60)
    v = float(app.world.get(s, SliderValue).value)
    assert abs(v - 0.75) < 0.02, v
    # drag beyond the end clamps while captured
    app.input.move_to(200.0, 55.0)
    app.update(dt=1 / 60)
    assert float(app.world.get(s, SliderValue).value) == 1.0
    app.input.release_mouse(MouseButton.Left)
    app.input.move_to(60.0, 55.0)
    app.update(dt=1 / 60)  # not dragging: value unchanged
    assert float(app.world.get(s, SliderValue).value) == 1.0


def test_scroll_area_scrolls_and_clips():
    app = _app()
    ui = app.ui
    area = ui.scroll_area(app.world, Style(width=80, height=60, left=10,
                                           top=10))
    kids = [ui.spawn_node(app.world, Style(width=60, height=30,
                                           flex_shrink=0.0,
                                           background=(1, 0, 0, 1)),
                          parent=area) for _ in range(4)]
    app.update(dt=1 / 60)
    # content = 120 > 60 viewport; last child clipped to zero height
    k3 = app.world.get(kids[3], UiNode)
    assert float(np.asarray(k3.size)[1]) == 0.0
    # wheel down over the area scrolls
    app.input.move_to(50.0, 40.0)
    app.input.wheel(0.0, -1.0)
    app.update(dt=1 / 60)
    app.input.wheel(0.0, 0.0)
    off = app.world.get(area, ScrollPosition)
    assert float(np.asarray(off.offset)[1]) == 20.0
    app.update(dt=1 / 60)
    # first child now partially clipped at the top
    k0 = app.world.get(kids[0], UiNode)
    assert 0.0 < float(np.asarray(k0.size)[1]) < 30.0


def test_theme_tokens_and_controls():
    """ref model: bevy_feathers tokens + themed controls."""
    from bevy_tpu.ui_theme import DARK_THEME, LIGHT_THEME, Theme

    app = _app()
    th = Theme()
    panel = th.panel(app.ui, app.world, 120, 80)
    btn = th.button(app.ui, app.world, parent=panel)
    cb = th.checkbox(app.ui, app.world, parent=panel)
    app.update(dt=1 / 60)
    from bevy_tpu.render.sprite import Sprite
    c = app.world.get(btn, Sprite)
    assert np.allclose(np.asarray(c.color), DARK_THEME["button.bg"],
                       atol=1e-5)
    # light theme overrides resolve
    lt = Theme(LIGHT_THEME)
    assert lt.color("text") != th.color("text")
    assert app.world.get(cb, UiNode) is not None


def test_virtual_list_windows_and_scrolls():
    """ref model: ui_widgets virtual list — recycled rows window a long
    logical list; the wheel reindexes without structural change."""
    import jax

    app = _app()
    colors = np.zeros((50, 4), np.float32)
    colors[:, 3] = 1.0
    colors[:, 0] = np.linspace(0.0, 1.0, 50)      # red ramp by index
    area = app.ui.virtual_list(app.world, Style(width=80, height=60,
                                                left=10, top=10),
                               colors, row_height=20)
    vl = app.ui._virtual_lists[0]
    assert len(vl["rows"]) == 3                   # 60 / 20
    app.update(dt=1 / 60)
    from bevy_tpu.render.sprite import Sprite
    r0 = float(np.asarray(jax.device_get(
        app.world.get(vl["rows"][0], Sprite).color))[0])
    assert r0 < 0.05                              # shows item 0
    # scroll 10 rows down
    app.input.move_to(40.0, 30.0)
    app.input.wheel(0.0, -10.0)
    app.update(dt=1 / 60)
    app.input.wheel(0.0, 0.0)
    app.update(dt=1 / 60)
    r0b = float(np.asarray(jax.device_get(
        app.world.get(vl["rows"][0], Sprite).color))[0])
    assert r0b > r0 + 0.1, (r0, r0b)              # shows a later item


def test_directional_navigation_and_activate():
    """ref model: bevy_input_focus directional navigation — arrows move
    focus spatially; Enter toggles the focused checkbox."""
    from bevy_tpu.input import KeyCode

    app = _app()
    ui = app.ui
    left = ui.checkbox(app.world, Style(width=20, height=20, left=20,
                                        top=50))
    right = ui.checkbox(app.world, Style(width=20, height=20, left=120,
                                         top=50))
    below = ui.button(app.world, Style(width=20, height=20, left=120,
                                       top=100))
    hits = []
    ui.on_activate[below] = hits.append
    app.update(dt=1 / 60)

    def press(key):
        app.input.press(key)
        app.update(dt=1 / 60)
        app.input.release(key)
        app.update(dt=1 / 60)

    press(KeyCode.ArrowRight)          # focus first focusable
    assert ui.focused_row == left
    press(KeyCode.ArrowRight)
    assert ui.focused_row == right
    press(KeyCode.ArrowDown)
    assert ui.focused_row == below
    press(KeyCode.Enter)
    assert hits == [below]
    press(KeyCode.ArrowUp)
    assert ui.focused_row == right
    press(KeyCode.Enter)               # toggles the checkbox
    assert int(app.world.get(right, Checked).value) == 1
