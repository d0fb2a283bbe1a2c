"""Themed widget chrome (reference twin: bevy_feathers — design tokens
`src/tokens.rs`, the dark theme `src/dark_theme.rs`, themed controls
under `src/controls/` (button/checkbox/radio/slider/scrollbar/
toggle_switch/text_input/listview/dialog/menu), cursor feedback
`src/cursor.rs` and focus rings `src/focus.rs`). Tokens resolve to the
style subset the UI renderer supports (colors, paddings, sizes, gaps);
control *state* chrome (hover/pressed/checked/focus/value) updates
in-jit through sprite columns — no relayout or retrace per frame."""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp

from bevy_tpu.ecs.component import component, field
from bevy_tpu.ecs.query import Query, Res
from bevy_tpu.ecs.system import system
from bevy_tpu.ui import Style


@component
class ThemedControl:
    """Interaction-state color triplet (ref: feathers' control chrome —
    hover/pressed restyling driven by Interaction). The in-jit theme
    system selects base/hover/pressed each frame; a host-side theme
    switch rewrites these columns (see ThemePlugin.set_theme)."""
    base = field(4, default=(0.23, 0.23, 0.26, 1.0))
    hover = field(4, default=(0.28, 0.28, 0.32, 1.0))
    pressed = field(4, default=(0.18, 0.35, 0.64, 1.0))
    disabled = field(4, default=(0.16, 0.16, 0.18, 0.6))
    enabled = field((), jnp.int32, default=1)


@component
class CheckedChrome:
    """Checked-state color pair for toggle-like controls (ref: feathers
    checkbox.bg.checked / switch.bg.checked tokens). Applied after the
    interaction triplet so `checked` wins over `base`."""
    checked = field(4, default=(0.216, 0.447, 0.780, 1.0))
    checked_hover = field(4, default=(0.28, 0.52, 0.85, 1.0))


def make_theme_color_system():
    from bevy_tpu.render.sprite import Sprite
    from bevy_tpu.ui import Checked, Interaction

    @system(name="ui_theme_colors")
    def ui_theme_colors(q=Query(Sprite, ThemedControl, Interaction)):
        st = q.interaction.state
        col = jnp.where((st == 2)[:, None], q.themed_control.pressed,
                        jnp.where((st == 1)[:, None],
                                  q.themed_control.hover,
                                  q.themed_control.base))
        col = jnp.where((q.themed_control.enabled > 0)[:, None], col,
                        q.themed_control.disabled)
        q.sprite.color = jnp.where(q.mask[:, None], col, q.sprite.color)

    return ui_theme_colors


def make_checked_chrome_system():
    from bevy_tpu.render.sprite import Sprite
    from bevy_tpu.ui import Checked, Interaction

    @system(name="ui_checked_chrome")
    def ui_checked_chrome(q=Query(Sprite, CheckedChrome, Checked,
                                  Interaction)):
        on = (q.checked.value > 0) & q.mask
        hov = q.interaction.state >= 1
        col = jnp.where(hov[:, None], q.checked_chrome.checked_hover,
                        q.checked_chrome.checked)
        q.sprite.color = jnp.where(on[:, None], col, q.sprite.color)

    return ui_checked_chrome


# token names follow the reference's tokens.rs vocabulary
# (ref: bevy_feathers/src/tokens.rs — 209 tokens; this is the subset the
# renderer's style model distinguishes, same naming scheme)
DARK_THEME: Dict[str, tuple] = {
    "window.bg": (0.098, 0.098, 0.110, 1.0),
    "focus.ring": (0.333, 0.604, 0.937, 0.9),
    "panel.bg": (0.145, 0.145, 0.161, 1.0),
    "text": (0.882, 0.882, 0.898, 1.0),
    "text.dim": (0.565, 0.565, 0.596, 1.0),
    "button.bg": (0.231, 0.231, 0.263, 1.0),
    "button.bg.hover": (0.282, 0.282, 0.318, 1.0),
    "button.bg.pressed": (0.176, 0.345, 0.639, 1.0),
    "button.bg.disabled": (0.16, 0.16, 0.18, 0.6),
    "button.primary.bg": (0.216, 0.447, 0.780, 1.0),
    "button.primary.bg.hover": (0.27, 0.51, 0.85, 1.0),
    "button.primary.bg.pressed": (0.16, 0.36, 0.66, 1.0),
    "button.plain.bg": (0.0, 0.0, 0.0, 0.0),
    "button.plain.bg.hover": (0.282, 0.282, 0.318, 0.5),
    "checkbox.bg": (0.231, 0.231, 0.263, 1.0),
    "checkbox.bg.checked": (0.216, 0.447, 0.780, 1.0),
    "checkbox.bg.checked.hover": (0.27, 0.51, 0.85, 1.0),
    "checkbox.mark": (0.95, 0.95, 0.97, 1.0),
    "radio.bg": (0.231, 0.231, 0.263, 1.0),
    "radio.mark": (0.333, 0.604, 0.937, 1.0),
    "switch.bg": (0.231, 0.231, 0.263, 1.0),
    "switch.bg.checked": (0.216, 0.447, 0.780, 1.0),
    "switch.bg.checked.hover": (0.27, 0.51, 0.85, 1.0),
    "switch.knob": (0.88, 0.88, 0.90, 1.0),
    "slider.track": (0.196, 0.196, 0.220, 1.0),
    "slider.fill": (0.216, 0.447, 0.780, 1.0),
    "slider.thumb": (0.88, 0.88, 0.90, 1.0),
    "scrollbar.bg": (0.12, 0.12, 0.135, 1.0),
    "scrollbar.thumb": (0.33, 0.33, 0.37, 1.0),
    "scrollbar.thumb.hover": (0.42, 0.42, 0.47, 1.0),
    "input.bg": (0.078, 0.078, 0.086, 1.0),
    "textinput.cursor": (0.333, 0.604, 0.937, 1.0),
    "textinput.selection": (0.216, 0.447, 0.780, 0.45),
    "listrow.bg": (0.0, 0.0, 0.0, 0.0),
    "listrow.bg.hover": (0.22, 0.22, 0.25, 1.0),
    "listrow.bg.selected": (0.176, 0.345, 0.639, 1.0),
    "dialog.bg": (0.145, 0.145, 0.161, 1.0),
    "dialog.border": (0.231, 0.231, 0.263, 1.0),
    "dialog.header.bg": (0.12, 0.12, 0.135, 1.0),
}

LIGHT_THEME: Dict[str, tuple] = {
    **DARK_THEME,
    "window.bg": (0.92, 0.92, 0.94, 1.0),
    "panel.bg": (0.86, 0.86, 0.88, 1.0),
    "text": (0.10, 0.10, 0.12, 1.0),
    "text.dim": (0.40, 0.40, 0.44, 1.0),
    "button.bg": (0.78, 0.78, 0.82, 1.0),
    "button.bg.hover": (0.72, 0.72, 0.78, 1.0),
    "button.bg.disabled": (0.82, 0.82, 0.85, 0.6),
    "checkbox.bg": (0.78, 0.78, 0.82, 1.0),
    "radio.bg": (0.78, 0.78, 0.82, 1.0),
    "switch.bg": (0.74, 0.74, 0.78, 1.0),
    "switch.knob": (0.99, 0.99, 1.0, 1.0),
    "slider.track": (0.74, 0.74, 0.78, 1.0),
    "scrollbar.bg": (0.82, 0.82, 0.85, 1.0),
    "scrollbar.thumb": (0.62, 0.62, 0.66, 1.0),
    "input.bg": (0.98, 0.98, 1.00, 1.0),
    "listrow.bg.hover": (0.80, 0.80, 0.84, 1.0),
    "dialog.bg": (0.90, 0.90, 0.92, 1.0),
    "dialog.header.bg": (0.82, 0.82, 0.85, 1.0),
}

SPACING = {"xs": 2.0, "sm": 4.0, "md": 8.0, "lg": 16.0}
SIZES = {"control_h": 24.0, "checkbox": 16.0, "slider_h": 12.0,
         "switch_w": 36.0, "switch_h": 18.0, "scrollbar_w": 6.0}


class Theme:
    """Resolved token set (ref: ThemeProps / UiTheme resource)."""

    def __init__(self, tokens: Dict[str, tuple] = None):
        self.tokens = dict(DARK_THEME)
        if tokens:
            self.tokens.update(tokens)

    def color(self, token: str) -> tuple:
        return self.tokens[token]

    # -- themed constructors (ref: feathers controls/) --------------------
    def panel(self, ui, world, width, height, parent=None, **kw):
        return ui.spawn_node(world, Style(
            width=width, height=height, padding=SPACING["md"],
            gap=SPACING["sm"], background=self.color("panel.bg"), **kw),
            parent)

    def button(self, ui, world, width=96.0, parent=None, primary=False,
               plain=False, enabled=True):
        token = "button.primary.bg" if primary else \
            ("button.plain.bg" if plain else "button.bg")
        row = ui.button(world, Style(
            width=width, height=SIZES["control_h"],
            background=self.color(token)), parent)
        hov = "button.primary.bg.hover" if primary else \
            ("button.plain.bg.hover" if plain else "button.bg.hover")
        prs = "button.primary.bg.pressed" if primary else \
            "button.bg.pressed"
        # interaction chrome: hover/pressed/disabled recoloring in-jit
        # (ref: feathers' dynamic style updates)
        world.insert(row, ThemedControl(
            base=self.color(token), hover=self.color(hov),
            pressed=self.color(prs),
            disabled=self.color("button.bg.disabled"),
            enabled=1 if enabled else 0))
        return row

    def radio(self, ui, world, group, parent=None, checked=False):
        row = ui.radio(world, Style(
            width=SIZES["checkbox"], height=SIZES["checkbox"],
            background=self.color("radio.bg"), border_radius=8.0),
            group, parent, checked=checked)
        world.insert(row, CheckedChrome(
            checked=self.color("radio.mark"),
            checked_hover=self.color("radio.mark")))
        return row

    def checkbox(self, ui, world, parent=None, checked=False):
        row = ui.checkbox(world, Style(
            width=SIZES["checkbox"], height=SIZES["checkbox"],
            background=self.color("checkbox.bg")), parent,
            checked=checked)
        world.insert(row, CheckedChrome(
            checked=self.color("checkbox.bg.checked"),
            checked_hover=self.color("checkbox.bg.checked.hover")))
        return row

    def toggle_switch(self, ui, world, parent=None, checked=False):
        """Sliding toggle (ref: feathers controls/toggle_switch.rs):
        a Checked pill whose knob slides off↔on in-jit."""
        from bevy_tpu.render.sprite import Sprite as _Sprite
        from bevy_tpu.transform import GlobalTransform as _GT
        from bevy_tpu.transform import Transform as _T

        w, h = SIZES["switch_w"], SIZES["switch_h"]
        row = ui.checkbox(world, Style(
            width=w, height=h, background=self.color("switch.bg"),
            border_radius=h / 2), parent, checked=checked)
        world.insert(row, CheckedChrome(
            checked=self.color("switch.bg.checked"),
            checked_hover=self.color("switch.bg.checked.hover")))
        # knob sprite rides above the pill; x set in-jit from Checked
        knob = world.spawn(
            _Sprite(size=(h - 4.0, h - 4.0),
                    color=self.color("switch.knob")),
            _T(), _GT())
        getattr(ui, '_chrome_knobs', None) is None and \
            setattr(ui, '_chrome_knobs', [])
        ui._chrome_knobs.append((knob.index, row, w, h))
        return row

    def slider(self, ui, world, width=120.0, parent=None, value=0.5):
        """Track + in-jit fill bar (ref: feathers controls/slider.rs)."""
        from bevy_tpu.render.sprite import Sprite as _Sprite
        from bevy_tpu.transform import GlobalTransform as _GT
        from bevy_tpu.transform import Transform as _T

        row = ui.slider(world, Style(
            width=width, height=SIZES["slider_h"],
            background=self.color("slider.track")), parent, value=value)
        fill = world.spawn(
            _Sprite(size=(max(value, 0.01) * width, SIZES["slider_h"] - 4),
                    color=self.color("slider.fill")),
            _T(), _GT())
        getattr(ui, '_chrome_fills', None) is None and \
            setattr(ui, '_chrome_fills', [])
        ui._chrome_fills.append((fill.index, row, float(width)))
        return row

    def scroll_area(self, ui, world, style: Style, parent=None,
                    content_h=None):
        """Scroll container + scrollbar thumb chrome (ref: feathers
        controls/scrollbar.rs)."""
        from bevy_tpu.render.sprite import Sprite as _Sprite
        from bevy_tpu.transform import GlobalTransform as _GT
        from bevy_tpu.transform import Transform as _T

        area = ui.scroll_area(world, style, parent)
        h = style.height if isinstance(style.height, (int, float)) else 100
        ch = content_h or 2 * h
        thumb_h = max(h * h / max(ch, 1.0), 12.0)
        thumb = world.spawn(
            _Sprite(size=(SIZES["scrollbar_w"], thumb_h),
                    color=self.color("scrollbar.thumb")),
            _T(), _GT())
        getattr(ui, '_chrome_thumbs', None) is None and \
            setattr(ui, '_chrome_thumbs', [])
        ui._chrome_thumbs.append(
            (thumb.index, area, float(h), float(thumb_h),
             float(max(ch - h, 1.0))))
        return area

    def listview(self, ui, world, style: Style, rows, parent=None):
        """Hoverable list rows (ref: feathers controls/listview.rs)."""
        area = self.scroll_area(ui, world, style, parent,
                                content_h=len(rows) * 24.0)
        out = []
        for label in rows:
            r = ui.button(world, Style(
                height=22.0, flex_shrink=0.0,
                background=self.color("listrow.bg")), parent=area)
            world.insert(r, ThemedControl(
                base=self.color("listrow.bg"),
                hover=self.color("listrow.bg.hover"),
                pressed=self.color("listrow.bg.selected")))
            out.append(r)
        return area, out

    def text_input(self, ui, world, font, width=160.0, parent=None, **kw):
        return ui.text_input(world, Style(
            width=width, height=SIZES["control_h"],
            background=self.color("input.bg")), font, parent=parent, **kw)

    def dialog(self, ui, world, width=240.0, height=150.0, modal=True,
               **kw):
        return ui.dialog(world, Style(
            width=width, height=height, padding=SPACING["lg"],
            gap=SPACING["md"], background=self.color("dialog.bg"),
            border=1.0, border_color=self.color("dialog.border"),
            border_radius=6.0), modal=modal, **kw)

    def menu(self, ui, world, anchor, items, width=140.0, **kw):
        return ui.menu(world, anchor, items, width=width,
                       item_style=lambda: Style(
                           height=SIZES["control_h"] - 2, flex_shrink=0.0,
                           background=self.color("button.bg")), **kw)


from bevy_tpu.app.plugin import Plugin


class ThemePlugin(Plugin):
    """Installs the theme resource + the in-jit chrome systems (colors,
    checked states, slider fills, switch knobs, scrollbar thumbs), a
    focus ring, cursor feedback, and runtime theme switching (ref:
    feathers' UiTheme resource + theme-change restyle pass, focus.rs,
    cursor.rs)."""

    def __init__(self, theme: "Theme" = None):
        self.theme = theme or Theme()

    def build(self, app):
        from bevy_tpu.app.main_schedule import Update
        app.world.register_component(ThemedControl)
        app.world.register_component(CheckedChrome)
        app.add_systems(Update, make_theme_color_system(),
                        after="ui_interaction")
        app.add_systems(Update, make_checked_chrome_system(),
                        after="ui_theme_colors")
        app.theme = self.theme
        self._app = app
        ui = getattr(app, "ui", None)
        if ui is not None and not hasattr(ui, "_chrome_fills"):
            from bevy_tpu.render.sprite import Sprite as _Sprite
            from bevy_tpu.transform import GlobalTransform as _GT
            from bevy_tpu.transform import Transform as _T
            ui._chrome_fills = []
            ui._chrome_thumbs = []
            ui._chrome_knobs = []
            ui._focus_ring = app.world.spawn(
                _Sprite(size=(1.0, 1.0), color=(0, 0, 0, 0)),
                _T(), _GT()).index
            # chrome placement reads in-jit state (Checked, SliderValue,
            # focus) every frame — a prepare hook would only re-run on
            # structure changes and miss pure state toggles
            app.add_prepare_hook(lambda world: self._chrome_tick(world))
            app.add_frame_hook(lambda a: self._chrome_tick(a.world))
        # cursor feedback (ref: cursor.rs): hovered interactive control →
        # pointer icon; a host viewer maps the name to an OS cursor
        app.cursor_icon = "default"

    # -- host-side chrome placement (positions come from layout, which
    # is host-side; colors/hover animate in-jit via sprite columns) ----
    def _chrome_tick(self, world):
        from bevy_tpu.render.sprite import Sprite
        from bevy_tpu.transform import GlobalTransform, Transform
        from bevy_tpu.ui import Checked, ScrollPosition, SliderValue

        ui = self._app.ui

        def place(row, x, y, z=60.0):
            wx = x - ui.width / 2
            wy = ui.height / 2 - y
            world.set_field(row, Transform, "translation", (wx, wy, z))
            world.set_field(row, GlobalTransform, "translation",
                            (wx, wy, z))

        # cursor feedback (ref: cursor.rs): pointer over any interactive
        # rect → "pointer"; the host viewer maps the name to an OS cursor
        mx, my = self._app.input.mouse_pos
        icon = "default"
        for row in ui.focusables:
            r = ui._rects.get(row)
            if r and r[0] <= mx < r[0] + r[2] and r[1] <= my < r[1] + r[3]:
                icon = "pointer"
                break
        self._app.cursor_icon = icon

        for fill, track, width in ui._chrome_fills:
            r = ui._rects.get(track)
            if r is None:
                continue
            x, y, w, h = r
            v = float(world.get(track, SliderValue).value)
            fw = max(v * width, 0.01)
            world.set_field(fill, Sprite, "size", (fw, h - 4.0))
            place(fill, x + fw / 2, y + h / 2)
        for knob, row, w, h in ui._chrome_knobs:
            r = ui._rects.get(row)
            if r is None:
                continue
            x, y, _, _ = r
            on = int(world.get(row, Checked).value) > 0
            kx = x + (w - h / 2 - 2.0 if on else h / 2 + 2.0)
            place(knob, kx, y + h / 2)
        for thumb, area, h, th, max_scroll in ui._chrome_thumbs:
            r = ui._rects.get(area)
            if r is None:
                continue
            x, y, w, _ = r
            off = float(world.get(area, ScrollPosition).offset[1])
            f = min(max(off / max_scroll, 0.0), 1.0)
            place(thumb, x + w - SIZES["scrollbar_w"] / 2,
                  y + th / 2 + f * (h - th))
        # focus ring (ref: focus.rs): an outline sprite snaps to the
        # focused control's rect
        ring = getattr(ui, "_focus_ring", None)
        frow = ui.focused_row
        if ring is not None:
            r = ui._rects.get(frow) if frow is not None else None
            if r is None:
                world.set_field(ring, Sprite, "color", (0, 0, 0, 0))
            else:
                x, y, w, h = r
                world.set_field(ring, Sprite, "color",
                                self.theme.color("focus.ring"))
                world.set_field(ring, Sprite, "size", (w + 4.0, h + 4.0))
                place(ring, x + w / 2, y + h / 2, z=49.5)

    def set_theme(self, tokens: Dict[str, tuple]):
        """Switch token sets at runtime: rewrites every ThemedControl's
        color columns host-side (structural restyle, like feathers'
        theme swap)."""
        self.theme.tokens.update(tokens)
        world = self._app.world
        for row in world.query_rows(ThemedControl):
            for name, token in (("base", "button.bg"),
                                ("hover", "button.bg.hover"),
                                ("pressed", "button.bg.pressed")):
                world.set_field(int(row), ThemedControl, name,
                                self.theme.color(token))
