"""Themed widget chrome (reference twin: bevy_feathers — design tokens
`src/tokens.rs`, the dark theme `src/dark_theme.rs`, themed controls
under `src/controls/`). Tokens resolve to the style subset the UI
renderer supports (colors, paddings, sizes, gaps)."""

from __future__ import annotations

from typing import Dict

from bevy_tpu.ui import Style

# token names follow the reference's tokens.rs vocabulary
DARK_THEME: Dict[str, tuple] = {
    "window.bg": (0.098, 0.098, 0.110, 1.0),
    "panel.bg": (0.145, 0.145, 0.161, 1.0),
    "button.bg": (0.231, 0.231, 0.263, 1.0),
    "button.bg.hover": (0.282, 0.282, 0.318, 1.0),
    "button.bg.pressed": (0.176, 0.345, 0.639, 1.0),
    "button.primary.bg": (0.216, 0.447, 0.780, 1.0),
    "checkbox.bg": (0.231, 0.231, 0.263, 1.0),
    "checkbox.mark": (0.333, 0.604, 0.937, 1.0),
    "slider.track": (0.196, 0.196, 0.220, 1.0),
    "slider.fill": (0.216, 0.447, 0.780, 1.0),
    "text": (0.882, 0.882, 0.898, 1.0),
    "text.dim": (0.565, 0.565, 0.596, 1.0),
    "input.bg": (0.078, 0.078, 0.086, 1.0),
}

LIGHT_THEME: Dict[str, tuple] = {
    **DARK_THEME,
    "window.bg": (0.92, 0.92, 0.94, 1.0),
    "panel.bg": (0.86, 0.86, 0.88, 1.0),
    "button.bg": (0.78, 0.78, 0.82, 1.0),
    "button.bg.hover": (0.72, 0.72, 0.78, 1.0),
    "text": (0.10, 0.10, 0.12, 1.0),
    "text.dim": (0.40, 0.40, 0.44, 1.0),
    "input.bg": (0.98, 0.98, 1.00, 1.0),
}

SPACING = {"xs": 2.0, "sm": 4.0, "md": 8.0, "lg": 16.0}
SIZES = {"control_h": 24.0, "checkbox": 16.0, "slider_h": 12.0}


class Theme:
    """Resolved token set (ref: ThemeProps / UiTheme resource)."""

    def __init__(self, tokens: Dict[str, tuple] = None):
        self.tokens = dict(DARK_THEME)
        if tokens:
            self.tokens.update(tokens)

    def color(self, token: str) -> tuple:
        return self.tokens[token]

    # -- themed constructors (ref: feathers controls) ---------------------
    def panel(self, ui, world, width, height, parent=None, **kw):
        return ui.spawn_node(world, Style(
            width=width, height=height, padding=SPACING["md"],
            gap=SPACING["sm"], background=self.color("panel.bg"), **kw),
            parent)

    def button(self, ui, world, width=96.0, parent=None, primary=False):
        token = "button.primary.bg" if primary else "button.bg"
        return ui.button(world, Style(
            width=width, height=SIZES["control_h"],
            background=self.color(token)), parent)

    def checkbox(self, ui, world, parent=None, checked=False):
        return ui.checkbox(world, Style(
            width=SIZES["checkbox"], height=SIZES["checkbox"],
            background=self.color("checkbox.bg")), parent, checked=checked)

    def slider(self, ui, world, width=120.0, parent=None, value=0.5):
        return ui.slider(world, Style(
            width=width, height=SIZES["slider_h"],
            background=self.color("slider.track")), parent, value=value)

    def text_input(self, ui, world, font, width=160.0, parent=None, **kw):
        return ui.text_input(world, Style(
            width=width, height=SIZES["control_h"],
            background=self.color("input.bg")), font, parent=parent, **kw)

    def dialog(self, ui, world, width=240.0, height=150.0, modal=True,
               **kw):
        return ui.dialog(world, Style(
            width=width, height=height, padding=SPACING["lg"],
            gap=SPACING["md"], background=self.color("panel.bg"),
            border=1.0, border_color=self.color("button.bg"),
            border_radius=6.0), modal=modal, **kw)

    def menu(self, ui, world, anchor, items, width=140.0, **kw):
        return ui.menu(world, anchor, items, width=width,
                       item_style=lambda: Style(
                           height=SIZES["control_h"] - 2, flex_shrink=0.0,
                           background=self.color("button.bg")), **kw)
