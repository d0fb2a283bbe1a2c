"""Themed widget chrome (reference twin: bevy_feathers — design tokens
`src/tokens.rs`, the dark theme `src/dark_theme.rs`, themed controls
under `src/controls/`, and the dynamic style updates feathers applies
on Interaction changes). Tokens resolve to the style subset the UI
renderer supports (colors, paddings, sizes, gaps)."""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp

from bevy_tpu.ecs.component import component, field
from bevy_tpu.ecs.query import Query
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


def make_theme_color_system():
    from bevy_tpu.render.sprite import Sprite
    from bevy_tpu.ui import Interaction

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

    def button(self, ui, world, width=96.0, parent=None, primary=False,
               enabled=True):
        token = "button.primary.bg" if primary else "button.bg"
        row = ui.button(world, Style(
            width=width, height=SIZES["control_h"],
            background=self.color(token)), parent)
        # interaction chrome: hover/pressed/disabled recoloring in-jit
        # (ref: feathers' dynamic style updates)
        world.insert(row, ThemedControl(
            base=self.color(token),
            hover=self.color("button.bg.hover"),
            pressed=self.color("button.bg.pressed"),
            enabled=1 if enabled else 0))
        return row

    def radio(self, ui, world, group, parent=None, checked=False):
        return ui.radio(world, Style(
            width=SIZES["checkbox"], height=SIZES["checkbox"],
            background=self.color("checkbox.bg")), group, parent,
            checked=checked)

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


from bevy_tpu.app.plugin import Plugin


class ThemePlugin(Plugin):
    """Installs the theme resource + the in-jit interaction recolor
    system, and supports runtime theme switching (ref: feathers'
    UiTheme resource + theme-change restyle pass)."""

    def __init__(self, theme: "Theme" = None):
        self.theme = theme or Theme()

    def build(self, app):
        from bevy_tpu.app.main_schedule import Update
        app.world.register_component(ThemedControl)
        app.add_systems(Update, make_theme_color_system(),
                        after="ui_interaction")
        app.theme = self.theme
        self._app = app

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
