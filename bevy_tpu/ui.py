"""UI (reference twin: bevy_ui — Node style + taffy flexbox layout
`src/layout/mod.rs:68`, ComputedNode, Interaction `src/focus.rs`; and
bevy_ui_widgets' button). Round-1 subset: fixed-size flex rows/columns with
padding/gap, absolute roots, background colors, hover/press interaction.

Layout runs HOST-side on structural change (the reference also solves
layout on CPU via taffy) and writes node transforms; interaction updates
IN-JIT each frame from the mouse resource. UI draws through the sprite
overlay in screen-aligned world units (assumes the default unscaled 2D
camera, 1 unit = 1 px).
"""

from __future__ import annotations

from typing import Dict, List, Optional

import jax.numpy as jnp
import numpy as np

from bevy_tpu.app.main_schedule import PreUpdate
from bevy_tpu.app.plugin import Plugin
from bevy_tpu.ecs.component import component, field
from bevy_tpu.ecs.query import Query, Res
from bevy_tpu.ecs.system import system
from bevy_tpu.render.sprite import Sprite
from bevy_tpu.transform import GlobalTransform, Transform


@component
class UiNode:
    """Computed layout rect (ref: ComputedNode): center + size in UI px."""
    size = field(2)


@component
class Interaction:
    """0 = None, 1 = Hovered, 2 = Pressed (ref: Interaction enum)."""
    state = field((), jnp.int32)


class Style:
    """Host-side node style (ref: Node style fields, taffy subset)."""

    def __init__(self, width=0.0, height=0.0, flex_direction="column",
                 gap=0.0, padding=0.0, left=None, top=None,
                 background=(0.0, 0.0, 0.0, 0.0)):
        self.width = width
        self.height = height
        self.flex_direction = flex_direction
        self.gap = gap
        self.padding = padding
        self.left = left      # absolute position for roots (px from left)
        self.top = top        # px from top
        self.background = background


class _Node:
    def __init__(self, style: Style, row: int):
        self.style = style
        self.row = row
        self.children: List["_Node"] = []


class UiPlugin(Plugin):
    """ref: UiPlugin. `spawn_node`/`button` build the tree; layout re-solves
    on world-structure change."""

    def __init__(self, width=1280, height=720):
        self.width = width
        self.height = height
        self.roots: List[_Node] = []
        self._by_row: Dict[int, _Node] = {}

    def build(self, app):
        self.app = app
        app.world.register_component(UiNode)
        app.world.register_component(Interaction)
        app.world.register_component(Sprite)
        app.add_prepare_hook(lambda world: self._layout(world))
        app.add_systems(PreUpdate, make_interaction_system(
            self.width, self.height))
        app.ui = self

    # -- authoring ------------------------------------------------------
    def spawn_node(self, world, style: Style, parent: Optional[int] = None,
                   interactive=False):
        comps = [
            UiNode(size=(style.width, style.height)),
            Sprite(size=(1.0, 1.0), color=style.background),
            Transform(), GlobalTransform(),
        ]
        if interactive:
            comps.append(Interaction())
        e = world.spawn(*comps)
        node = _Node(style, e.index)
        self._by_row[e.index] = node
        if parent is None:
            self.roots.append(node)
        else:
            self._by_row[parent].children.append(node)
        return e.index

    def button(self, world, style: Style, parent=None):
        """ref: bevy_ui_widgets button — an interactive node."""
        return self.spawn_node(world, style, parent, interactive=True)

    # -- layout (host, ref position: ui_layout_system) -------------------
    def _layout(self, world):
        for root in self.roots:
            x = root.style.left if root.style.left is not None else 0.0
            y = root.style.top if root.style.top is not None else 0.0
            self._place(world, root, x, y)

    def _place(self, world, node: _Node, x, y):
        """(x, y) is the node's top-left in UI px (origin top-left)."""
        s = node.style
        # write world transform: UI px → centered world units, y flip
        wx = x + s.width / 2 - self.width / 2
        wy = self.height / 2 - (y + s.height / 2)
        z = 50.0
        world.insert(node.row,
                     Transform(translation=(wx, wy, z)),
                     GlobalTransform(translation=(wx, wy, z)),
                     UiNode(size=(s.width, s.height)))
        # overwrite sprite size (background rect)
        from bevy_tpu.ecs.component import ComponentInstance, get_spec
        spec = get_spec(Sprite)
        world.insert(node.row, ComponentInstance(spec, {
            "size": np.asarray([s.width, s.height], np.float32),
            "color": np.asarray(s.background, np.float32)}))
        cx = x + s.padding
        cy = y + s.padding
        for child in node.children:
            self._place(world, child, cx, cy)
            if s.flex_direction == "row":
                cx += child.style.width + s.gap
            else:
                cy += child.style.height + s.gap


def make_interaction_system(width, height):
    @system(name="ui_interaction")
    def ui_interaction(q=Query(Interaction, UiNode, Transform),
                       mouse=Res("mouse")):
        # mouse is in screen px (origin top-left); nodes in centered world
        mx = mouse.position[0] - width / 2
        my = height / 2 - mouse.position[1]
        t = q.transform.translation
        half = q.ui_node.size * 0.5
        inside = (jnp.abs(mx - t[:, 0]) <= half[:, 0]) & \
                 (jnp.abs(my - t[:, 1]) <= half[:, 1])
        pressed = mouse.pressed[0]
        state = jnp.where(inside, jnp.where(pressed, 2, 1), 0)
        q.interaction.state = jnp.where(q.mask, state, q.interaction.state)

    return ui_interaction
