"""UI (reference twin: bevy_ui — Node style + taffy flexbox/grid layout
`src/layout/mod.rs:68`, ComputedNode, Interaction `src/focus.rs`; widgets
after bevy_ui_widgets' button/checkbox/radio/slider/scrollarea).

Layout runs HOST-side on structural change through the native C++ solver
(`bevy_tpu/native/flexbox.cpp`, the taffy equivalent) and writes node
transforms; interaction and widget state update IN-JIT each frame from
the mouse resource. UI draws through the sprite overlay in
screen-aligned world units (assumes the default unscaled 2D camera,
1 unit = 1 px). Scroll containers clip children host-side by shrinking
their background rects to the visible intersection (axis-aligned rects
make exact clipping a rect intersection — no scissor kernel needed).
"""

from __future__ import annotations

from typing import Dict, List, Optional

import jax.numpy as jnp
import numpy as np

from bevy_tpu.app.main_schedule import PreUpdate, Update
from bevy_tpu.app.plugin import Plugin
from bevy_tpu.ecs.component import component, field
from bevy_tpu.ecs.query import Query, Res
from bevy_tpu.ecs.system import system
from bevy_tpu.native import layout as nl
from bevy_tpu.render.sprite import Sprite
from bevy_tpu.transform import GlobalTransform, Transform

_DIRS = {"row": nl.ROW, "column": nl.COLUMN,
         "row_reverse": nl.ROW_REVERSE, "column_reverse": nl.COLUMN_REVERSE}
_JUSTIFY = {"start": nl.START, "end": nl.END, "center": nl.CENTER,
            "space_between": nl.SPACE_BETWEEN, "space_around": nl.SPACE_AROUND,
            "space_evenly": nl.SPACE_EVENLY}
_ALIGN = {"auto": nl.ALIGN_AUTO, "start": nl.ALIGN_START, "end": nl.ALIGN_END,
          "center": nl.ALIGN_CENTER, "stretch": nl.ALIGN_STRETCH}
_DISPLAY = {"flex": nl.FLEX, "grid": nl.GRID, "none": nl.NONE}


@component
class UiNode:
    """Computed layout rect (ref: ComputedNode): size in UI px.
    `active` gates interaction — 0 while the node is hidden (closed
    overlay) or blocked by an open modal (ref: ui_widgets modal focus
    capture + InteractionDisabled)."""
    size = field(2)
    active = field((), jnp.int32, default=1)


@component
class Interaction:
    """0 = None, 1 = Hovered, 2 = Pressed (ref: Interaction enum)."""
    state = field((), jnp.int32)


@component
class UiParent:
    """UI-tree parent link mirrored into the ECS so pointer events bubble
    through observers (ref: the ChildOf-instance of the generic Traversal
    relationship; the UI tree keeps its own link type because UI layout
    positions are solved flat, not through transform propagation)."""
    parent = field((), jnp.int32, entity_ref=True)


from bevy_tpu.ecs.observer import Trigger as _Trigger, event as _event  # noqa: E402


@_event
class UiPointerClick:
    """Press began over a UI node (ref: the bubbled Pointer<Pressed>
    entity event bevy_ui_widgets builds on). Observe with
    On(UiPointerClick, bubble=True, via=UiParent): a handler on any
    UI-tree ancestor sees clicks on its descendants."""
    row = field((), jnp.int32)


@component
class Checked:
    """Checkbox/radio state (ref: bevy_ui_widgets Checked)."""
    value = field((), jnp.int32)
    group = field((), jnp.int32)        # radio group id; -1 = checkbox


@component
class SliderValue:
    """Slider 0..1 value + drag-capture flag (ref: ui_widgets slider)."""
    value = field((), jnp.float32)
    dragging = field((), jnp.int32)


@component
class ScrollPosition:
    """Scroll offset in px (ref: bevy_ui ScrollPosition)."""
    offset = field(2)


@component
class VirtualListRow:
    """One recycled row of a virtual list (ref: ui_widgets virtual
    list — a fixed set of row entities windows over a large logical
    list; contents reindex in-jit from the scroll offset)."""
    slot = field((), jnp.int32)
    list_id = field((), jnp.int32)


@component
class TextInputSlot:
    """One glyph slot of a text input (ref: ui_widgets text_input —
    glyphs update in-jit from a host-edited code array, like DigitText)."""
    slot = field((), jnp.int32)
    input_id = field((), jnp.int32)


class Style:
    """Host-side node style (ref: bevy_ui Node fields / taffy style).

    Sizes (`width`/`height`/`min_*`/`max_*`/`flex_basis`) accept a number
    (px), "auto"/None, or the `(value, unit)` pairs from
    `bevy_tpu.native.layout` (`px()`, `pct()`, `fr()` for grid tracks).
    """

    def __init__(self, width=None, height=None, flex_direction="column",
                 gap=0.0, padding=0.0, margin=0.0, left=None, top=None,
                 right=None, bottom=None, background=(0.0, 0.0, 0.0, 0.0),
                 display="flex", position="relative", flex_wrap=False,
                 justify_content="start", align_items="auto",
                 align_self="auto", align_content="start",
                 flex_grow=0.0, flex_shrink=1.0, flex_basis=None,
                 min_width=None, min_height=None, max_width=None,
                 max_height=None, content_size=(0.0, 0.0),
                 grid_cols=None, grid_rows=None, grid_col=0,
                 grid_col_span=1, grid_row=0, grid_row_span=1,
                 overflow="visible", border=0.0,
                 border_color=(0.0, 0.0, 0.0, 1.0), border_radius=0.0,
                 gradient=None, box_shadow=None, material=None,
                 material_key=None):
        self.width = width
        self.height = height
        self.flex_direction = flex_direction
        self.gap = gap
        self.padding = padding
        self.margin = margin
        self.left, self.top, self.right, self.bottom = left, top, right, bottom
        self.background = background
        self.display = display
        self.position = position
        self.flex_wrap = flex_wrap
        self.justify_content = justify_content
        self.align_items = align_items
        self.align_self = align_self
        self.align_content = align_content
        self.flex_grow = flex_grow
        self.flex_shrink = flex_shrink
        self.flex_basis = flex_basis
        self.min_width, self.min_height = min_width, min_height
        self.max_width, self.max_height = max_width, max_height
        self.content_size = content_size
        # decorations (ref: bevy_ui border/border_radius/gradients/
        # box_shadow) — baked to atlas textures at layout time
        self.border = border
        self.border_color = border_color
        self.border_radius = border_radius
        self.gradient = gradient        # (c0, c1, "vertical"|"horizontal")
        self.box_shadow = box_shadow    # (dx, dy, blur, rgba)
        # UI material (ref: bevy_ui_render ui_material.rs — a custom
        # shader over the node rect): `material(u, v, size) -> (h,w,4)`
        # with u/v (h,w) grids in [0,1]; baked at layout time, composed
        # with border ring + rounded-corner AA. `material_key` makes the
        # bake cacheable across nodes sharing one material.
        self.material = material
        self.material_key = material_key
        self.grid_cols, self.grid_rows = grid_cols, grid_rows
        self.grid_col, self.grid_col_span = grid_col, grid_col_span
        self.grid_row, self.grid_row_span = grid_row, grid_row_span
        self.overflow = overflow            # "visible" | "clip" | "scroll"

    def to_native(self) -> nl.NodeStyle:
        pos = nl.ABSOLUTE if self.position == "absolute" else nl.RELATIVE
        # legacy API: roots given left/top stay in-flow at that offset
        return nl.make_style(
            display=_DISPLAY[self.display], position=pos,
            flex_direction=_DIRS[self.flex_direction],
            flex_wrap=self.flex_wrap,
            justify_content=_JUSTIFY[self.justify_content],
            align_items=_ALIGN[self.align_items],
            align_self=_ALIGN[self.align_self],
            align_content=_JUSTIFY[self.align_content],
            flex_grow=self.flex_grow, flex_shrink=self.flex_shrink,
            flex_basis=self.flex_basis, width=self.width, height=self.height,
            min_width=self.min_width, min_height=self.min_height,
            max_width=self.max_width, max_height=self.max_height,
            padding=self.padding, margin=self.margin,
            left=self.left, top=self.top, right=self.right,
            bottom=self.bottom, gap=self.gap, content_size=self.content_size,
            grid_cols=self.grid_cols, grid_rows=self.grid_rows,
            grid_col=self.grid_col, grid_col_span=self.grid_col_span,
            grid_row=self.grid_row, grid_row_span=self.grid_row_span)


class _Node:
    def __init__(self, style: Style, row: int):
        self.style = style
        self.row = row
        self.children: List["_Node"] = []
        self.parent: Optional["_Node"] = None


def _rounded_dist(w, h, radius):
    """Signed distance (px) to a w x h rounded rect, negative inside."""
    r = float(min(radius, min(w, h) / 2))
    yy, xx = np.mgrid[0:int(np.ceil(h)), 0:int(np.ceil(w))]
    px = xx + 0.5
    py = yy + 0.5
    dx = np.abs(px - w / 2) - (w / 2 - r)
    dy = np.abs(py - h / 2) - (h / 2 - r)
    outer = np.hypot(np.maximum(dx, 0), np.maximum(dy, 0))
    inner = np.minimum(np.maximum(dx, dy), 0.0)
    return outer + inner - r


def _bake_node_texture(w, h, s):
    """Rounded-rect fill (+gradient) + border ring, antialiased (ref:
    bevy_ui_render rounded-box SDF shading — done as a host bake)."""
    dist = _rounded_dist(w, h, s.border_radius)
    hh, ww = dist.shape
    if s.material is not None:
        v, u = np.mgrid[0:hh, 0:ww].astype(np.float32)
        u = (u + 0.5) / max(ww, 1)
        v = (v + 0.5) / max(hh, 1)
        fill = np.asarray(s.material(u, v, (w, h)), np.float32)
        if fill.shape != (hh, ww, 4):
            fill = np.broadcast_to(fill, (hh, ww, 4)).copy()
    elif s.gradient is not None:
        c0, c1, axis = s.gradient
        t = (np.mgrid[0:hh, 0:ww][0] / max(hh - 1, 1)) \
            if axis == "vertical" else \
            (np.mgrid[0:hh, 0:ww][1] / max(ww - 1, 1))
        fill = (np.asarray(c0, np.float32)[None, None] * (1 - t[..., None])
                + np.asarray(c1, np.float32)[None, None] * t[..., None])
    else:
        fill = np.broadcast_to(np.asarray(s.background, np.float32),
                               (hh, ww, 4)).copy()
    if s.border > 0:
        ring = dist > -float(s.border)
        fill = np.where(ring[..., None],
                        np.asarray(s.border_color, np.float32), fill)
    aa = np.clip(0.5 - dist, 0.0, 1.0)
    out = fill.astype(np.float32)
    out[..., 3] = out[..., 3] * aa
    return out


def _bake_shadow_texture(w, h, radius, blur, color):
    """Blurred rounded-rect silhouette (ref: bevy_ui box_shadow)."""
    pad = int(np.ceil(blur * 2))
    dist = _rounded_dist(w + 2 * pad, h + 2 * pad, radius + pad) + pad
    sigma = max(blur, 1.0) * 0.6
    alpha = np.where(dist <= 0, 1.0, np.exp(-(dist / sigma) ** 2))
    out = np.broadcast_to(np.asarray(color, np.float32),
                          dist.shape + (4,)).copy()
    out[..., 3] = out[..., 3] * alpha
    return out.astype(np.float32), pad


class UiPlugin(Plugin):
    """ref: UiPlugin. `spawn_node`/widget helpers build the tree; layout
    re-solves on world-structure change via the native flexbox solver."""

    def __init__(self, width=1280, height=720, atlas_builder=None):
        # atlas_builder: share the app's AtlasBuilder when node
        # decorations (border radius/border/gradient/shadow) must pack
        # into the same TextureAtlas as fonts/sprites
        self.width = width
        self.height = height
        self._builder = atlas_builder
        self.roots: List[_Node] = []
        self._by_row: Dict[int, _Node] = {}

    def build(self, app):
        from bevy_tpu.ecs.observer import register_event_storage
        self.app = app
        for c in (UiNode, Interaction, Checked, SliderValue, ScrollPosition,
                  TextInputSlot, VirtualListRow, Sprite, UiParent):
            app.world.register_component(c)
        register_event_storage(app.world, UiPointerClick, 8)
        # scroll baking: row arrays rebuilt by _layout; the systems read
        # them at trace time (structure change → re-layout → retrace)
        self._clip_rows = np.zeros(0, np.int32)
        self._clip_anchor = np.zeros(0, np.int32)
        self._clip_base = np.zeros((0, 4), np.float32)   # cx, cy, w, h
        self._clip_rect = np.zeros((0, 4), np.float32)   # x0, y0, x1, y1
        self._scroll_rows = np.zeros(0, np.int32)
        self._scroll_max = np.zeros(0, np.float32)
        # text input + focus (host-side editing; see text_input)
        self._text_inputs = []
        self._virtual_lists = []
        self._deco_handles = {}       # bake cache: key → atlas handle
        self._shadow_rows = {}        # node row → shadow sprite row
        self._atlas_dirty = False
        self._next_list_id = 0
        # directional navigation (ref: bevy_input_focus directional +
        # bevy_ui auto_directional_navigation): arrow keys move
        # `focused_row` between interactive nodes by spatial position
        self.focusables = []          # rows of interactive nodes
        self.focused_row = None
        self.on_activate = {}         # row → callback (Enter/Space)
        self.focus = None            # focused text-input id
        self._rects = {}             # row → (x, y, w, h) from layout
        self._prev_keys = None
        self._prev_mouse = False
        # overlays (ref: bevy_ui_widgets dialog/modal/popover/menu)
        self._overlays = []          # creation order; later = on top
        self._node_color = {}        # row → shown sprite color
        self._inactive_rows = set()  # hidden/modal-blocked (host mirror)
        app.add_prepare_hook(lambda world: self._layout(world))
        app.add_frame_hook(_ui_host_tick_for(self))
        app.add_systems(PreUpdate, make_interaction_system(
            self.width, self.height), make_ui_pointer_system(
            self.width, self.height))
        app.add_systems(Update, _checkbox_system,
                        make_slider_system(self.width),
                        make_scroll_system(self))
        app.ui = self

    # -- authoring ------------------------------------------------------
    def spawn_node(self, world, style: Style, parent: Optional[int] = None,
                   interactive=False, extra_components=()):
        comps = [
            UiNode(size=(0.0, 0.0)),
            Sprite(size=(1.0, 1.0), color=style.background),
            Transform(), GlobalTransform(),
        ]
        if interactive:
            comps.append(Interaction())
        comps.extend(extra_components)
        if parent is not None:
            comps.append(UiParent(parent=int(parent)))
        e = world.spawn(*comps)
        node = _Node(style, e.index)
        if interactive:
            self.focusables.append(e.index)
        self._by_row[e.index] = node
        if parent is None:
            self.roots.append(node)
        else:
            node.parent = self._by_row[parent]
            self._by_row[parent].children.append(node)
        return e.index

    def button(self, world, style: Style, parent=None):
        """ref: bevy_ui_widgets button — an interactive node."""
        return self.spawn_node(world, style, parent, interactive=True)

    def image(self, world, style: Style, handle, parent=None):
        """Image node (ref: bevy_ui widget/image.rs — ImageNode): shows
        an atlas texture handle; the node rect scales it."""
        row = self.spawn_node(world, style, parent)
        self._by_row[row].image = handle
        return row

    def checkbox(self, world, style: Style, parent=None, checked=False):
        """Toggles on click release (ref: ui_widgets checkbox)."""
        return self.spawn_node(
            world, style, parent, interactive=True,
            extra_components=[Checked(value=int(checked), group=-1)])

    def radio(self, world, style: Style, group: int, parent=None,
              checked=False):
        """Radio button: checking one clears others in `group`."""
        return self.spawn_node(
            world, style, parent, interactive=True,
            extra_components=[Checked(value=int(checked), group=group)])

    def slider(self, world, style: Style, parent=None, value=0.0):
        """Horizontal slider; drag sets value 0..1 across its width."""
        return self.spawn_node(
            world, style, parent, interactive=True,
            extra_components=[SliderValue(value=float(value), dragging=0)])

    def scroll_area(self, world, style: Style, parent=None):
        """Scroll container: wheel scrolls content; children clip to it."""
        style.overflow = "scroll"
        return self.spawn_node(
            world, style, parent, interactive=True,
            extra_components=[ScrollPosition(offset=(0.0, 0.0))])

    def virtual_list(self, world, style: Style, item_colors, row_height,
                     parent=None, visible_rows=None):
        """Virtual list: a fixed set of recycled row entities windowing
        a large (M, 4) color array; the wheel scrolls the window by
        reindexing in-jit — no structural change however long the list
        (ref: bevy_ui_widgets virtual list)."""
        style.overflow = "scroll"
        h = style.height if isinstance(style.height, (int, float)) else 100
        vis = visible_rows or max(int(h // row_height), 1)
        data = jnp.asarray(np.asarray(item_colors, np.float32))
        m = data.shape[0]
        area = self.spawn_node(
            world, style, parent, interactive=True,
            extra_components=[ScrollPosition(offset=(0.0, 0.0))])
        lid = self._next_list_id
        self._next_list_id += 1
        rows = []
        for s in range(vis):
            rows.append(self.spawn_node(
                world, Style(height=row_height - 2, flex_shrink=0.0,
                             background=(0.5, 0.5, 0.5, 1.0)),
                parent=area))
            world.insert(rows[-1], VirtualListRow(slot=s, list_id=lid))
        # logical length drives the scroll clamp (content taller than
        # the viewport by (m - vis) rows)
        self._virtual_lists.append(
            {"id": lid, "area": area, "rows": rows,
             "row_h": float(row_height), "m": int(m)})
        self.app.add_systems(Update, make_virtual_list_system(
            self, lid, data, float(row_height)))
        return area

    def text_input(self, world, style: Style, font, parent=None,
                   text="", max_len=24, on_submit=None):
        """Editable single-line text field (ref: ui_widgets text input).
        Click focuses; typing edits host-side; glyphs update in-jit
        through a frame-input code array (no retrace per keystroke);
        Enter fires on_submit(value); Tab cycles focus."""
        from bevy_tpu.render.sprite import Sprite as _Sprite
        from bevy_tpu.transform import GlobalTransform as _GT
        from bevy_tpu.transform import Transform as _T

        row = self.spawn_node(world, style, parent, interactive=True)
        iid = len(self._text_inputs)
        cw = font.char_w
        ch = font.char_h
        glyphs = []
        for s in range(max_len):
            e = world.spawn(
                _Sprite(size=(cw, ch), color=(1, 1, 1, 0)),
                TextInputSlot(slot=s, input_id=iid),
                _T(), _GT())
            glyphs.append(e.index if hasattr(e, "index") else e)
        from bevy_tpu.text_edit import TextEditState
        ti = {"id": iid, "row": row, "glyphs": glyphs, "max_len": max_len,
              "value": text, "on_submit": on_submit, "font": font,
              "edit": TextEditState(text, max_len=max_len - 1)}
        self._text_inputs.append(ti)
        res = f"ui_text{iid}"
        self.app.register_frame_input(
            res, np.zeros(max_len, np.int32),
            lambda ti=ti: _codes_of(ti, self))
        self.app.add_systems(Update, make_text_slot_system(font, iid, res))
        return row

    # -- layout (host, ref position: ui_layout_system) -------------------
    def _layout(self, world):
        nodes: List[_Node] = []

        def collect(n):
            nodes.append(n)
            for c in n.children:
                collect(c)

        for r in self.roots:
            collect(r)
        if not nodes:
            return
        index = {id(n): i for i, n in enumerate(nodes)}
        styles = [n.style.to_native() for n in nodes]
        parents = [index[id(n.parent)] if n.parent is not None else -1
                   for n in nodes]
        rects = nl.solve(styles, parents, self.width, self.height)

        # content heights for scroll clamping: max child bottom per node
        content_h = [0.0] * len(nodes)
        for i, n in enumerate(nodes):
            if n.parent is not None:
                p = index[id(n.parent)]
                rel_bottom = rects[i][1] + rects[i][3] - rects[p][1]
                content_h[p] = max(content_h[p], rel_bottom)

        # bake scroll/clip tables for the in-jit clip system (ref:
        # bevy_ui Overflow::clip + ScrollPosition): each clipped node
        # records its nearest scroll ancestor row, its unscrolled rect,
        # and the (static) clip rect in centered-world coordinates
        clip_rows, clip_anchor, clip_base, clip_rect = [], [], [], []
        scroll_rows, scroll_max_v = [], []
        vl_areas = {vl["area"] for vl in self._virtual_lists}
        for i, n in enumerate(nodes):
            x, y, w, h = rects[i]
            self._write(world, n, x, y, w, h)
            if n.style.overflow == "scroll":
                scroll_rows.append(n.row)
                scroll_max_v.append(max(content_h[i] - h, 0.0))
            clip = None
            anchor = -1
            a = n.parent
            while a is not None:
                ai = index[id(a)]
                if a.style.overflow in ("clip", "scroll"):
                    ax, ay, aw, ah = rects[ai]
                    # virtual lists reindex content instead of sliding
                    # their recycled rows — no translate anchor
                    if a.style.overflow == "scroll" and anchor < 0 and \
                            a.row not in vl_areas:
                        anchor = a.row
                    r = (ax, ay, ax + aw, ay + ah)
                    clip = r if clip is None else (
                        max(clip[0], r[0]), max(clip[1], r[1]),
                        min(clip[2], r[2]), min(clip[3], r[3]))
                a = a.parent
            if clip is not None:
                clip_rows.append(n.row)
                clip_anchor.append(max(anchor, 0))
                clip_base.append([x + w / 2, y + h / 2, w, h])
                clip_rect.append(list(clip))
        self._clip_rows = np.asarray(clip_rows, np.int32)
        self._clip_anchor = np.asarray(clip_anchor, np.int32)
        self._clip_base = np.asarray(clip_base, np.float32).reshape(-1, 4)
        self._clip_rect = np.asarray(clip_rect, np.float32).reshape(-1, 4)
        # virtual lists scroll over their LOGICAL length
        for vl in self._virtual_lists:
            if vl["area"] in scroll_rows:
                i = scroll_rows.index(vl["area"])
                scroll_max_v[i] = max(
                    vl["m"] - len(vl["rows"]), 0) * vl["row_h"]
        self._scroll_rows = np.asarray(scroll_rows, np.int32)
        self._scroll_max = np.asarray(scroll_max_v, np.float32)

        # place text-input glyph slots inside their nodes (monospace)
        from bevy_tpu.transform import GlobalTransform as _GT
        from bevy_tpu.transform import Transform as _T
        for ti in self._text_inputs:
            rect = self._rects.get(ti["row"])
            if rect is None:
                continue
            x, y, w, h = rect
            cw = ti["font"].char_w
            gy = self.height / 2 - (y + h / 2)
            for s, grow in enumerate(ti["glyphs"]):
                gx = (x + 4 + s * cw + cw / 2) - self.width / 2
                world.insert(grow, _T(translation=(gx, gy, 52.0)),
                             _GT(translation=(gx, gy, 52.0)))
        # overlays: re-hide closed subtrees (the _write pass above resets
        # sprite colors to their shown values)
        if self._overlays:
            self._apply_overlays(world)

    def _write(self, world, node: _Node, x, y, w, h):
        s = node.style
        wx = x + w / 2 - self.width / 2
        wy = self.height / 2 - (y + h / 2)
        depth = 0
        root = node
        a = node.parent
        while a is not None:
            depth += 1
            root = a
            a = a.parent
        # overlay roots float above normal chrome (ref: the global
        # z-index dialogs/menus render at in bevy_ui's stacking context)
        z = getattr(root, "z_base", 50.0) + 0.1 * depth
        self._rects[node.row] = (x, y, w, h)
        world.insert(node.row,
                     Transform(translation=(wx, wy, z)),
                     GlobalTransform(translation=(wx, wy, z)),
                     UiNode(size=(w, h)))
        from bevy_tpu.ecs.component import ComponentInstance, get_spec
        spec = get_spec(Sprite)
        fields = {"size": np.asarray([w, h], np.float32),
                  "color": np.asarray(s.background, np.float32)}
        img_h = getattr(node, "image", None)
        if img_h is not None:
            fields["color"] = np.ones(4, np.float32)
            fields["uv_min"] = np.asarray(img_h["uv_min"], np.float32)
            fields["uv_max"] = np.asarray(img_h["uv_max"], np.float32)
            fields["tex"] = np.asarray(img_h["tex"], np.int32)
        if (s.border_radius > 0 or s.border > 0 or s.gradient is not None
                or s.material is not None) and w >= 1 and h >= 1:
            if s.material is not None and s.material_key is None:
                # id() of a GC'd callable can be reused, silently hitting a
                # stale bake; anonymous per-frame materials would also grow
                # the atlas without bound. Key on the function's identity
                # (module.qualname) plus free-variable values so distinct
                # closures bake distinctly but re-created equal closures hit.
                fn = s.material
                cells = tuple(
                    repr(c.cell_contents)[:64] if not callable(
                        getattr(c, "cell_contents", None)) else "<fn>"
                    for c in (fn.__closure__ or ()))
                mat_key = (getattr(fn, "__module__", ""),
                           getattr(fn, "__qualname__", repr(fn)), cells)
            else:
                mat_key = s.material_key
            hd = self._deco_handle(
                ("n", round(w), round(h), s.border_radius, s.border,
                 tuple(s.border_color), str(s.gradient),
                 tuple(s.background), mat_key),
                lambda: _bake_node_texture(w, h, s))
            fields["color"] = np.ones(4, np.float32)
            fields["uv_min"] = np.asarray(hd["uv_min"], np.float32)
            fields["uv_max"] = np.asarray(hd["uv_max"], np.float32)
            fields["tex"] = np.asarray(hd["tex"], np.int32)
        world.insert(node.row, ComponentInstance(spec, fields))
        self._node_color[node.row] = np.asarray(fields["color"], np.float32)
        if s.box_shadow is not None and w >= 1 and h >= 1:
            dx, dy, blur, scol = s.box_shadow
            hd, pad = self._deco_handle(
                ("s", round(w), round(h), s.border_radius, blur,
                 tuple(scol)),
                lambda: _bake_shadow_texture(w, h, s.border_radius, blur,
                                             scol))
            srow = self._shadow_rows.get(node.row)
            sw, sh = w + 2 * pad, h + 2 * pad
            sx, sy = wx + dx, wy - dy
            comps = [
                ComponentInstance(spec, {
                    "size": np.asarray([sw, sh], np.float32),
                    "color": np.ones(4, np.float32),
                    "uv_min": np.asarray(hd["uv_min"], np.float32),
                    "uv_max": np.asarray(hd["uv_max"], np.float32),
                    "tex": np.asarray(hd["tex"], np.int32)}),
                Transform(translation=(sx, sy, z - 0.05)),
                GlobalTransform(translation=(sx, sy, z - 0.05))]
            if srow is None:
                self._shadow_rows[node.row] = world.spawn(*comps).index
            else:
                world.insert(srow, *comps)

    def _deco_handle(self, key, bake):
        """Bake-once atlas entry (placement is fixed at add() time, so
        handles stay valid when the atlas image is rebuilt)."""
        if key in self._deco_handles:
            return self._deco_handles[key]
        from bevy_tpu.render.texture import AtlasBuilder, TextureAtlas
        app = self.app
        builder = self._builder or getattr(app, "_atlas_builder", None)
        if builder is None:
            res = app.world.state["res"].get(TextureAtlas.RESOURCE)
            if res is not None and res["data"].shape[:2] != (1, 1):
                raise RuntimeError(
                    "UI decorations need to pack into the app's texture "
                    "atlas: pass the AtlasBuilder via "
                    "UiPlugin(atlas_builder=...) so existing uv rects "
                    "stay valid")
            builder = AtlasBuilder(1024, 512)
            app._atlas_builder = builder
        self._builder = builder
        out = bake()
        pad = None
        if isinstance(out, tuple):
            out, pad = out
        hd = builder.add(out, f"ui_deco:{key}", srgb=False)
        res = hd if pad is None else (hd, pad)
        self._deco_handles[key] = res
        app.insert_resource(TextureAtlas.RESOURCE,
                            {"data": jnp.asarray(builder.data)})
        return res

    # -- overlays: dialog / modal / popover / menu -----------------------
    # (ref: bevy_ui_widgets src/{dialog,modal,popover,menu}.rs — the
    # reference builds these from observers over a headless core; here
    # the open/close/outside-click state machine is host-side while
    # hit-testing stays in-jit through the UiNode.active gate)

    def _overlays_of(self, node: _Node):
        """Overlay chain owning `node` (nearest-last), via the tree."""
        chain = []
        a = node
        while a is not None:
            ov = getattr(a, "overlay", None)
            if ov is not None:
                chain.append(ov)
            a = a.parent
        return chain

    def dialog(self, world, style: Style = None, modal: bool = True,
               close_on_outside: bool = None, backdrop=None):
        """Hidden centered panel over a full-screen backdrop (ref:
        ui_widgets dialog.rs/modal.rs). `modal=True` blocks every
        interactive node outside the dialog while open (focus capture).
        Returns an OverlayHandle — `.panel` is the parent row for
        content; `.open()` / `.close()` toggle without retrace."""
        if style is None:
            style = Style(width=220, height=140,
                          background=(0.16, 0.16, 0.19, 1.0))
        if backdrop is None:
            backdrop = (0.0, 0.0, 0.0, 0.45) if modal \
                else (0.0, 0.0, 0.0, 0.0)
        root_style = Style(width=self.width, height=self.height,
                           justify_content="center", align_items="center",
                           background=backdrop)
        root = self.spawn_node(world, root_style)
        panel = self.spawn_node(world, style, parent=root)
        ov = {"kind": "dialog", "root": root, "panel": panel,
              "anchor": None, "open": False, "modal": modal,
              "close_on_outside": (not modal) if close_on_outside is None
              else close_on_outside, "on_close": None}
        rnode = self._by_row[root]
        rnode.z_base = 70.0
        rnode.overlay = ov
        self._overlays.append(ov)
        return OverlayHandle(self, world, ov)

    def popover(self, world, anchor: int, style: Style = None,
                placement: str = "below", gap: float = 2.0):
        """Hidden panel anchored to `anchor`'s rect, toggled by clicking
        the anchor, closed by clicking outside (ref: popover.rs)."""
        if style is None:
            style = Style(width=150, height=90,
                          background=(0.18, 0.18, 0.22, 1.0))
        style.position = "absolute"
        root = self.spawn_node(world, style)
        ov = {"kind": "popover", "root": root, "panel": root,
              "anchor": anchor, "placement": placement, "gap": gap,
              "open": False, "modal": False, "close_on_outside": True,
              "on_close": None}
        rnode = self._by_row[root]
        rnode.z_base = 80.0
        rnode.overlay = ov
        self._overlays.append(ov)
        return OverlayHandle(self, world, ov)

    def menu(self, world, anchor: int, items, width: float = 140.0,
             item_height: float = 22.0, font=None,
             item_style=None, placement: str = "below"):
        """Anchored menu (ref: menu.rs): `items` is a list of
        (label, callback) — clicking an item fires callback(row) and
        closes. Labels bake to atlas textures when a PIL font is
        available; pass `item_style` to restyle rows."""
        n = max(len(items), 1)
        pad = 4.0
        handle = self.popover(world, anchor, Style(
            width=width, height=n * (item_height + 2.0) + pad * 2,
            padding=pad, gap=2.0,
            background=(0.15, 0.15, 0.18, 1.0)), placement=placement)
        ov = handle._ov
        ov["kind"] = "menu"
        ov["items"] = []
        for label, cb in items:
            st = item_style() if callable(item_style) else Style(
                height=item_height, flex_shrink=0.0,
                background=(0.23, 0.23, 0.26, 1.0))
            row = self.spawn_node(world, st, parent=ov["panel"],
                                  interactive=True)
            if label:
                img = _bake_label_texture(label, (0.88, 0.88, 0.90, 1.0))
                hd = self._deco_handle(("t", label, "menu"), lambda: img)
                self.image(world, Style(
                    width=min(img.shape[1], width - 2 * pad - 4),
                    height=min(img.shape[0], item_height - 2),
                    margin=2.0), hd, parent=row)
            ov["items"].append({"row": row, "cb": cb, "label": label})
        return handle

    def _apply_overlays(self, world):
        """Push overlay open/close + modal blocking into the device
        columns (Sprite colors + UiNode.active) — data writes only, no
        structural change, so toggling never retraces."""
        from bevy_tpu.render.sprite import Sprite as _Sprite
        open_modal = next((o for o in reversed(self._overlays)
                           if o["open"] and o["modal"]), None)
        self._inactive_rows = set()
        for row, node in self._by_row.items():
            chain = self._overlays_of(node)
            shown = all(o["open"] for o in chain)
            blocked = open_modal is not None and open_modal not in chain
            color = self._node_color.get(row)
            if color is not None:
                world.set_field(row, _Sprite, "color",
                                color if shown else np.zeros(4, np.float32))
            srow = self._shadow_rows.get(row)
            if srow is not None:
                world.set_field(
                    srow, _Sprite, "color",
                    np.ones(4, np.float32) if shown
                    else np.zeros(4, np.float32))
            active = shown and not blocked
            world.set_field(row, UiNode, "active", 1 if active else 0)
            if not active:
                self._inactive_rows.add(row)

    def _overlay_click(self, world, mx, my):
        """Host-side overlay mouse routing (runs on fresh clicks):
        anchor toggles, menu items fire, outside-clicks close.
        Returns True when the click was consumed by overlay logic."""
        def inside(row):
            r = self._rects.get(row)
            return r is not None and r[0] <= mx <= r[0] + r[2] and \
                r[1] <= my <= r[1] + r[3]

        # topmost open overlay first
        for ov in reversed(self._overlays):
            if not ov["open"]:
                continue
            if ov["kind"] == "menu":
                for it in ov["items"]:
                    if inside(it["row"]) and \
                            it["row"] not in self._inactive_rows:
                        ov["open"] = False
                        self._apply_overlays(world)
                        if it["cb"] is not None:
                            it["cb"](it["row"])
                        return True
            if not inside(ov["panel"]):
                anchored = ov["anchor"] is not None and inside(ov["anchor"])
                if ov["close_on_outside"] and not anchored:
                    ov["open"] = False
                    if ov["on_close"] is not None:
                        ov["on_close"]()
                    self._apply_overlays(world)
                    # fall through: the click may also hit an anchor
            elif ov["modal"]:
                return False      # click inside an open modal panel
        # closed (or just-closed) anchored overlays: anchor toggles
        for ov in reversed(self._overlays):
            if ov["anchor"] is not None and not ov["open"] and \
                    inside(ov["anchor"]) and \
                    ov["anchor"] not in self._inactive_rows:
                ov["open"] = True
                self._position_anchored(world, ov)
                self._apply_overlays(world)
                return True
        if any(o["open"] and o["modal"] for o in self._overlays):
            return True           # modal swallows outside clicks
        return False

    def _position_anchored(self, world, ov):
        """Place an anchored overlay next to its anchor's solved rect."""
        r = self._rects.get(ov["anchor"])
        if r is None:
            return
        x, y, w, h = r
        s = self._by_row[ov["root"]].style
        if ov.get("placement", "below") == "right":
            s.left, s.top = x + w + ov.get("gap", 2.0), y
        else:
            s.left, s.top = x, y + h + ov.get("gap", 2.0)
        # keep the panel on-screen (ref: popover flip/shift placement)
        pw = s.width if isinstance(s.width, (int, float)) else 0.0
        ph = s.height if isinstance(s.height, (int, float)) else 0.0
        s.left = max(min(s.left, self.width - pw), 0.0)
        s.top = max(min(s.top, self.height - ph), 0.0)
        self._layout(world)


class OverlayHandle:
    """Host-side controller for a dialog/modal/popover/menu overlay."""

    def __init__(self, plugin, world, ov):
        self._plugin = plugin
        self._world = world
        self._ov = ov

    @property
    def panel(self) -> int:
        """Parent row for overlay content."""
        return self._ov["panel"]

    @property
    def root(self) -> int:
        return self._ov["root"]

    @property
    def is_open(self) -> bool:
        return self._ov["open"]

    @property
    def item_rows(self):
        return [it["row"] for it in self._ov.get("items", [])]

    def on_close(self, cb):
        self._ov["on_close"] = cb
        return self

    def open(self):
        self._ov["open"] = True
        if self._ov["anchor"] is not None:
            self._plugin._position_anchored(self._world, self._ov)
        self._plugin._apply_overlays(self._world)

    def close(self):
        self._ov["open"] = False
        if self._ov["on_close"] is not None:
            self._ov["on_close"]()
        self._plugin._apply_overlays(self._world)


def _bake_label_texture(text, color, size=None):
    """Rasterize a short text label to RGBA (PIL default font — the
    host-bake position of the reference's text shaping for widget
    chrome)."""
    from PIL import Image, ImageDraw, ImageFont
    font = ImageFont.load_default(size) if size else ImageFont.load_default()
    box = font.getbbox(text)
    w, h = max(box[2] - box[0], 1), max(box[3] - box[1], 1)
    img = Image.new("L", (w, h), 0)
    ImageDraw.Draw(img).text((-box[0], -box[1]), text, fill=255, font=font)
    a = np.asarray(img, np.float32) / 255.0
    out = np.zeros((h, w, 4), np.float32)
    out[..., :3] = np.asarray(color, np.float32)[:3]
    out[..., 3] = a * color[3]
    return out


def make_virtual_list_system(plugin, list_id, data, row_h):
    # reindex recycled rows from the scroll offset (in-jit)
    m = data.shape[0]

    @system(name=f"ui_virtual_list_{list_id}")
    def ui_virtual_list(q=Query(Sprite, VirtualListRow),
                        sc=Query(ScrollPosition)):
        vl = next(v for v in plugin._virtual_lists if v["id"] == list_id)
        off = sc.scroll_position.offset[vl["area"], 1]
        first = jnp.clip((off / row_h).astype(jnp.int32), 0,
                         max(m - len(vl["rows"]), 0))
        mine = q.mask & (q.virtual_list_row.list_id == list_id)
        idx = jnp.clip(first + q.virtual_list_row.slot, 0, m - 1)
        col = data[idx]
        q.sprite.color = jnp.where(mine[:, None], col, q.sprite.color)

    return ui_virtual_list


def _codes_of(ti, plugin):
    """Frame-input callback: ASCII codes of the value (+ '|' caret at
    the edit cursor when focused — ref: bevy_text cursor.rs), zero-
    padded to max_len."""
    ed = ti.get("edit")
    if plugin.focus == ti["id"] and ed is not None \
            and len(ti["value"]) < ti["max_len"]:
        txt = ed.display()
    else:
        txt = ti["value"]
    codes = np.zeros(ti["max_len"], np.int32)
    for i, ch in enumerate(txt[:ti["max_len"]]):
        codes[i] = ord(ch)
    return codes


def make_text_slot_system(font, input_id, res_name):
    """In-jit glyph update for one text input (the DigitText pattern)."""
    import string

    chars = [chr(c) for c in range(32, 127)]
    uv0 = np.stack([font.handles.get(c, font.handles["?"])["uv_min"]
                    for c in chars])
    uv1 = np.stack([font.handles.get(c, font.handles["?"])["uv_max"]
                    for c in chars])
    tex = font.handles["M"]["tex"]
    del string

    @system(name=f"ui_text_slots_{input_id}")
    def ui_text_slots(q=Query(Sprite, TextInputSlot),
                      fin=Res("frame_input")):
        codes = jnp.asarray(getattr(fin, res_name))
        mine = q.mask & (q.text_input_slot.input_id == input_id)
        code = codes[jnp.clip(q.text_input_slot.slot, 0,
                              codes.shape[0] - 1)]
        gi = jnp.clip(code - 32, 0, len(chars) - 1)
        u0 = jnp.asarray(uv0, jnp.float32)[gi]
        u1 = jnp.asarray(uv1, jnp.float32)[gi]
        q.sprite.uv_min = jnp.where(mine[:, None], u0, q.sprite.uv_min)
        q.sprite.uv_max = jnp.where(mine[:, None], u1, q.sprite.uv_max)
        q.sprite.tex = jnp.where(mine, tex, q.sprite.tex)
        alpha = jnp.where(code > 32, 1.0, 0.0)
        q.sprite.color = jnp.where(
            mine[:, None], q.sprite.color.at[:, 3].set(alpha),
            q.sprite.color)

    return ui_text_slots


# host-side key → char (KeyCode indices; see bevy_tpu.input.KeyCode)
_KEY_CHARS = {i: chr(ord("a") + i) for i in range(26)}
_KEY_CHARS.update({26 + d: str(d) for d in range(10)})
_SHIFT_DIGITS = {26: ")", 27: "!", 28: "@", 29: "#", 30: "$", 31: "%",
                 32: "^", 33: "&", 34: "*", 35: "("}




def _directional_nav(plugin, just, keys):
    """Arrow-key focus movement among interactive nodes: pick the
    nearest focusable whose center lies in the pressed direction
    (ref: directional navigation's quadrant heuristic)."""
    from bevy_tpu.input import KeyCode

    dirs = {KeyCode.ArrowLeft: (-1, 0), KeyCode.ArrowRight: (1, 0),
            KeyCode.ArrowUp: (0, -1), KeyCode.ArrowDown: (0, 1)}
    pressed = [d for k, d in dirs.items() if just[k]]
    if not pressed or not plugin.focusables:
        return False
    dx, dy = pressed[0]

    def center(row):
        r = plugin._rects.get(row)
        return None if r is None else (r[0] + r[2] / 2, r[1] + r[3] / 2)

    candidates = [r for r in plugin.focusables
                  if r not in plugin._inactive_rows]
    if not candidates:
        return False
    if plugin.focused_row is None or center(plugin.focused_row) is None \
            or plugin.focused_row in plugin._inactive_rows:
        plugin.focused_row = candidates[0]
        return True
    cx, cy = center(plugin.focused_row)
    best, best_d = None, 1e30
    for row in candidates:
        if row == plugin.focused_row:
            continue
        c = center(row)
        if c is None:
            continue
        vx, vy = c[0] - cx, c[1] - cy
        along = vx * dx + vy * dy
        if along <= 1e-3:
            continue                      # not in that direction
        ortho = abs(vx * dy) + abs(vy * dx)
        d = along + 2.0 * ortho           # prefer aligned candidates
        if d < best_d:
            best, best_d = row, d
    if best is not None:
        plugin.focused_row = best
    return True


def _ui_host_tick_for(plugin):
    """Per-frame host hook: focus management (click hit-test against the
    solved layout rects, Tab cycling) + keystroke editing for the
    focused text input (ref: bevy_input_focus + ui_widgets text input)."""
    from bevy_tpu.input import KeyCode

    def tick(app):
        inp = getattr(app, "input", None)
        if inp is None or not (plugin._text_inputs or plugin.focusables
                               or plugin._overlays):
            return
        keys = np.asarray(inp.keys, bool)
        prev = plugin._prev_keys if plugin._prev_keys is not None \
            else np.zeros_like(keys)
        just = keys & ~prev
        plugin._prev_keys = keys.copy()
        mdown = bool(inp.mouse_buttons[0])
        mjust = mdown and not plugin._prev_mouse
        plugin._prev_mouse = mdown
        if mjust:
            mx, my = float(inp.mouse_pos[0]), float(inp.mouse_pos[1])
            consumed = plugin._overlay_click(app.world, mx, my) \
                if plugin._overlays else False
            plugin.focus = None
            for ti in plugin._text_inputs:
                r = plugin._rects.get(ti["row"])
                if not consumed and ti["row"] not in \
                        plugin._inactive_rows and r and \
                        r[0] <= mx <= r[0] + r[2] and \
                        r[1] <= my <= r[1] + r[3]:
                    plugin.focus = ti["id"]
        _directional_nav(plugin, just, keys)
        # Enter/Space activates the focused node (toggle Checked, or a
        # registered on_activate callback — ref: FocusedInput dispatch)
        if plugin.focused_row is not None and \
                (just[KeyCode.Enter] or just[KeyCode.Space]) and \
                plugin.focus is None and \
                plugin.focused_row not in plugin._inactive_rows:
            row = plugin.focused_row
            cb = plugin.on_activate.get(row)
            if cb is not None:
                cb(row)
            else:
                cur = app.world.get(row, Checked)
                if cur is not None:
                    import numpy as _np
                    app.world.insert(row, Checked(
                        value=1 - int(_np.asarray(cur.value)),
                        group=int(_np.asarray(cur.group))))
        if just[KeyCode.Tab] and plugin._text_inputs:
            cur = plugin.focus if plugin.focus is not None else -1
            plugin.focus = (cur + 1) % len(plugin._text_inputs)
        if plugin.focus is None or not plugin._text_inputs:
            return
        ti = plugin._text_inputs[plugin.focus]
        ed = ti["edit"]
        shift = bool(keys[KeyCode.ShiftLeft] or keys[KeyCode.ShiftRight])
        ctrl = bool(keys[KeyCode.ControlLeft] or keys[KeyCode.ControlRight])
        # selection-aware editing model (ref: bevy_text editing.rs —
        # cursor moves, anchored selection, word jumps, undo)
        if ctrl:
            if just[KeyCode.KeyV] and hasattr(app, "clipboard"):
                ed.insert(app.clipboard.get_text())
            elif just[KeyCode.KeyC] and hasattr(app, "clipboard"):
                app.clipboard.set_text(ed.selected_text or ed.value)
            elif just[KeyCode.KeyX] and hasattr(app, "clipboard"):
                app.clipboard.set_text(ed.cut() or ed.value)
            elif just[KeyCode.KeyA]:
                ed.select_all()
            elif just[KeyCode.KeyZ]:
                ed.undo()
            elif just[KeyCode.ArrowLeft]:
                ed.word_left(select=shift)
            elif just[KeyCode.ArrowRight]:
                ed.word_right(select=shift)
            ti["value"] = ed.value
            return
        for k in np.where(just)[0]:
            k = int(k)
            if k == KeyCode.Backspace:
                ed.backspace()
            elif k == KeyCode.Delete:
                ed.delete()
            elif k == KeyCode.ArrowLeft:
                ed.left(select=shift)
            elif k == KeyCode.ArrowRight:
                ed.right(select=shift)
            elif k == KeyCode.Home:
                ed.home(select=shift)
            elif k == KeyCode.End:
                ed.end(select=shift)
            elif k == KeyCode.Enter:
                if ti["on_submit"]:
                    ti["on_submit"](ed.value)
            elif k == KeyCode.Space:
                ed.insert(" ")
            elif k in _KEY_CHARS:
                ch = _KEY_CHARS[k]
                if shift:
                    ch = _SHIFT_DIGITS.get(k, ch.upper())
                ed.insert(ch)
        ti["value"] = ed.value

    return tick


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
                 (jnp.abs(my - t[:, 1]) <= half[:, 1]) & \
                 (q.ui_node.active > 0)
        pressed = mouse.pressed[0]
        state = jnp.where(inside, jnp.where(pressed, 2, 1), 0)
        q.interaction.state = jnp.where(q.mask, state, q.interaction.state)

    return ui_interaction


def make_ui_pointer_system(width, height):
    @system(name="ui_pointer_events")
    def ui_pointer_events(q=Query(UiNode, Transform),
                          mouse=Res("mouse"),
                          click=_Trigger(UiPointerClick, budget=1)):
        """Dispatch UiPointerClick at the topmost UI node under the
        cursor on press (ref: bevy_picking's UI backend + bubbled
        Pointer events — observers walk UiParent from here)."""
        mx = mouse.position[0] - width / 2
        my = height / 2 - mouse.position[1]
        t = q.transform.translation
        half = q.ui_node.size * 0.5
        inside = (jnp.abs(mx - t[:, 0]) <= half[:, 0]) & \
                 (jnp.abs(my - t[:, 1]) <= half[:, 1]) & \
                 (q.ui_node.active > 0) & q.mask
        key = jnp.where(inside, t[:, 2], -jnp.inf)
        top = jnp.argmax(key).astype(jnp.int32)
        fire = jnp.any(inside) & (mouse.just_pressed[0] > 0)
        click.trigger(count=fire.astype(jnp.int32), row=top)

    return ui_pointer_events


@system(name="ui_checkbox")
def _checkbox_system(q=Query(Checked, Interaction), mouse=Res("mouse")):
    """Toggle on release-while-hovered; radios clear their group
    (ref: ui_widgets checkbox/radio observers)."""
    released = mouse.just_released[0]
    over = q.interaction.state >= 1
    fire = q.mask & (released > 0) & over
    toggled = jnp.where(fire, 1 - q.checked.value, q.checked.value)
    # radio: a fired radio sets 1; others in the same group clear
    is_radio = q.checked.group >= 0
    fired_radio = fire & is_radio
    group_fired = jnp.zeros((256,), jnp.int32).at[
        jnp.clip(q.checked.group, 0, 255)].max(fired_radio.astype(jnp.int32))
    cleared = is_radio & (group_fired[jnp.clip(q.checked.group, 0, 255)] > 0)
    q.checked.value = jnp.where(
        fired_radio, 1,
        jnp.where(cleared & ~fired_radio, 0, toggled))


def make_slider_system(width):
    @system(name="ui_slider")
    def ui_slider(q=Query(SliderValue, Interaction, UiNode, Transform),
                  mouse=Res("mouse")):
        """Drag writes value 0..1 across the node width (ref:
        ui_widgets slider track semantics)."""
        pressed = mouse.pressed[0]
        just = mouse.just_pressed[0]
        over = q.interaction.state >= 1
        drag = ((q.slider_value.dragging > 0) & pressed) | (just & over)
        q.slider_value.dragging = jnp.where(q.mask, drag.astype(jnp.int32),
                                            q.slider_value.dragging)
        mx = mouse.position[0] - width / 2      # centered world x
        relx = mx - q.transform.translation[:, 0]
        v = jnp.clip(relx / jnp.maximum(q.ui_node.size[:, 0], 1e-3) + 0.5,
                     0.0, 1.0)
        q.slider_value.value = jnp.where(q.mask & drag, v,
                                         q.slider_value.value)

    return ui_slider


def make_scroll_system(plugin: "UiPlugin"):
    @system(name="ui_scroll")
    def ui_scroll(q=Query(ScrollPosition, Interaction),
                  nodes=Query(UiNode, Transform),
                  spr=Query(Sprite), mouse=Res("mouse")):
        """Wheel scrolls hovered scroll areas, then re-clips their
        children on-device (ref: bevy_ui ScrollPosition + Overflow::clip;
        scroll geometry tables are baked at layout time and retrace with
        structure changes)."""
        over = q.interaction.state >= 1
        dy = mouse.scroll[1]
        off = q.scroll_position.offset
        srows = jnp.asarray(plugin._scroll_rows)
        smax = jnp.asarray(plugin._scroll_max)
        if srows.shape[0]:
            maxcol = jnp.zeros(off.shape[0], jnp.float32).at[srows].set(smax)
        else:
            maxcol = jnp.zeros(off.shape[0], jnp.float32)
        new_y = jnp.clip(off[:, 1] - dy * 20.0, 0.0, maxcol)
        q.scroll_position.offset = jnp.where(
            (q.mask & over)[:, None],
            jnp.stack([off[:, 0], new_y], 1), off)

        rows = plugin._clip_rows
        if rows.shape[0] == 0:
            return
        rows = jnp.asarray(rows)
        anchor = jnp.asarray(plugin._clip_anchor)
        base = jnp.asarray(plugin._clip_base)      # (K, 4) cx, cy, w, h px
        crect = jnp.asarray(plugin._clip_rect)     # (K, 4) x0, y0, x1, y1 px
        aoff = q.scroll_position.offset[anchor]    # (K, 2)
        cx = base[:, 0] - aoff[:, 0]
        cy = base[:, 1] - aoff[:, 1]
        x0 = jnp.maximum(cx - base[:, 2] / 2, crect[:, 0])
        y0 = jnp.maximum(cy - base[:, 3] / 2, crect[:, 1])
        x1 = jnp.minimum(cx + base[:, 2] / 2, crect[:, 2])
        y1 = jnp.minimum(cy + base[:, 3] / 2, crect[:, 3])
        w = jnp.maximum(x1 - x0, 0.0)
        h = jnp.maximum(y1 - y0, 0.0)
        # px rect → centered world (y flip)
        wx = (x0 + x1) / 2 - plugin.width / 2
        wy = plugin.height / 2 - (y0 + y1) / 2
        t = nodes.transform.translation
        nodes.transform.translation = t.at[rows, 0].set(wx).at[rows, 1].set(wy)
        nodes.ui_node.size = nodes.ui_node.size.at[rows, 0].set(w) \
                                               .at[rows, 1].set(h)
        spr.sprite.size = spr.sprite.size.at[rows, 0].set(w) \
                                         .at[rows, 1].set(h)

    return ui_scroll
