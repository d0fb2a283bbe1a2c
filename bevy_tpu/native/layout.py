"""ctypes bindings for the native flexbox/grid solver (flexbox.cpp; the
taffy-equivalent behind UiPlugin — ref: bevy_ui/src/layout/mod.rs:68
`ui_layout_system` driving taffy). Falls back to a tiny pure-Python
column/row stacker when the native library is unavailable."""

from __future__ import annotations

import ctypes
from typing import List, Optional, Sequence, Tuple

from bevy_tpu.native import load_library

AUTO, PX, PERCENT, FR = 0, 1, 2, 3
FLEX, GRID, NONE = 0, 1, 2
RELATIVE, ABSOLUTE = 0, 1
ROW, COLUMN, ROW_REVERSE, COLUMN_REVERSE = 0, 1, 2, 3
START, END, CENTER, SPACE_BETWEEN, SPACE_AROUND, SPACE_EVENLY = range(6)
ALIGN_AUTO, ALIGN_START, ALIGN_END, ALIGN_CENTER, ALIGN_STRETCH = range(5)

_MAX_TRACKS = 12


class Dim(ctypes.Structure):
    _fields_ = [("value", ctypes.c_float), ("unit", ctypes.c_int32)]


def px(v) -> Tuple[float, int]:
    return (float(v), PX)


def pct(v) -> Tuple[float, int]:
    return (float(v), PERCENT)


def fr(v=1.0) -> Tuple[float, int]:
    return (float(v), FR)


auto = (0.0, AUTO)


def _dim(v) -> Dim:
    """Accepts None/'auto', a number (px), or a (value, unit) pair."""
    if v is None or v == "auto":
        return Dim(0.0, AUTO)
    if isinstance(v, (int, float)):
        return Dim(float(v), PX)
    return Dim(float(v[0]), int(v[1]))


class NodeStyle(ctypes.Structure):
    _fields_ = [
        ("display", ctypes.c_int32),
        ("position", ctypes.c_int32),
        ("flex_direction", ctypes.c_int32),
        ("flex_wrap", ctypes.c_int32),
        ("justify_content", ctypes.c_int32),
        ("align_items", ctypes.c_int32),
        ("align_self", ctypes.c_int32),
        ("align_content", ctypes.c_int32),
        ("flex_grow", ctypes.c_float),
        ("flex_shrink", ctypes.c_float),
        ("flex_basis", Dim),
        ("width", Dim), ("height", Dim),
        ("min_width", Dim), ("min_height", Dim),
        ("max_width", Dim), ("max_height", Dim),
        ("padding", ctypes.c_float * 4),
        ("margin", ctypes.c_float * 4),
        ("inset", Dim * 4),
        ("gap", ctypes.c_float * 2),
        ("content_w", ctypes.c_float),
        ("content_h", ctypes.c_float),
        ("n_grid_cols", ctypes.c_int32),
        ("n_grid_rows", ctypes.c_int32),
        ("grid_cols", Dim * _MAX_TRACKS),
        ("grid_rows", Dim * _MAX_TRACKS),
        ("grid_col_start", ctypes.c_int32),
        ("grid_col_span", ctypes.c_int32),
        ("grid_row_start", ctypes.c_int32),
        ("grid_row_span", ctypes.c_int32),
    ]


class NodeLayout(ctypes.Structure):
    _fields_ = [("x", ctypes.c_float), ("y", ctypes.c_float),
                ("w", ctypes.c_float), ("h", ctypes.c_float)]


_lib = None
_lib_tried = False


def _get_lib():
    global _lib, _lib_tried
    if not _lib_tried:
        _lib_tried = True
        lib = load_library("flexbox")
        if lib is not None:
            lib.bevy_layout_solve.restype = ctypes.c_int
            lib.bevy_layout_solve.argtypes = [
                ctypes.c_int, ctypes.POINTER(NodeStyle),
                ctypes.POINTER(ctypes.c_int32),
                ctypes.c_float, ctypes.c_float, ctypes.POINTER(NodeLayout)]
            _lib = lib
    return _lib


def make_style(*, display=FLEX, position=RELATIVE, flex_direction=COLUMN,
               flex_wrap=False, justify_content=START, align_items=ALIGN_AUTO,
               align_self=ALIGN_AUTO, align_content=START, flex_grow=0.0,
               flex_shrink=1.0, flex_basis=None, width=None, height=None,
               min_width=None, min_height=None, max_width=None,
               max_height=None, padding=0.0, margin=0.0,
               left=None, top=None, right=None, bottom=None,
               gap=0.0, content_size=(0.0, 0.0),
               grid_cols: Optional[Sequence] = None,
               grid_rows: Optional[Sequence] = None,
               grid_col=0, grid_col_span=1, grid_row=0,
               grid_row_span=1) -> NodeStyle:
    """Build a NodeStyle. padding/margin accept a scalar or (l, t, r, b);
    gap accepts a scalar or (col_gap, row_gap)."""
    st = NodeStyle()
    st.display = display
    st.position = position
    st.flex_direction = flex_direction
    st.flex_wrap = 1 if flex_wrap else 0
    st.justify_content = justify_content
    st.align_items = align_items
    st.align_self = align_self
    st.align_content = align_content
    st.flex_grow = flex_grow
    st.flex_shrink = flex_shrink
    st.flex_basis = _dim(flex_basis)
    st.width, st.height = _dim(width), _dim(height)
    st.min_width, st.min_height = _dim(min_width), _dim(min_height)
    if max_width is None:
        st.max_width = Dim(3.4e38, PX)
    else:
        st.max_width = _dim(max_width)
    if max_height is None:
        st.max_height = Dim(3.4e38, PX)
    else:
        st.max_height = _dim(max_height)
    pad = (padding,) * 4 if isinstance(padding, (int, float)) else tuple(padding)
    mar = (margin,) * 4 if isinstance(margin, (int, float)) else tuple(margin)
    st.padding = (ctypes.c_float * 4)(*[float(p) for p in pad])
    st.margin = (ctypes.c_float * 4)(*[float(m) for m in mar])
    ins = [left, top, right, bottom]
    st.inset = (Dim * 4)(*[_dim(v) for v in ins])
    g = (gap, gap) if isinstance(gap, (int, float)) else tuple(gap)
    st.gap = (ctypes.c_float * 2)(float(g[0]), float(g[1]))
    st.content_w, st.content_h = float(content_size[0]), float(content_size[1])
    for tracks, field_n, field_a in ((grid_cols, "n_grid_cols", "grid_cols"),
                                     (grid_rows, "n_grid_rows", "grid_rows")):
        if tracks:
            tr = list(tracks)[:_MAX_TRACKS]
            setattr(st, field_n, len(tr))
            arr = (Dim * _MAX_TRACKS)()
            for i, tv in enumerate(tr):
                arr[i] = _dim(tv)
            setattr(st, field_a, arr)
    st.grid_col_start = int(grid_col)
    st.grid_col_span = int(grid_col_span)
    st.grid_row_start = int(grid_row)
    st.grid_row_span = int(grid_row_span)
    return st


def solve(styles: List[NodeStyle], parents: Sequence[int],
          avail_w: float, avail_h: float) -> List[Tuple[float, float, float, float]]:
    """Solve layout for a forest. Returns absolute (x, y, w, h) per node
    (origin top-left, y-down). parents[i] < 0 marks a root."""
    n = len(styles)
    if n == 0:
        return []
    lib = _get_lib()
    if lib is not None:
        sarr = (NodeStyle * n)(*styles)
        parr = (ctypes.c_int32 * n)(*[int(p) for p in parents])
        out = (NodeLayout * n)()
        rc = lib.bevy_layout_solve(n, sarr, parr, float(avail_w),
                                   float(avail_h), out)
        if rc == 0:
            return [(o.x, o.y, o.w, o.h) for o in out]
    return _solve_py(styles, parents, avail_w, avail_h)


def _solve_py(styles, parents, avail_w, avail_h):
    """Pure-Python fallback: fixed-size column/row stacking only (the
    pre-native behavior). Used when g++ is missing."""
    n = len(styles)
    kids: List[List[int]] = [[] for _ in range(n)]
    roots = []
    for i, p in enumerate(parents):
        if 0 <= p < n:
            kids[p].append(i)
        else:
            roots.append(i)
    out = [(0.0, 0.0, 0.0, 0.0)] * n

    def size_of(i):
        st = styles[i]
        w = st.width.value if st.width.unit == PX else st.content_w
        h = st.height.value if st.height.unit == PX else st.content_h
        return w, h

    def place(i, x, y):
        st = styles[i]
        w, h = size_of(i)
        out[i] = (x, y, w, h)
        cx, cy = x + st.padding[0], y + st.padding[1]
        for c in kids[i]:
            place(c, cx, cy)
            cw, ch = size_of(c)
            if st.flex_direction in (ROW, ROW_REVERSE):
                cx += cw + st.gap[0]
            else:
                cy += ch + st.gap[1]

    for r in roots:
        st = styles[r]
        x = st.inset[0].value if st.inset[0].unit == PX else 0.0
        y = st.inset[1].value if st.inset[1].unit == PX else 0.0
        place(r, x, y)
    return out
