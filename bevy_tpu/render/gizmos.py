"""Gizmos — immediate-mode debug drawing (reference twin: bevy_gizmos —
`Gizmos` system param accumulating per-frame primitives `src/gizmos.rs`,
rendered by bevy_gizmos_render's polyline pipeline into transparent phases).

TPU design: a line segment is a thin rotated solid quad — gizmos append
into a fixed per-frame device buffer and one pass feeds them through the
existing sprite rasterizer after the 2D overlay. 3D endpoints project
through the active Camera3d first.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from bevy_tpu.app.main_schedule import Render
from bevy_tpu.app.plugin import Plugin
from bevy_tpu.ecs._state import set_in
from bevy_tpu.ecs.component import component, field
from bevy_tpu.ecs.query import Query, Read, ResMut
from bevy_tpu.ecs.system import system
from bevy_tpu.render.camera import (
    Camera2d, Camera3d, perspective_infinite_reverse, pick_camera,
    quat_z_angle, view_matrix, world_to_screen_2d,
)
from bevy_tpu.render.plugin import OVERLAY_SET, POST_SET, RenderTarget

GIZMO_RES = "gizmo_lines"


class Gizmos:  # registered as a system param type at end of module
    """System param (ref: Gizmos). Methods append segments; `budget` caps
    appends per system per frame."""

    def __init__(self, budget: int = 256):
        self.budget = budget

    def reads(self):
        return set()

    def writes(self):
        return {"res:" + GIZMO_RES}

    def build(self, state, world, sysctx):
        return GizmosView(self, state["res"][GIZMO_RES])


class GizmosView:
    def __init__(self, param, store):
        self._param = param
        self._store = store
        self._segments = []   # (a, b, color, width, is3d) per batch

    def line(self, a, b, color=(1.0, 1.0, 1.0, 1.0), width=2.0):
        """3D world-space segment(s); a/b (3,) or (n, 3)."""
        self._segments.append((a, b, color, width, True))

    def line_2d(self, a, b, color=(1.0, 1.0, 1.0, 1.0), width=2.0):
        """2D world-space segment(s); a/b (2,) or (n, 2)."""
        self._segments.append((a, b, color, width, False))

    def rect_2d(self, center, size, color=(1.0, 1.0, 1.0, 1.0), width=2.0):
        cx, cy = center[0], center[1]
        hx, hy = size[0] / 2, size[1] / 2
        corners = [(cx - hx, cy - hy), (cx + hx, cy - hy),
                   (cx + hx, cy + hy), (cx - hx, cy + hy)]
        for i in range(4):
            self.line_2d(jnp.asarray(corners[i]),
                         jnp.asarray(corners[(i + 1) % 4]), color, width)

    # -- shape vocabulary (ref: bevy_gizmos src/circles.rs, arcs.rs,
    # primitives/, grid.rs — all decompose to batched segments) ------

    def linestrip(self, points, color=(1.0, 1.0, 1.0, 1.0), width=2.0):
        p = jnp.asarray(points, jnp.float32)
        self.line(p[:-1], p[1:], color, width)

    def linestrip_2d(self, points, color=(1.0, 1.0, 1.0, 1.0), width=2.0):
        p = jnp.asarray(points, jnp.float32)
        self.line_2d(p[:-1], p[1:], color, width)

    def arc_2d(self, center, radius, start=0.0, sweep=2 * 3.14159265,
               color=(1.0, 1.0, 1.0, 1.0), width=2.0, segments=32):
        t = start + jnp.linspace(0.0, sweep, segments + 1)
        c = jnp.asarray(center, jnp.float32)
        pts = c + radius * jnp.stack([jnp.cos(t), jnp.sin(t)], 1)
        self.linestrip_2d(pts, color, width)

    def circle_2d(self, center, radius, color=(1.0, 1.0, 1.0, 1.0),
                  width=2.0, segments=32):
        self.arc_2d(center, radius, 0.0, 2 * 3.14159265, color, width,
                    segments)

    def circle(self, center, normal, radius, color=(1.0, 1.0, 1.0, 1.0),
               width=2.0, segments=32):
        """3D circle in the plane perpendicular to `normal`."""
        n = jnp.asarray(normal, jnp.float32)
        n = n / jnp.maximum(jnp.linalg.norm(n), 1e-6)
        ref = jnp.where(jnp.abs(n[0]) < 0.9,
                        jnp.asarray([1.0, 0.0, 0.0]),
                        jnp.asarray([0.0, 1.0, 0.0]))
        u = jnp.cross(n, ref)
        u = u / jnp.maximum(jnp.linalg.norm(u), 1e-6)
        v = jnp.cross(n, u)
        t = jnp.linspace(0.0, 2 * 3.14159265, segments + 1)
        c = jnp.asarray(center, jnp.float32)
        pts = c + radius * (jnp.cos(t)[:, None] * u + jnp.sin(t)[:, None] * v)
        self.linestrip(pts, color, width)

    def sphere(self, center, radius, color=(1.0, 1.0, 1.0, 1.0),
               width=2.0, segments=32):
        """Three orthogonal great circles (ref: SphereBuilder)."""
        for axis in ((1.0, 0.0, 0.0), (0.0, 1.0, 0.0), (0.0, 0.0, 1.0)):
            self.circle(center, axis, radius, color, width, segments)

    def cuboid(self, center, half_size, color=(1.0, 1.0, 1.0, 1.0),
               width=2.0):
        """Wireframe box: 12 edges as one batched append."""
        c = jnp.asarray(center, jnp.float32)
        h = jnp.asarray(half_size, jnp.float32)
        sgn = jnp.asarray([[sx, sy, sz] for sx in (-1, 1)
                           for sy in (-1, 1) for sz in (-1, 1)], jnp.float32)
        corners = c + sgn * h                      # (8,3), bit i = axis sign
        edges = [(0, 1), (2, 3), (4, 5), (6, 7),   # z edges
                 (0, 2), (1, 3), (4, 6), (5, 7),   # y edges
                 (0, 4), (1, 5), (2, 6), (3, 7)]   # x edges
        ea = corners[jnp.asarray([e[0] for e in edges])]
        eb = corners[jnp.asarray([e[1] for e in edges])]
        self.line(ea, eb, color, width)

    def grid_2d(self, center, cell_size, counts,
                color=(1.0, 1.0, 1.0, 1.0), width=1.0):
        cx, cy = float(center[0]), float(center[1])
        sx, sy = float(cell_size[0]), float(cell_size[1])
        nx, ny = int(counts[0]), int(counts[1])
        hw, hh = nx * sx / 2, ny * sy / 2
        xs = cx - hw + jnp.arange(nx + 1, dtype=jnp.float32) * sx
        ys = cy - hh + jnp.arange(ny + 1, dtype=jnp.float32) * sy
        va = jnp.stack([xs, jnp.full(nx + 1, cy - hh)], 1)
        vb = jnp.stack([xs, jnp.full(nx + 1, cy + hh)], 1)
        ha = jnp.stack([jnp.full(ny + 1, cx - hw), ys], 1)
        hb = jnp.stack([jnp.full(ny + 1, cx + hw), ys], 1)
        self.line_2d(va, vb, color, width)
        self.line_2d(ha, hb, color, width)

    def grid(self, center, cell_size, counts,
             color=(1.0, 1.0, 1.0, 1.0), width=1.0):
        """XZ-plane 3D grid (ref: GridBuilder default orientation)."""
        cx, cy, cz = (float(center[i]) for i in range(3))
        sx, sz = float(cell_size[0]), float(cell_size[1])
        nx, nz = int(counts[0]), int(counts[1])
        hw, hd = nx * sx / 2, nz * sz / 2
        xs = cx - hw + jnp.arange(nx + 1, dtype=jnp.float32) * sx
        zs = cz - hd + jnp.arange(nz + 1, dtype=jnp.float32) * sz
        va = jnp.stack([xs, jnp.full(nx + 1, cy), jnp.full(nx + 1, cz - hd)], 1)
        vb = jnp.stack([xs, jnp.full(nx + 1, cy), jnp.full(nx + 1, cz + hd)], 1)
        ha = jnp.stack([jnp.full(nz + 1, cx - hw), jnp.full(nz + 1, cy), zs], 1)
        hb = jnp.stack([jnp.full(nz + 1, cx + hw), jnp.full(nz + 1, cy), zs], 1)
        self.line(va, vb, color, width)
        self.line(ha, hb, color, width)

    def axes(self, position, rotation=None, length=1.0, width=2.0):
        """RGB basis axes at a pose (ref: axes.rs)."""
        from bevy_tpu.math.quat import quat_rotate_vec3 as quat_rotate
        p = jnp.asarray(position, jnp.float32)
        for axis, col in (((1.0, 0.0, 0.0), (1.0, 0.2, 0.2, 1.0)),
                          ((0.0, 1.0, 0.0), (0.2, 1.0, 0.2, 1.0)),
                          ((0.0, 0.0, 1.0), (0.2, 0.4, 1.0, 1.0))):
            d = jnp.asarray(axis, jnp.float32)
            if rotation is not None:
                d = quat_rotate(jnp.asarray(rotation, jnp.float32), d)
            self.line(p, p + d * length, col, width)

    def arrow(self, a, b, color=(1.0, 1.0, 1.0, 1.0), width=2.0,
              tip=0.15):
        """Segment with a two-line head at `b` (ref: arrows.rs)."""
        a = jnp.asarray(a, jnp.float32)
        b = jnp.asarray(b, jnp.float32)
        d = b - a
        ln = jnp.maximum(jnp.linalg.norm(d), 1e-6)
        dn = d / ln
        ref = jnp.where(jnp.abs(dn[0]) < 0.9,
                        jnp.asarray([1.0, 0.0, 0.0]),
                        jnp.asarray([0.0, 1.0, 0.0]))
        side = jnp.cross(dn, ref)
        side = side / jnp.maximum(jnp.linalg.norm(side), 1e-6)
        t = ln * tip
        self.line(a, b, color, width)
        self.line(b, b - dn * t + side * t * 0.5, color, width)
        self.line(b, b - dn * t - side * t * 0.5, color, width)

    def arrow_2d(self, a, b, color=(1.0, 1.0, 1.0, 1.0), width=2.0,
                 tip=0.15):
        a = jnp.asarray(a, jnp.float32)
        b = jnp.asarray(b, jnp.float32)
        d = b - a
        ln = jnp.maximum(jnp.linalg.norm(d), 1e-6)
        dn = d / ln
        side = jnp.stack([-dn[1], dn[0]])
        t = ln * tip
        self.line_2d(a, b, color, width)
        self.line_2d(b, b - dn * t + side * t * 0.5, color, width)
        self.line_2d(b, b - dn * t - side * t * 0.5, color, width)

    def cross_2d(self, position, half_size=0.5,
                 color=(1.0, 1.0, 1.0, 1.0), width=2.0):
        """2D cross marker (ref: bevy_gizmos src/cross.rs)."""
        p = jnp.asarray(position, jnp.float32)
        h = half_size
        self.line_2d(p + jnp.asarray([-h, 0.0]), p + jnp.asarray([h, 0.0]),
                     color, width)
        self.line_2d(p + jnp.asarray([0.0, -h]), p + jnp.asarray([0.0, h]),
                     color, width)

    def cross(self, position, half_size=0.5,
              color=(1.0, 1.0, 1.0, 1.0), width=2.0):
        """3D axis-aligned cross marker (ref: cross.rs)."""
        p = jnp.asarray(position, jnp.float32)
        for ax in ((1.0, 0.0, 0.0), (0.0, 1.0, 0.0), (0.0, 0.0, 1.0)):
            d = half_size * jnp.asarray(ax, jnp.float32)
            self.line(p - d, p + d, color, width)

    def text_2d(self, position, text, size=12.0,
                color=(1.0, 1.0, 1.0, 1.0), width=1.5):
        """Debug text drawn as stroke-font polylines in 2D world space;
        `text` must be static at trace time (ref: bevy_gizmos
        stroke_text.rs text_2d). Returns the measured (w, h)."""
        from bevy_tpu.render.stroke_font import layout, measure

        p = jnp.asarray(position, jnp.float32)
        for poly in layout(str(text), float(size)):
            if len(poly) >= 2:
                self.linestrip_2d(
                    p + jnp.asarray(poly, jnp.float32), color, width)
        return measure(str(text), float(size))

    def text(self, position, text, size=1.0, rotation=None,
             color=(1.0, 1.0, 1.0, 1.0), width=1.5):
        """3D stroke text on the plane of `rotation` (quat, default
        identity = XY plane facing +Z; ref: stroke_text.rs text())."""
        from bevy_tpu.math.quat import quat_rotate_vec3
        from bevy_tpu.render.stroke_font import layout, measure

        p = jnp.asarray(position, jnp.float32)
        for poly in layout(str(text), float(size)):
            if len(poly) < 2:
                continue
            pts = jnp.asarray([(x, y, 0.0) for x, y in poly], jnp.float32)
            if rotation is not None:
                q = jnp.asarray(rotation, jnp.float32)
                pts = jax.vmap(lambda v: quat_rotate_vec3(q, v))(pts)
            self.linestrip(p + pts, color, width)
        return measure(str(text), float(size))

    def ray(self, origin, direction, color=(1.0, 1.0, 1.0, 1.0),
            width=2.0):
        o = jnp.asarray(origin, jnp.float32)
        self.line(o, o + jnp.asarray(direction, jnp.float32), color, width)

    def merge(self, state, tick):
        if not self._segments:
            return state
        store = dict(state["res"][GIZMO_RES])
        cap = store["a"].shape[0]
        budget = self._param.budget
        for seg in self._segments:
            a, b, color, width, is3d = seg[:5]
            valid = seg[5] if len(seg) > 5 else None
            a = jnp.atleast_2d(jnp.asarray(a, jnp.float32))
            b = jnp.atleast_2d(jnp.asarray(b, jnp.float32))
            n = a.shape[0]
            if a.shape[1] == 2:
                a = jnp.concatenate([a, jnp.zeros((n, 1))], 1)
                b = jnp.concatenate([b, jnp.zeros((n, 1))], 1)
            n = min(n, budget)
            if valid is not None:
                # compact valid rows so masked appends consume no budget
                v = valid[:n]
                rows = store["count"] + jnp.cumsum(v.astype(jnp.int32)) - 1
                ok = v & (rows < cap)
            else:
                rows = store["count"] + jnp.arange(n, dtype=jnp.int32)
                ok = rows < cap
            rows = jnp.where(ok, rows, cap)
            col = jnp.broadcast_to(jnp.asarray(color, jnp.float32), (n, 4))
            store = dict(
                store,
                a=store["a"].at[rows].set(a[:n], mode="drop"),
                b=store["b"].at[rows].set(b[:n], mode="drop"),
                color=store["color"].at[rows].set(col, mode="drop"),
                width=store["width"].at[rows].set(
                    jnp.full(n, width, jnp.float32), mode="drop"),
                is3d=store["is3d"].at[rows].set(
                    jnp.full(n, is3d, jnp.bool_), mode="drop"),
                count=store["count"] + jnp.sum(ok.astype(jnp.int32)),
            )
        return set_in(state, ("res", GIZMO_RES), store)


@system(name="clear_gizmos")
def clear_gizmos(g=ResMut(GIZMO_RES)):
    g.count = jnp.zeros((), jnp.int32)


def make_gizmo_pass(width, height, backend="auto"):
    from bevy_tpu.ops.raster2d import pack_sprite_instances, raster_sprites
    from bevy_tpu.transform import GlobalTransform

    if backend == "auto":
        backend = "pallas" if jax.default_backend() not in ("cpu", "gpu") \
            else "xla"

    @system(name="gizmo_pass")
    def gizmo_pass(g=ResMut(GIZMO_RES),
                   cam2=Query(Read(Camera2d), Read(GlobalTransform)),
                   cam3=Query(Read(Camera3d), Read(GlobalTransform)),
                   target=ResMut(RenderTarget.RESOURCE)):
        cap = g.a.shape[0]
        lane = jnp.arange(cap, dtype=jnp.int32)
        active = lane < g.count

        # 3D endpoints → screen via Camera3d
        c3, has3 = pick_camera(cam3.mask)
        gt3 = cam3.global_transform
        view = view_matrix(gt3.translation[c3], gt3.rotation[c3], gt3.scale[c3])
        proj = perspective_infinite_reverse(
            cam3.camera3d.fov[c3], width / height, cam3.camera3d.near[c3])
        vp = proj @ view

        def project(p):
            ph = jnp.concatenate([p, jnp.ones((cap, 1))], 1)
            clip = (vp @ ph.T).T
            w = clip[:, 3]
            ok = w > 1e-4
            inv = 1.0 / jnp.where(ok, w, 1.0)
            return jnp.stack([(clip[:, 0] * inv * 0.5 + 0.5) * width,
                              (0.5 - clip[:, 1] * inv * 0.5) * height], 1), ok

        a3, ok_a = project(g.a)
        b3, ok_b = project(g.b)

        # 2D endpoints → screen via Camera2d
        c2, has2 = pick_camera(cam2.mask)
        gt2 = cam2.global_transform
        ang = quat_z_angle(gt2.rotation[c2])
        a2 = world_to_screen_2d(g.a[:, :2], gt2.translation[c2, :2],
                                jnp.cos(ang), jnp.sin(ang),
                                cam2.camera2d.scale[c2], width, height)
        b2 = world_to_screen_2d(g.b[:, :2], gt2.translation[c2, :2],
                                jnp.cos(ang), jnp.sin(ang),
                                cam2.camera2d.scale[c2], width, height)

        use3 = g.is3d & has3
        pa = jnp.where(use3[:, None], a3, a2)
        pb = jnp.where(use3[:, None], b3, b2)
        visible = active & jnp.where(g.is3d, ok_a & ok_b & has3, has2)

        d = pb - pa
        length = jnp.sqrt(jnp.sum(d * d, 1))
        rot = jnp.arctan2(d[:, 1], d[:, 0])
        packed = pack_sprite_instances(
            center=(pa + pb) * 0.5,
            half=jnp.stack([length * 0.5 + g.width * 0.5, g.width * 0.5], 1),
            rot=rot, color=g.color,
            uv_min=jnp.zeros((cap, 2)), uv_max=jnp.ones((cap, 2)),
            tex=jnp.full(cap, -1, jnp.int32),
            z=lane.astype(jnp.float32), active=visible)
        if backend == "pallas":
            from bevy_tpu.ops.raster2d_pallas import raster_sprites_pallas
            fb, _ = raster_sprites_pallas(
                target.color, packed,
                jnp.ones((4, 1, 1), jnp.float32))
            target.color = fb
        else:
            fbi, _ = raster_sprites(
                target.color.transpose(1, 2, 0), packed,
                jnp.ones((1, 1, 4), jnp.float32))
            target.color = fbi.transpose(2, 0, 1)

    return gizmo_pass


class GizmosPlugin(Plugin):
    """ref: GizmoPlugin + bevy_gizmos_render. `capacity` bounds retained
    lines per frame."""

    def __init__(self, capacity: int = 1024, backend="auto"):
        self.capacity = capacity
        self.backend = backend

    def build(self, app):
        from bevy_tpu.render.plugin import RenderPlugin
        rp = next((p for p in app._plugins if isinstance(p, RenderPlugin)), None)
        if rp is None:
            raise RuntimeError("GizmosPlugin requires RenderPlugin")
        from bevy_tpu.transform import GlobalTransform, Transform  # noqa: F401
        app.world.register_component(Camera2d)
        app.world.register_component(Camera3d)
        cap = self.capacity
        app.insert_resource(GIZMO_RES, {
            "a": jnp.zeros((cap, 3), jnp.float32),
            "b": jnp.zeros((cap, 3), jnp.float32),
            "color": jnp.zeros((cap, 4), jnp.float32),
            "width": jnp.zeros(cap, jnp.float32),
            "is3d": jnp.zeros(cap, jnp.bool_),
            "count": jnp.zeros((), jnp.int32),
        })
        # gizmos accumulate during Update; the pass draws them in OVERLAY
        # and the buffer clears in POST (after drawing, before next frame)
        app.add_systems(Render,
                        make_gizmo_pass(rp.width, rp.height, self.backend),
                        in_set=OVERLAY_SET, after="sprite_pass")
        app.add_systems(Render, clear_gizmos, in_set=POST_SET)
        from bevy_tpu.app.main_schedule import Update
        app.world.register_component(RetainedGizmo)
        app.add_systems(Update, draw_retained_gizmos)


from bevy_tpu.ecs.system import register_param_type  # noqa: E402

register_param_type(Gizmos)


@component
class RetainedGizmo:
    """Persistent line segment drawn every frame (ref: bevy_gizmos
    src/retained.rs — retained gizmo assets vs the immediate API).
    Edit fields in-jit to animate; despawn to remove."""
    a = field(3)
    b = field(3)
    color = field(4, default=(1.0, 1.0, 1.0, 1.0))
    width = field((), jnp.float32, default=2.0)
    is3d = field((), jnp.bool_, default=True)


@system(name="draw_retained_gizmos")
def draw_retained_gizmos(q=Query(RetainedGizmo), g=Gizmos(budget=1024)):
    sel = q.retained_gizmo
    # masked batched append: only live rows consume gizmo budget
    g._segments.append((sel.a, sel.b, sel.color, sel.width, sel.is3d,
                        q.mask))


class UiDebugOverlayPlugin(Plugin):
    """Draw every UI node's layout rect (ref: bevy_dev_tools's UI debug
    overlay). Requires UiPlugin + GizmosPlugin."""

    def __init__(self, color=(0.2, 1.0, 0.6, 0.9), width=1.0):
        self.color = color
        self.width = width

    def build(self, app):
        from bevy_tpu.app.main_schedule import Update

        color, lw = self.color, self.width

        @system(name="ui_debug_overlay")
        def ui_debug_overlay(g=Gizmos(budget=1024)):
            ui = getattr(app, "ui", None)
            if ui is None:
                return
            for row, (x, y, w, h) in ui._rects.items():
                cx = x + w / 2 - ui.width / 2
                cy = ui.height / 2 - (y + h / 2)
                g.rect_2d((cx, cy), (w, h), color, lw)

        app.add_systems(Update, ui_debug_overlay)
