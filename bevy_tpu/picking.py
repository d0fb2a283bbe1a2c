"""Picking (reference twin: bevy_picking — backends emit PointerHits
`src/backend.rs:93`; mesh raycasting backend `src/mesh_picking/`).

Vectorized Möller–Trumbore over every instance triangle at once (the
reference walks a BVH per mesh; at TPU batch widths brute force over the
scene is one fused elementwise pass).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from bevy_tpu.math.affine import TRS, trs_to_mat4
from bevy_tpu.math.quat import quat_rotate_vec3
from bevy_tpu.render.mesh3d import Mesh3d
from bevy_tpu.transform import GlobalTransform


def screen_ray(cam_translation, cam_rotation, fov, width, height, px, py):
    """Pixel → world-space ray (origin, direction) for a perspective
    Camera3d (ref: Camera::viewport_to_world)."""
    ndx = 2.0 * (px + 0.5) / width - 1.0
    ndy = 1.0 - 2.0 * (py + 0.5) / height
    f = 1.0 / jnp.tan(fov * 0.5)
    aspect = width / height
    d_view = jnp.asarray([ndx * aspect / f, ndy / f, -1.0], jnp.float32)
    d_world = quat_rotate_vec3(cam_rotation, d_view)
    d_world = d_world / jnp.linalg.norm(d_world)
    return jnp.asarray(cam_translation, jnp.float32), d_world


def raycast(origin, direction, v0, v1, v2):
    """Batched Möller–Trumbore: (T,3) triangle corners → (t, hit) arrays.
    Backface hits count (the reference's default Backfaces::Include)."""
    eps = 1e-7
    e1 = v1 - v0
    e2 = v2 - v0
    h = jnp.cross(jnp.broadcast_to(direction, e2.shape), e2)
    a = jnp.sum(e1 * h, -1)
    ok = jnp.abs(a) > eps
    f = 1.0 / jnp.where(ok, a, 1.0)
    s = origin - v0
    u = f * jnp.sum(s * h, -1)
    q = jnp.cross(s, e1)
    v = f * jnp.sum(direction * q, -1)
    t = f * jnp.sum(e2 * q, -1)
    hit = ok & (u >= 0) & (v >= 0) & (u + v <= 1) & (t > eps)
    return jnp.where(hit, t, jnp.inf), hit


def pick_mesh3d(world, plugin, origin, direction):
    """Cast a ray against every Mesh3d instance of `plugin` (Mesh3dPlugin).
    Returns (entity_row or -1, distance). Host-callable (one jit dispatch)."""
    uni = plugin._uniform
    rows = world.query_rows(Mesh3d)
    if len(rows) == 0:
        return -1, float("inf")
    origin = jnp.asarray(origin, jnp.float32)
    direction = jnp.asarray(direction, jnp.float32)

    gt = world.state["comp"]["global_transform"]["f"]
    rows_j = jnp.asarray(rows, jnp.int32)
    mats = trs_to_mat4(TRS(translation=gt["translation"][rows_j],
                           rotation=gt["rotation"][rows_j],
                           scale=gt["scale"][rows_j]))   # (Ni,4,4)
    if uni is not None:
        meshes = [plugin.pool.meshes[uni["mesh"]]] * len(rows)
    else:
        ids = np.asarray(jax.device_get(
            world.column(Mesh3d, "mesh")))[rows]
        meshes = [plugin.pool.meshes[int(i)] for i in ids]

    best_t, best_row = jnp.inf, jnp.asarray(-1, jnp.int32)
    # group instances per mesh id for batched transforms
    if uni is not None:
        m = meshes[0]
        ph = jnp.concatenate([jnp.asarray(m.positions),
                              jnp.ones((m.num_vertices, 1))], 1)
        wv = jnp.einsum("nij,vj->nvi", mats, ph)[..., :3]   # (Ni, VC, 3)
        tri = jnp.asarray(m.triangles, jnp.int32)
        v0 = wv[:, tri[:, 0]].reshape(-1, 3)
        v1 = wv[:, tri[:, 1]].reshape(-1, 3)
        v2 = wv[:, tri[:, 2]].reshape(-1, 3)
        t, hit = raycast(origin, direction, v0, v1, v2)
        alive = world.mask_of(Mesh3d)[rows_j]
        t = jnp.where(jnp.repeat(alive, m.num_triangles), t, jnp.inf)
        k = jnp.argmin(t)
        best_t = t[k]
        best_row = jnp.where(jnp.isfinite(best_t),
                             rows_j[k // m.num_triangles], -1)
    else:
        for i, m in enumerate(meshes):
            ph = jnp.concatenate([jnp.asarray(m.positions),
                                  jnp.ones((m.num_vertices, 1))], 1)
            wv = (mats[i] @ ph.T).T[:, :3]
            tri = jnp.asarray(m.triangles, jnp.int32)
            t, hit = raycast(origin, direction,
                             wv[tri[:, 0]], wv[tri[:, 1]], wv[tri[:, 2]])
            tmin = jnp.min(t)
            better = tmin < best_t
            best_row = jnp.where(better, rows_j[i], best_row)
            best_t = jnp.minimum(best_t, tmin)

    row = int(jax.device_get(best_row))
    dist = float(jax.device_get(best_t))
    return (row, dist) if row >= 0 and np.isfinite(dist) else (-1, float("inf"))


def pick_at_pixel(app, plugin, px, py):
    """Mouse-style pick: pixel → ray → nearest Mesh3d entity row
    (ref: the pointer→PointerHits flow)."""
    from bevy_tpu.render.camera import Camera3d
    from bevy_tpu.render.plugin import RenderTarget

    cams = app.world.query_rows(Camera3d)
    if len(cams) == 0:
        return -1, float("inf")
    cam = int(cams[0])
    gt = app.world.get(cam, GlobalTransform)
    fov = float(app.world.get(cam, Camera3d).fov)
    size = jax.device_get(
        app.world.state["res"][RenderTarget.RESOURCE]["size"])
    origin, direction = screen_ray(
        jnp.asarray(gt.translation), jnp.asarray(gt.rotation),
        jnp.asarray(fov), float(size[0]), float(size[1]),
        jnp.asarray(float(px)), jnp.asarray(float(py)))
    return pick_mesh3d(app.world, plugin, origin, direction)


# ----------------------------------------------------------------------
# Sprite picking backend (ref: bevy_sprite_render's sprite picking +
# bevy_picking's HoverMap/Pointer<Over/Out/Click> events — backends emit
# hits, core dispatches pointer events; here one in-jit system does both)

from bevy_tpu.app.main_schedule import PreUpdate
from bevy_tpu.app.plugin import Plugin
from bevy_tpu.ecs.observer import Trigger, event
from bevy_tpu.ecs.query import Read, Res, ResMut
from bevy_tpu.ecs.component import field as _f


@event
class PointerOver:
    """Cursor entered a sprite (ref: Pointer<Over>)."""
    row = _f((), jnp.int32)


@event
class PointerOut:
    """Cursor left a sprite (ref: Pointer<Out>)."""
    row = _f((), jnp.int32)


@event
class PointerClick:
    """Press began over a sprite (ref: Pointer<Click>). Like all pointer
    events this bubbles: observe with On(PointerClick, bubble=True) and a
    handler on any ChildOf ancestor reacts via `view.bubble_mask()[row]`
    (ref: bevy_picking/src/events.rs bubbled dispatch)."""
    row = _f((), jnp.int32)


@event
class PointerPressed:
    """Button went down over a sprite (ref: Pointer<Pressed>)."""
    row = _f((), jnp.int32)


@event
class PointerReleased:
    """Button came up; row is the press-target (ref: Pointer<Released>)."""
    row = _f((), jnp.int32)


@event
class PointerMove:
    """Cursor moved while over a sprite (ref: Pointer<Move>); dx/dy are
    screen-pixel deltas since the previous frame."""
    row = _f((), jnp.int32)
    dx = _f((), jnp.float32)
    dy = _f((), jnp.float32)


@event
class PointerDragStart:
    """Cursor moved past the drag threshold while pressed on a sprite
    (ref: Pointer<DragStart>, bevy_picking/src/events.rs)."""
    row = _f((), jnp.int32)


@event
class PointerDrag:
    """Per-frame drag update; dx/dy screen-pixel deltas since last frame,
    tx/ty total since press (ref: Pointer<Drag> delta/distance)."""
    row = _f((), jnp.int32)
    dx = _f((), jnp.float32)
    dy = _f((), jnp.float32)
    tx = _f((), jnp.float32)
    ty = _f((), jnp.float32)


@event
class PointerDragEnd:
    """Button released after a drag (ref: Pointer<DragEnd>)."""
    row = _f((), jnp.int32)


@event
class PointerDragDrop:
    """A dragged sprite was dropped onto another: row is the drop target,
    dropped is the dragged sprite (ref: Pointer<DragDrop>)."""
    row = _f((), jnp.int32)
    dropped = _f((), jnp.int32)


class SpritePickingPlugin(Plugin):
    """Per-frame in-jit hover resolution over every sprite (rotation
    aware, topmost z wins) + pointer event dispatch via observers.

    Event set (ref: bevy_picking/src/events.rs): Over/Out/Click plus
    Pressed/Released/Move and the drag family DragStart/Drag/DragEnd/
    DragDrop, all computed in-jit from mouse channels + hover state.
    `drag_threshold` is in screen pixels (ref: PointerInputSettings)."""

    def __init__(self, width, height, drag_threshold: float = 2.0):
        self.width = width
        self.height = height
        self.drag_threshold = float(drag_threshold)

    def build(self, app):
        from bevy_tpu.ecs.query import Query
        from bevy_tpu.ecs.system import system
        from bevy_tpu.render.camera import Camera2d, pick_camera, \
            quat_z_angle
        from bevy_tpu.render.sprite import Sprite
        from bevy_tpu.transform import GlobalTransform

        from bevy_tpu.ecs.observer import register_event_storage
        for ev in (PointerOver, PointerOut, PointerClick, PointerPressed,
                   PointerReleased, PointerMove, PointerDragStart,
                   PointerDrag, PointerDragEnd, PointerDragDrop):
            register_event_storage(app.world, ev, 64)
        width, height = self.width, self.height
        thresh = self.drag_threshold
        app.insert_resource("pointer_state", {
            "hovered": jnp.full((), -1, jnp.int32),
            "pressed_row": jnp.full((), -1, jnp.int32),
            "dragging": jnp.zeros((), bool),
            "press_xy": jnp.zeros((2,), jnp.float32),
            "last_xy": jnp.zeros((2,), jnp.float32),
        })

        @system(name="sprite_picking")
        def sprite_picking(q=Query(Read(Sprite), Read(GlobalTransform)),
                           cam=Query(Read(Camera2d),
                                     Read(GlobalTransform)),
                           mouse=Res("mouse"),
                           ps=ResMut("pointer_state"),
                           over=Trigger(PointerOver),
                           out=Trigger(PointerOut),
                           click=Trigger(PointerClick),
                           pressed=Trigger(PointerPressed),
                           released=Trigger(PointerReleased),
                           moved=Trigger(PointerMove),
                           drag_start=Trigger(PointerDragStart),
                           drag=Trigger(PointerDrag),
                           drag_end=Trigger(PointerDragEnd),
                           drag_drop=Trigger(PointerDragDrop)):
            ci, has_cam = pick_camera(cam.mask)
            cgt = cam.global_transform
            ang = quat_z_angle(cgt.rotation[ci])
            scale = cam.camera2d.scale[ci]
            # screen px → world (inverse of world_to_screen_2d)
            vx = (mouse.position[0] - width / 2) * scale
            vy = (height / 2 - mouse.position[1]) * scale
            ca, sa = jnp.cos(ang), jnp.sin(ang)
            wx = ca * vx - sa * vy + cgt.translation[ci, 0]
            wy = sa * vx + ca * vy + cgt.translation[ci, 1]
            # point into each sprite's local frame
            d = jnp.stack([wx - q.global_transform.translation[:, 0],
                           wy - q.global_transform.translation[:, 1]], 1)
            sang = quat_z_angle(q.global_transform.rotation)
            cs_, sn_ = jnp.cos(-sang), jnp.sin(-sang)
            lx = cs_ * d[:, 0] - sn_ * d[:, 1]
            ly = sn_ * d[:, 0] + cs_ * d[:, 1]
            half = q.sprite.size * q.global_transform.scale[:, :2] * 0.5
            inside = (jnp.abs(lx) <= half[:, 0]) & \
                (jnp.abs(ly) <= half[:, 1]) & q.mask & has_cam & \
                (q.sprite.color[:, 3] > 0.01)
            z = q.global_transform.translation[:, 2]
            key = jnp.where(inside, z, -jnp.inf)
            top = jnp.argmax(key)
            hovered = jnp.where(jnp.any(inside), top.astype(jnp.int32),
                                -1)
            prev = ps.hovered
            changed = hovered != prev
            over.trigger(count=(changed & (hovered >= 0)).astype(jnp.int32),
                         row=hovered)
            out.trigger(count=(changed & (prev >= 0)).astype(jnp.int32),
                        row=prev)
            click.trigger(
                count=(mouse.just_pressed[0] & (hovered >= 0))
                .astype(jnp.int32), row=hovered)

            # --- press / release / move / drag family -------------------
            cur = jnp.stack([mouse.position[0], mouse.position[1]]
                            ).astype(jnp.float32)
            delta = cur - ps.last_xy
            moved_any = jnp.any(delta != 0.0)
            press_now = mouse.just_pressed[0] & (hovered >= 0)
            pressed.trigger(count=press_now.astype(jnp.int32), row=hovered)
            moved.trigger(
                count=(moved_any & (hovered >= 0)).astype(jnp.int32),
                row=hovered, dx=delta[0], dy=delta[1])

            p_row = jnp.where(press_now, hovered, ps.pressed_row)
            press_xy = jnp.where(press_now, cur, ps.press_xy)
            down = mouse.pressed[0] & (p_row >= 0)
            total = cur - press_xy
            past = jnp.sum(total * total) > thresh * thresh
            start_now = down & ~ps.dragging & past
            dragging = (ps.dragging | start_now) & down
            drag_start.trigger(count=start_now.astype(jnp.int32), row=p_row)
            drag.trigger(count=(dragging & moved_any).astype(jnp.int32),
                         row=p_row, dx=delta[0], dy=delta[1],
                         tx=total[0], ty=total[1])
            # Release gates on the CURRENT-frame p_row so a same-frame
            # press+release still fires Released and clears pressed state
            # (ref: bevy_picking events.rs release handling).
            release_now = mouse.just_released[0] & (p_row >= 0)
            released.trigger(count=release_now.astype(jnp.int32),
                             row=p_row)
            end_now = release_now & ps.dragging
            drag_end.trigger(count=end_now.astype(jnp.int32),
                             row=p_row)
            # DragDrop target: top-most hovered sprite EXCLUDING the
            # dragged one — the dragged sprite usually rides the cursor
            # and would otherwise shadow every drop target (ref:
            # bevy_picking events.rs excludes the dragged entity).
            rows_idx = jnp.arange(inside.shape[0], dtype=jnp.int32)
            drop_inside = inside & (rows_idx != p_row)
            drop_key = jnp.where(drop_inside, z, -jnp.inf)
            drop_row = jnp.where(jnp.any(drop_inside),
                                 jnp.argmax(drop_key).astype(jnp.int32), -1)
            drag_drop.trigger(
                count=(end_now & (drop_row >= 0)).astype(jnp.int32),
                row=drop_row, dropped=p_row)

            ps.hovered = hovered
            # Clear pressed state whenever the button is up — belt and
            # braces against missed release edges leaving a stale row.
            ps.pressed_row = jnp.where(release_now | ~mouse.pressed[0],
                                       jnp.full((), -1, jnp.int32), p_row)
            ps.dragging = dragging & ~release_now
            ps.press_xy = press_xy
            ps.last_xy = cur

        app.add_systems(PreUpdate, sprite_picking)
