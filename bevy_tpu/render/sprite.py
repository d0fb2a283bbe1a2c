"""Sprites (reference twin: bevy_sprite Sprite/Anchor components +
bevy_sprite_render extract/queue/prepare/draw —
`src/render/mod.rs:360,442,499` — collapsed into one extract-and-raster
system since phases are sort keys here, not GPU passes).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from bevy_tpu.app.main_schedule import Render
from bevy_tpu.app.plugin import Plugin
from bevy_tpu.ecs.component import component, field
from bevy_tpu.ecs.query import Query, Read, Res, ResMut
from bevy_tpu.ecs.system import system
from bevy_tpu.ops.raster2d import pack_sprite_instances, raster_sprites
from bevy_tpu.render.camera import Camera2d, pick_camera, quat_z_angle, world_to_screen_2d
from bevy_tpu.render.plugin import OVERLAY_SET, RenderTarget
from bevy_tpu.render.texture import TextureAtlas


class Anchor:
    """ref: bevy_sprite Anchor variants (anchor point inside the rect,
    in [-0.5, 0.5]² sprite-local units; translation sits at the anchor)."""
    CENTER = (0.0, 0.0)
    BOTTOM_LEFT = (-0.5, -0.5)
    BOTTOM_CENTER = (0.0, -0.5)
    BOTTOM_RIGHT = (0.5, -0.5)
    CENTER_LEFT = (-0.5, 0.0)
    CENTER_RIGHT = (0.5, 0.0)
    TOP_LEFT = (-0.5, 0.5)
    TOP_CENTER = (0.0, 0.5)
    TOP_RIGHT = (0.5, 0.5)


@component
class Sprite:
    """ref: Sprite (custom_size ⇒ `size` here is required — images provide
    their natural size via the atlas handle at spawn). uv rect + tex index
    address the global atlas (bindless-style); tex < 0 ⇒ solid color."""
    color = field(4, default=(1.0, 1.0, 1.0, 1.0))
    size = field(2, default=(1.0, 1.0))
    anchor = field(2, default=(0.0, 0.0))
    uv_min = field(2, default=(0.0, 0.0))
    uv_max = field(2, default=(1.0, 1.0))
    tex = field((), jnp.int32, default=-1)
    layers = field((), jnp.int32, default=1)  # ref: RenderLayers bitmask


def sprite_from_handle(handle, color=(1.0, 1.0, 1.0, 1.0), size=None,
                       anchor=Anchor.CENTER, flip_x=False, flip_y=False):
    """Sprite bound to an AtlasBuilder handle (ref: Sprite::from_image;
    flip_x/flip_y swap the uv rect like the reference's flip booleans)."""
    u0, v0 = handle["uv_min"]
    u1, v1 = handle["uv_max"]
    if flip_x:
        u0, u1 = u1, u0
    if flip_y:
        v0, v1 = v1, v0
    return Sprite(
        color=color, size=tuple(size) if size is not None else handle["size"],
        anchor=anchor, uv_min=(u0, v0), uv_max=(u1, v1), tex=handle["tex"])


def spawn_sliced(world, handle, size, border, pos=(0.0, 0.0), z=10.0,
                 color=(1.0, 1.0, 1.0, 1.0)):
    """9-slice sprite (ref: SpriteImageMode::Sliced + ComputedTextureSlices
    — corner patches keep their pixel size, edges stretch one axis,
    the center stretches both). `border` = (left, top, right, bottom) px
    in image space. Spawns 9 sprite entities; returns their rows."""
    from bevy_tpu.transform import GlobalTransform, Transform

    u0, v0 = handle["uv_min"]
    u1, v1 = handle["uv_max"]
    iw, ih = handle["size"]
    bl, bt, br, bb = (border, border, border, border) \
        if isinstance(border, (int, float)) else border
    w, h = size
    cw = max(w - bl - br, 0.0)          # stretched center width
    chh = max(h - bt - bb, 0.0)
    # x slice edges (screen, from left) and u edges (texture)
    xs = [0.0, bl, bl + cw, w]
    us = [u0, u0 + (u1 - u0) * bl / iw, u1 - (u1 - u0) * br / iw, u1]
    ys = [0.0, bt, bt + chh, h]
    vs = [v0, v0 + (v1 - v0) * bt / ih, v1 - (v1 - v0) * bb / ih, v1]
    rows = []
    px, py = pos
    for j in range(3):
        for i in range(3):
            sw = xs[i + 1] - xs[i]
            sh = ys[j + 1] - ys[j]
            if sw <= 0 or sh <= 0:
                continue
            cx = px - w / 2 + xs[i] + sw / 2
            cy = py + h / 2 - ys[j] - sh / 2
            e = world.spawn(
                Sprite(color=color, size=(sw, sh),
                       uv_min=(us[i], vs[j]), uv_max=(us[i + 1], vs[j + 1]),
                       tex=handle["tex"]),
                Transform(translation=(cx, cy, z)),
                GlobalTransform(translation=(cx, cy, z)))
            rows.append(e.index if hasattr(e, "index") else e)
    return rows


def spawn_tiled(world, handle, size, pos=(0.0, 0.0), z=10.0, scale=1.0,
                color=(1.0, 1.0, 1.0, 1.0)):
    """Tiled sprite (ref: SpriteImageMode::Tiled): repeats the image at
    its natural size (x scale) to fill `size`; edge tiles crop via a
    trimmed uv rect. Returns spawned rows."""
    from bevy_tpu.transform import GlobalTransform, Transform

    u0, v0 = handle["uv_min"]
    u1, v1 = handle["uv_max"]
    tw = handle["size"][0] * scale
    th = handle["size"][1] * scale
    w, h = size
    px, py = pos
    rows = []
    y = 0.0
    while y < h - 1e-6:
        sh = min(th, h - y)
        x = 0.0
        while x < w - 1e-6:
            sw = min(tw, w - x)
            e = world.spawn(
                Sprite(color=color, size=(sw, sh),
                       uv_min=(u0, v0),
                       uv_max=(u0 + (u1 - u0) * sw / tw,
                               v0 + (v1 - v0) * sh / th),
                       tex=handle["tex"]),
                Transform(translation=(px - w / 2 + x + sw / 2,
                                       py + h / 2 - y - sh / 2, z)),
                GlobalTransform(translation=(px - w / 2 + x + sw / 2,
                                             py + h / 2 - y - sh / 2, z)))
            rows.append(e.index if hasattr(e, "index") else e)
            x += tw
        y += th
    return rows


def make_sprite_pass(width, height, tile_h=32, tile_w=128,
                     pairs_per_sprite=4, max_per_tile=256, bilinear=True,
                     backend="auto", max_visible=None, max_cameras=1,
                     sprite_batch=8, sample_dtype="f32", mode="tiles",
                     win_h=40, rotated=True, alpha_only=False):
    """The 2D transparent pass (ref: queue_sprites → Transparent2d sorted
    phase → instanced draw, render/mod.rs:499). Static raster config is
    closed over — it shapes the XLA program.

    backend: 'pallas' (TPU kernel; rotated *textured* sprites unsupported),
    'xla' (reference path, fully general), or 'auto' (pallas on TPU).
    max_cameras: static count of Camera2d views per frame (ref: one pass
    per camera in ascending Camera::order; Camera2d.vp_min/vp_max scope
    each view to a viewport rect — 2D split-screen). 1 keeps the
    single-camera program."""

    from bevy_tpu.render.camera import select_cameras
    from bevy_tpu.transform import GlobalTransform

    if backend == "auto":
        backend = "pallas" if jax.default_backend() not in ("cpu", "gpu") \
            else "xla"

    @system(name="sprite_pass")
    def sprite_pass(q=Query(Read(Sprite), Read(GlobalTransform)),
                    cam=Query(Read(Camera2d), Read(GlobalTransform)),
                    target=ResMut(RenderTarget.RESOURCE),
                    atlas=Res(TextureAtlas.RESOURCE),
                    stats=ResMut("render_stats")):
        t = q.global_transform.translation
        angle = quat_z_angle(q.global_transform.rotation)
        scale_xy = q.global_transform.scale[:, :2]
        size_w = q.sprite.size * scale_xy
        # anchor offset, rotated into world space (y-up)
        off = -q.sprite.anchor * size_w
        ca, sa = jnp.cos(angle), jnp.sin(angle)
        off_w = jnp.stack([ca * off[:, 0] - sa * off[:, 1],
                           sa * off[:, 0] + ca * off[:, 1]], axis=-1)
        center_w = t[:, :2] + off_w

        if max_cameras > 1:
            cam_ids, cam_valid = select_cameras(
                cam.camera2d.order, cam.mask, max_cameras)
        else:
            idx, has_cam = pick_camera(cam.mask)
            cam_ids = idx[None].astype(jnp.int32)
            cam_valid = has_cam[None]

        def one_camera(fb, cam_idx, alive):
            cam_xy = cam.global_transform.translation[cam_idx, :2]
            cam_angle = quat_z_angle(cam.global_transform.rotation[cam_idx])
            cam_cos, cam_sin = jnp.cos(cam_angle), jnp.sin(cam_angle)
            cam_scale = cam.camera2d.scale[cam_idx]
            # viewport rect in pixels; the projection recenters on it
            vx0 = cam.camera2d.vp_min[cam_idx, 0] * width
            vy0 = cam.camera2d.vp_min[cam_idx, 1] * height
            vx1 = cam.camera2d.vp_max[cam_idx, 0] * width
            vy1 = cam.camera2d.vp_max[cam_idx, 1] * height
            d = center_w - cam_xy
            vx = cam_cos * d[:, 0] + cam_sin * d[:, 1]
            vy = -cam_sin * d[:, 0] + cam_cos * d[:, 1]
            center_px = jnp.stack([(vx0 + vx1) * 0.5 + vx / cam_scale,
                                   (vy0 + vy1) * 0.5 - vy / cam_scale], -1)
            half_px = size_w * 0.5 / cam_scale
            # world CCW rotation appears CW on a y-down screen
            rot_screen = -(angle - cam_angle)
            packed = pack_sprite_instances(
                center=center_px, half=half_px, rot=rot_screen,
                color=q.sprite.color, uv_min=q.sprite.uv_min,
                uv_max=q.sprite.uv_max, tex=q.sprite.tex, z=t[:, 2],
                active=q.mask & alive &
                ((q.sprite.layers & cam.camera2d.layers[cam_idx]) != 0))
            if backend == "pallas" and mode == "splat":
                from bevy_tpu.ops.raster2d_splat import raster_sprites_splat
                out, st = raster_sprites_splat(
                    fb, packed, atlas.data.transpose(2, 0, 1),
                    win_h=win_h, windows_per_sprite=pairs_per_sprite,
                    max_visible=max_visible, bilinear=bilinear,
                    sample_dtype=sample_dtype, rotated=rotated,
                    alpha_only=alpha_only)
            elif backend == "pallas":
                from bevy_tpu.ops.raster2d_pallas import raster_sprites_pallas
                out, st = raster_sprites_pallas(
                    fb, packed, atlas.data.transpose(2, 0, 1),
                    tile_h=tile_h, tile_w=tile_w,
                    pairs_per_sprite=pairs_per_sprite,
                    max_per_tile=max_per_tile,
                    max_visible=max_visible, bilinear=bilinear,
                    sprite_batch=sprite_batch, sample_dtype=sample_dtype)
            else:
                fbi, st = raster_sprites(
                    fb.transpose(1, 2, 0), packed, atlas.data,
                    tile_h=tile_h, tile_w=tile_w,
                    pairs_per_sprite=pairs_per_sprite,
                    max_per_tile=max_per_tile, bilinear=bilinear)
                out = fbi.transpose(2, 0, 1)
            if max_cameras > 1:
                # in-kernel scissor equivalent: composite only the
                # viewport rect (ref: RenderPass::set_viewport)
                px = jnp.arange(width, dtype=jnp.float32)[None, :]
                py = jnp.arange(height, dtype=jnp.float32)[:, None]
                in_rect = ((px >= vx0) & (px < vx1) &
                           (py >= vy0) & (py < vy1) & alive)
                out = jnp.where(in_rect[None], out, fb)
            return out, st

        fb = target.color
        for k in range(cam_ids.shape[0]):
            fb, st = one_camera(fb, cam_ids[k], cam_valid[k])
            stats.pair_overflow = stats.pair_overflow + st["pair_overflow"]
            stats.tile_overflow = stats.tile_overflow + st["tile_overflow"]
        target.color = fb

    return sprite_pass


@component
class AtlasAnimation:
    """Cycles a sprite through atlas frames in-jit (ref: the sprite-sheet
    animation pattern of bevy's sprite_sheet example — TextureAtlas index
    advanced by a timer)."""
    frame = field((), jnp.float32)
    fps = field((), jnp.float32, default=10.0)
    first = field((), jnp.int32)
    count = field((), jnp.int32, default=1)


def make_atlas_animation_system(frames):
    """`frames`: list of atlas handles (e.g. AtlasBuilder.grid(...) rects) —
    becomes a constant uv table indexed on device."""
    uv0 = jnp.asarray([f["uv_min"] for f in frames], jnp.float32)
    uv1 = jnp.asarray([f["uv_max"] for f in frames], jnp.float32)
    tex = int(frames[0]["tex"])
    n_table = len(frames)

    @system(name="animate_atlas_sprites")
    def animate_atlas_sprites(q=Query(Sprite, AtlasAnimation), time=Res("time")):
        a = q.atlas_animation
        frame = a.frame + time.delta * a.fps
        cnt = jnp.maximum(a.count.astype(jnp.float32), 1.0)
        frame = jnp.where(q.mask, frame % cnt, a.frame)
        a.frame = frame
        idx = jnp.clip(a.first + frame.astype(jnp.int32), 0, n_table - 1)
        q.sprite.uv_min = jnp.where(q.mask[:, None], uv0[idx], q.sprite.uv_min)
        q.sprite.uv_max = jnp.where(q.mask[:, None], uv1[idx], q.sprite.uv_max)
        q.sprite.tex = jnp.where(q.mask, tex, q.sprite.tex)

    return animate_atlas_sprites


class SpritePlugin(Plugin):
    """ref: SpritePlugin + SpriteRenderPlugin. Raster shape knobs surface
    here (the reference's equivalents are pipeline specialization keys)."""

    def __init__(self, tile_h=32, tile_w=128, pairs_per_sprite=4,
                 max_per_tile=256, bilinear=True, backend="auto",
                 max_visible=None, max_cameras=1, sprite_batch=8,
                 sample_dtype="f32", mode="tiles", win_h=40,
                 rotated=True, alpha_only=False):
        # sample_dtype="bf16" runs the kernel's texture-sampling matmuls
        # in bfloat16 (GPU texture-filter precision class) — opt-in for
        # stress scenes; f32 keeps bit-parity with the XLA reference path.
        # rotated=False / alpha_only=True are splat-mode static
        # specializations (no sprite rotates / atlas RGB planes are all
        # ones) — the pipeline-specialization-key analogue; see
        # ops/raster2d_splat.py
        self.cfg = dict(tile_h=tile_h, tile_w=tile_w,
                        pairs_per_sprite=pairs_per_sprite,
                        max_per_tile=max_per_tile, bilinear=bilinear,
                        backend=backend, max_visible=max_visible,
                        max_cameras=max_cameras, sprite_batch=sprite_batch,
                        sample_dtype=sample_dtype, mode=mode, win_h=win_h,
                        rotated=rotated, alpha_only=alpha_only)

    def build(self, app):
        from bevy_tpu.render.plugin import RenderPlugin
        rp = next((p for p in app._plugins if isinstance(p, RenderPlugin)), None)
        if rp is None:
            raise RuntimeError("SpritePlugin requires RenderPlugin")
        from bevy_tpu.transform import GlobalTransform, Transform
        app.world.register_component(Sprite)
        app.world.register_component(Camera2d)
        app.world.register_component(Transform)
        app.world.register_component(GlobalTransform)
        if "render_stats" not in app.world.state["res"]:
            app.insert_resource("render_stats", {
                "pair_overflow": jnp.asarray(0, jnp.int32),
                "tile_overflow": jnp.asarray(0, jnp.int32),
            })
        app.add_systems(Render, make_sprite_pass(rp.width, rp.height, **self.cfg),
                        in_set=OVERLAY_SET)
