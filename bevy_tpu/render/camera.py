"""Cameras (reference twin: bevy_camera — Camera component, Projection
`src/projection.rs`; 2D default: orthographic, 1 world unit = 1 pixel,
origin centered, +y up).

Screen convention: pixel (0,0) is top-left, y down (matching the output
image layout); the world→screen transform flips y exactly once.
"""

from __future__ import annotations

import jax.numpy as jnp

from bevy_tpu.ecs.component import component, field


@component
class Camera2d:
    """2D orthographic camera (ref: Camera2d + OrthographicProjection with
    ScalingMode::WindowSize). `scale` = world units per pixel; `order`
    breaks ties when several cameras exist (ref: Camera::order)."""
    scale = field((), jnp.float32, default=1.0)
    order = field((), jnp.int32, default=0)
    layers = field((), jnp.int32, default=1)  # ref: RenderLayers bitmask
    # viewport rect as target-size fractions (ref: Camera::viewport,
    # bevy_render/src/camera/camera.rs — 2D split-screen / PiP); the
    # sprite pass uses these when built with max_cameras > 1
    vp_min = field((2,), jnp.float32, default=(0.0, 0.0))
    vp_max = field((2,), jnp.float32, default=(1.0, 1.0))


class OrthographicProjection:
    """Host-side helper mirroring the reference's projection struct."""

    def __init__(self, scale: float = 1.0):
        self.scale = scale


def pick_camera(mask):
    """Index of the active camera (first alive row with the component);
    returns (idx, any). Single-camera worlds short-circuit naturally."""
    any_cam = jnp.any(mask)
    idx = jnp.argmax(mask)
    return idx, any_cam


def select_cameras(order, mask, k: int):
    """First k alive cameras in ascending `order` (ties broken by row
    index — ref: ascending Camera::order drives render-pass sequence).
    Returns (ids (k,) int32, valid (k,) bool)."""
    n = order.shape[0]
    rows = jnp.arange(n, dtype=jnp.int32)
    key = jnp.where(mask, order * n + rows, jnp.int32(2**31 - 1))
    ids = jnp.argsort(key)[:k].astype(jnp.int32)
    valid = mask[ids]
    return ids, valid


def world_to_screen_2d(xy, cam_xy, cam_cos, cam_sin, cam_scale, width, height):
    """Batch world-space points (N, 2) → pixel coords (N, 2), y down.

    Applies the inverse camera rotation, divides by projection scale and
    recenters on the viewport (ref: view uniform construction,
    bevy_render/src/view/mod.rs — done here in closed 2D form)."""
    d = xy - cam_xy
    vx = cam_cos * d[..., 0] + cam_sin * d[..., 1]
    vy = -cam_sin * d[..., 0] + cam_cos * d[..., 1]
    sx = width * 0.5 + vx / cam_scale
    sy = height * 0.5 - vy / cam_scale
    return jnp.stack([sx, sy], axis=-1)


def quat_z_angle(q):
    """Rotation angle about +z of quaternions (..., 4) xyzw — the 2D camera
    and sprite rotation extraction (assumes rotation is about z, as all the
    reference's 2D paths do)."""
    return 2.0 * jnp.arctan2(q[..., 2], q[..., 3])


# ----------------------------------------------------------------------
# 3D


@component
class Camera3d:
    """3D perspective camera (ref: Camera3d + PerspectiveProjection,
    bevy_camera/src/projection.rs — fov default π/4, near 0.1, reverse-z
    infinite far). vp_min/vp_max: viewport rect as target-size fractions
    (ref: Camera::viewport, bevy_render/src/camera/camera.rs — split-screen
    and picture-in-picture); cameras render in ascending `order`."""
    fov = field((), jnp.float32, default=0.7853981634)   # π/4 vertical
    near = field((), jnp.float32, default=0.1)
    order = field((), jnp.int32, default=0)
    layers = field((), jnp.int32, default=1)  # ref: RenderLayers bitmask
    vp_min = field((2,), jnp.float32, default=(0.0, 0.0))
    vp_max = field((2,), jnp.float32, default=(1.0, 1.0))


def perspective_infinite_reverse(fov, aspect, near):
    """(4,4) projection, reverse-z in [0,1], infinite far (ref: wgpu/bevy
    convention — glam Mat4::perspective_infinite_reverse_rh)."""
    f = 1.0 / jnp.tan(fov * 0.5)
    z = jnp.zeros((), jnp.float32)
    return jnp.stack([
        jnp.stack([f / aspect, z, z, z]),
        jnp.stack([z, f, z, z]),
        jnp.stack([z, z, z, near]),
        jnp.stack([z, z, -jnp.ones((), jnp.float32), z]),
    ])


def view_matrix(cam_translation, cam_rotation, cam_scale):
    """World→view (4,4): inverse of the camera's global TRS (cameras are
    conventionally unscaled; scale is honored anyway)."""
    from bevy_tpu.math.affine import TRS, trs_inverse, trs_to_mat4
    inv = trs_inverse(TRS(translation=cam_translation, rotation=cam_rotation,
                          scale=cam_scale))
    return trs_to_mat4(inv)
