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
