"""Viewport → world (reference twins: examples/2d/2d_viewport_to_world.rs
+ 3d_viewport_to_world.rs — convert a cursor position to a 2D world
point and to a 3D ray that is then cast against scene triangles)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax.numpy as jnp
import numpy as np

from bevy_tpu.picking import raycast, screen_ray

WIDTH, HEIGHT = 640, 360


def cursor_to_world_2d(cursor, cam_xy, cam_scale=1.0):
    """2D: invert the pixel projection (1 world unit = 1 px, y-up;
    ref: Camera::viewport_to_world_2d)."""
    px, py = cursor
    wx = (px - WIDTH * 0.5) * cam_scale + cam_xy[0]
    wy = (HEIGHT * 0.5 - py) * cam_scale + cam_xy[1]
    return wx, wy


def main():
    # 2D: center pixel maps to the camera position
    print("cursor (320,180) →", cursor_to_world_2d((320, 180), (5.0, -2.0)))
    print("cursor (0,0)     →", cursor_to_world_2d((0, 0), (0.0, 0.0)))

    # 3D: a below-center pixel's ray angles down onto the ground quad
    cam_pos = jnp.asarray([0.0, 2.0, 5.0])
    cam_rot = jnp.asarray([0.0, 0.0, 0.0, 1.0])      # looking down -z
    origin, d = screen_ray(cam_pos, cam_rot, fov=np.pi / 4,
                           width=WIDTH, height=HEIGHT, px=320.0, py=300.0)
    # ground: two triangles spanning x,z in [-10,10] at y=0
    v = jnp.asarray([
        [[-10, 0, -10], [10, 0, -10], [10, 0, 10]],
        [[-10, 0, -10], [10, 0, 10], [-10, 0, 10]],
    ], jnp.float32)
    t, hit = raycast(origin, d, v[:, 0], v[:, 1], v[:, 2])
    ti = jnp.where(hit, t, jnp.inf).min()
    p = origin + d * ti
    print("cursor (320,300) ray hits ground at", np.asarray(p).round(2))


build_app = None  # host-only example


if __name__ == "__main__":
    main()
