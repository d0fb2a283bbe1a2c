"""Bounding-volume intersections (reference twin:
examples/math/bounding_2d.rs — AABB/point/frustum queries from
bevy_math's bounding module, batched over many volumes at once)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax.numpy as jnp

from bevy_tpu.math.bounding import (
    aabb_closest_point, aabb_contains_point, aabb_from_center_half,
    aabb_intersects,
)


def main():
    rng = np.random.RandomState(0)
    centers = jnp.asarray(rng.uniform(-10, 10, (64, 2)), jnp.float32)
    halves = jnp.asarray(rng.uniform(0.5, 2.0, (64, 2)), jnp.float32)
    boxes = aabb_from_center_half(centers, halves)

    probe = aabb_from_center_half(jnp.zeros(2), jnp.asarray([3.0, 3.0]))
    hits = aabb_intersects(boxes, probe)
    print("boxes overlapping the probe:", int(jnp.sum(hits)))

    p = jnp.asarray([1.0, 1.0])
    inside = aabb_contains_point(boxes, p)
    print("boxes containing (1,1):", int(jnp.sum(inside)))

    closest = aabb_closest_point(boxes, p)
    d = jnp.linalg.norm(closest - p, axis=-1)
    print(f"nearest box surface distance: {float(jnp.min(d)):.3f}")


build_app = None  # host-only example


if __name__ == "__main__":
    main()
