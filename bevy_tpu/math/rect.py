"""Batched 2D rects (reference twin: bevy_math Rect)."""

import jax.numpy as jnp


def rect_from_center_size(center, size):
    center = jnp.asarray(center, jnp.float32)
    size = jnp.asarray(size, jnp.float32)
    half = size * 0.5
    return {"min": center - half, "max": center + half}


def rect_from_corners(mn, mx):
    return {"min": jnp.asarray(mn, jnp.float32), "max": jnp.asarray(mx, jnp.float32)}


def rect_intersect(a, b):
    mn = jnp.maximum(a["min"], b["min"])
    mx = jnp.minimum(a["max"], b["max"])
    return {"min": mn, "max": jnp.maximum(mn, mx)}


def rect_overlaps(a, b):
    return jnp.all((a["min"] <= b["max"]) & (b["min"] <= a["max"]), axis=-1)


def rect_contains(r, p):
    return jnp.all((p >= r["min"]) & (p <= r["max"]), axis=-1)
