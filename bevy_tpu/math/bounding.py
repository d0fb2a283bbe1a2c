"""Batched bounding volumes + intersection tests (reference twin:
bevy_math/src/bounding/, bevy_camera/src/primitives.rs Frustum/Aabb).

AABBs are (center, half_extents) pairs of (..., D) arrays — matching the
reference's `Aabb` render primitive layout, which is what the culling kernel
consumes. Frustums are (..., 6, 4) half-space plane arrays (normal, d) with
normals pointing inward (ref: Frustum::intersects_obb semantics).
"""

import jax.numpy as jnp


def aabb_from_center_half(center, half):
    return {"center": jnp.asarray(center, jnp.float32),
            "half": jnp.asarray(half, jnp.float32)}


def aabb_from_min_max(mn, mx):
    mn = jnp.asarray(mn, jnp.float32)
    mx = jnp.asarray(mx, jnp.float32)
    return {"center": (mn + mx) * 0.5, "half": (mx - mn) * 0.5}


def aabb_intersects(a, b):
    """Batched AABB overlap test; broadcasts. Returns bool (...)."""
    d = jnp.abs(a["center"] - b["center"])
    return jnp.all(d <= (a["half"] + b["half"]), axis=-1)


def aabb_contains_point(a, p):
    return jnp.all(jnp.abs(p - a["center"]) <= a["half"], axis=-1)


def aabb_closest_point(a, p):
    mn = a["center"] - a["half"]
    mx = a["center"] + a["half"]
    return jnp.clip(p, mn, mx)


def sphere_intersects_frustum(planes, center, radius):
    """planes: (..., 6, 4) inward half-spaces; center (..., 3); radius (...).
    Conservative sphere-vs-frustum (ref: Frustum::intersects_sphere,
    bevy_camera/src/primitives.rs)."""
    dist = jnp.einsum("...pi,...i->...p", planes[..., :3], center) + planes[..., 3]
    return jnp.all(dist >= -radius[..., None], axis=-1)


def aabb_intersects_frustum(planes, center, half):
    """p/n-vertex test: for each plane take the AABB vertex farthest along
    the plane normal (ref: Frustum::intersects_obb with identity orientation;
    the world-space AABB path used by check_visibility,
    bevy_camera/src/visibility/mod.rs:748)."""
    n = planes[..., :3]  # (..., 6, 3)
    d = planes[..., 3]
    # signed distance of center plus projected extent
    center_d = jnp.einsum("...pi,...i->...p", n, center) + d
    extent = jnp.einsum("...pi,...i->...p", jnp.abs(n), half)
    return jnp.all(center_d + extent >= 0.0, axis=-1)


def obb_intersects_frustum(planes, center, half, rot_mat):
    """OBB (center, half, rotation (...,3,3)) vs frustum — full
    intersects_obb analogue: project the rotated extents onto each plane."""
    n = planes[..., :3]
    d = planes[..., 3]
    center_d = jnp.einsum("...pi,...i->...p", n, center) + d
    # world-space axes scaled by half extents: columns of rot_mat * half
    axes = rot_mat * half[..., None, :]  # (..., 3, 3) columns are scaled axes
    extent = jnp.sum(jnp.abs(jnp.einsum("...pi,...ij->...pj", n, axes)), axis=-1)
    return jnp.all(center_d + extent >= 0.0, axis=-1)
