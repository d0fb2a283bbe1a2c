"""Batched math foundations (reference twin: bevy_math / glam, SURVEY.md §2.2).

Everything is array-first: operations take `(..., D)` batches rather than
single values, because on TPU the unit of work is a column of entities, not
one vector. fp32 throughout for deterministic game logic (ref:
crates/bevy_math/src/ops.rs).
"""

from bevy_tpu.math import ops  # noqa: F401
from bevy_tpu.math.quat import (  # noqa: F401
    quat_identity, quat_mul, quat_from_axis_angle, quat_from_rotation_z,
    quat_rotate_vec3, quat_normalize, quat_slerp, quat_nlerp, quat_conjugate,
    quat_to_mat3, quat_from_euler, quat_from_mat3,
)
from bevy_tpu.math.affine import (  # noqa: F401
    TRS, trs_identity, trs_compose, trs_to_mat4, trs_transform_point,
    trs_transform_vector, mat4_mul, mat4_transform_point, trs_inverse,
    trs_to_affine, affine_mul, affine_to_trs,
)
from bevy_tpu.math.bounding import (  # noqa: F401
    aabb_from_center_half, aabb_intersects, aabb_contains_point,
    sphere_intersects_frustum, aabb_intersects_frustum,
)
from bevy_tpu.math.rect import rect_from_center_size, rect_intersect  # noqa: F401
