"""Math layer tests (ref twin: bevy_math in-crate unit tests)."""

import jax.numpy as jnp
import numpy as np
import pytest

from bevy_tpu.math import (
    quat_identity, quat_mul, quat_from_axis_angle, quat_from_rotation_z,
    quat_rotate_vec3, quat_slerp, quat_nlerp, quat_to_mat3, quat_from_mat3,
)
from bevy_tpu.math.affine import (
    trs, trs_compose, trs_identity, trs_inverse, trs_to_mat4,
    trs_transform_point, affine_to_trs, trs_to_affine,
)
from bevy_tpu.math.bounding import (
    aabb_from_center_half, aabb_intersects, aabb_intersects_frustum,
    sphere_intersects_frustum,
)


def test_quat_identity_rotation():
    q = quat_identity()
    v = jnp.array([1.0, 2.0, 3.0])
    np.testing.assert_allclose(quat_rotate_vec3(q, v), v, atol=1e-6)


def test_quat_rotation_z_90():
    q = quat_from_rotation_z(jnp.pi / 2)
    v = jnp.array([1.0, 0.0, 0.0])
    out = quat_rotate_vec3(q, v)
    np.testing.assert_allclose(out, [0.0, 1.0, 0.0], atol=1e-6)


def test_quat_mul_composition():
    qa = quat_from_rotation_z(0.3)
    qb = quat_from_rotation_z(0.5)
    q = quat_mul(qa, qb)
    expected = quat_from_rotation_z(0.8)
    np.testing.assert_allclose(q, expected, atol=1e-6)


def test_quat_axis_angle_batched():
    axes = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (5, 1))
    angles = jnp.linspace(0.0, 1.0, 5)
    q = quat_from_axis_angle(axes, angles)
    assert q.shape == (5, 4)
    np.testing.assert_allclose(q[0], quat_identity(), atol=1e-6)


def test_quat_mat3_roundtrip():
    rng = np.random.default_rng(0)
    v = rng.normal(size=(16, 4)).astype(np.float32)
    q = jnp.asarray(v / np.linalg.norm(v, axis=-1, keepdims=True))
    m = quat_to_mat3(q)
    q2 = quat_from_mat3(m)
    # q and -q are the same rotation
    dot = np.abs(np.sum(np.asarray(q) * np.asarray(q2), axis=-1))
    np.testing.assert_allclose(dot, 1.0, atol=1e-5)


def test_quat_slerp_endpoints():
    a = quat_from_rotation_z(0.2)
    b = quat_from_rotation_z(1.2)
    np.testing.assert_allclose(quat_slerp(a, b, 0.0), a, atol=1e-6)
    np.testing.assert_allclose(quat_slerp(a, b, 1.0), b, atol=1e-5)
    mid = quat_slerp(a, b, 0.5)
    np.testing.assert_allclose(mid, quat_from_rotation_z(0.7), atol=1e-5)


def test_trs_compose_matches_mat4():
    rng = np.random.default_rng(1)
    a = trs(translation=rng.normal(size=3), rotation=_rand_quat(rng),
            scale=np.array([2.0, 2.0, 2.0]))
    b = trs(translation=rng.normal(size=3), rotation=_rand_quat(rng),
            scale=np.array([0.5, 0.5, 0.5]))
    c = trs_compose(a, b)
    p = jnp.asarray(rng.normal(size=3).astype(np.float32))
    via_trs = trs_transform_point(c, p)
    via_seq = trs_transform_point(a, trs_transform_point(b, p))
    np.testing.assert_allclose(via_trs, via_seq, atol=1e-4)


def test_trs_inverse():
    rng = np.random.default_rng(2)
    t = trs(translation=rng.normal(size=3), rotation=_rand_quat(rng),
            scale=np.array([1.5, 1.5, 1.5]))
    inv = trs_inverse(t)
    p = jnp.asarray(rng.normal(size=3).astype(np.float32))
    np.testing.assert_allclose(
        trs_transform_point(inv, trs_transform_point(t, p)), p, atol=1e-4)


def test_affine_to_trs_roundtrip():
    rng = np.random.default_rng(3)
    t = trs(translation=rng.normal(size=3), rotation=_rand_quat(rng),
            scale=np.array([1.0, 2.0, 3.0]))
    aff = trs_to_affine(t)
    t2 = affine_to_trs(aff)
    np.testing.assert_allclose(t2["translation"], t["translation"], atol=1e-5)
    np.testing.assert_allclose(t2["scale"], t["scale"], atol=1e-5)
    dot = np.abs(np.sum(np.asarray(t2["rotation"]) * np.asarray(t["rotation"])))
    np.testing.assert_allclose(dot, 1.0, atol=1e-5)


def test_aabb_intersects():
    a = aabb_from_center_half(jnp.zeros(3), jnp.ones(3))
    b = aabb_from_center_half(jnp.array([1.5, 0.0, 0.0]), jnp.ones(3))
    c = aabb_from_center_half(jnp.array([3.0, 0.0, 0.0]), jnp.ones(3) * 0.5)
    assert bool(aabb_intersects(a, b))
    assert not bool(aabb_intersects(a, c))


def _axis_frustum():
    # Box frustum: |x|<=10, |y|<=10, 0<=z<=10 as inward planes
    planes = np.array([
        [1, 0, 0, 10], [-1, 0, 0, 10],
        [0, 1, 0, 10], [0, -1, 0, 10],
        [0, 0, 1, 0], [0, 0, -1, 10],
    ], dtype=np.float32)
    return jnp.asarray(planes)


def test_frustum_sphere():
    f = _axis_frustum()
    inside = sphere_intersects_frustum(f, jnp.array([0.0, 0.0, 5.0]), jnp.asarray(1.0))
    outside = sphere_intersects_frustum(f, jnp.array([0.0, 0.0, -5.0]), jnp.asarray(1.0))
    near = sphere_intersects_frustum(f, jnp.array([0.0, 0.0, -0.5]), jnp.asarray(1.0))
    assert bool(inside)
    assert not bool(outside)
    assert bool(near)  # conservative: sphere straddles plane


def test_frustum_aabb_batched():
    f = _axis_frustum()
    centers = jnp.array([[0.0, 0.0, 5.0], [0.0, 0.0, 25.0], [12.5, 0.0, 5.0]])
    halves = jnp.ones((3, 3))
    vis = aabb_intersects_frustum(f, centers, halves)
    np.testing.assert_array_equal(np.asarray(vis), [True, False, False])


def _rand_quat(rng):
    v = rng.normal(size=4).astype(np.float32)
    return v / np.linalg.norm(v)


def test_oklab_roundtrip_and_mix():
    import numpy as np
    from bevy_tpu.color import (
        linear_to_oklab, mix, oklab_to_linear, oklaba, oklcha, srgba,
    )

    rgb = np.asarray([[0.2, 0.5, 0.8], [1.0, 0.0, 0.0], [0.0, 0.0, 0.0],
                      [1.0, 1.0, 1.0]], np.float32)
    back = np.asarray(oklab_to_linear(linear_to_oklab(rgb)))
    assert np.abs(back - rgb).max() < 1e-4
    # white: L=1, a=b=0 (the Oklab normalization)
    lab_w = np.asarray(linear_to_oklab(np.ones(3, np.float32)))
    assert abs(lab_w[0] - 1.0) < 1e-3 and np.abs(lab_w[1:]).max() < 1e-3
    # oklch hue 0/360 agree
    assert np.allclose(np.asarray(oklcha(0.7, 0.1, 0.0)),
                       np.asarray(oklcha(0.7, 0.1, 360.0)), atol=1e-5)
    assert np.allclose(np.asarray(oklaba(1.0, 0.0, 0.0))[:3], 1.0, atol=1e-3)
    # mixing endpoints returns the endpoints
    c0, c1 = srgba(1.0, 0.0, 0.0), srgba(0.0, 0.0, 1.0)
    assert np.allclose(np.asarray(mix(c0, c1, 0.0)), np.asarray(c0), atol=1e-4)
    assert np.allclose(np.asarray(mix(c0, c1, 1.0)), np.asarray(c1), atol=1e-4)
    # midpoint stays a sane color (no channel blowup)
    mid = np.asarray(mix(c0, c1, 0.5))
    assert (mid[:3] > -0.01).all() and (mid[:3] < 1.2).all()
