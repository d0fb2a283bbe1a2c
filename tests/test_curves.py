"""Curves + easing (ref models: bevy_math cubic_splines tests —
endpoint interpolation, continuity, Catmull-Rom through-points)."""

import numpy as np
import jax.numpy as jnp

from bevy_tpu.math.curve import (
    EASE_FUNCTIONS, cubic_bezier, cubic_bspline, cubic_cardinal,
    cubic_hermite,
)


def test_bezier_endpoints_and_midpoint():
    pts = jnp.asarray([[0.0, 0.0], [0.0, 1.0], [1.0, 1.0], [1.0, 0.0]])
    c = cubic_bezier(pts)
    np.testing.assert_allclose(c.position(0.0), [0.0, 0.0], atol=1e-6)
    np.testing.assert_allclose(c.position(1.0), [1.0, 0.0], atol=1e-5)
    mid = np.asarray(c.position(0.5))
    assert abs(mid[0] - 0.5) < 1e-5 and mid[1] > 0.5


def test_bezier_multi_segment():
    pts = jnp.asarray([[0.0, 0.0], [0.5, 0.0], [0.5, 1.0], [1.0, 1.0],
                       [1.5, 1.0], [1.5, 0.0], [2.0, 0.0]])
    c = cubic_bezier(pts)
    assert c.num_segments == 2
    np.testing.assert_allclose(c.position(2.0), [2.0, 0.0], atol=1e-5)
    # C0 continuity at the knot
    np.testing.assert_allclose(c.position(0.99999), c.position(1.0),
                               atol=1e-3)


def test_hermite_tangents():
    pts = jnp.asarray([[0.0, 0.0], [1.0, 0.0]])
    tan = jnp.asarray([[0.0, 2.0], [0.0, -2.0]])
    c = cubic_hermite(pts, tan)
    np.testing.assert_allclose(c.velocity(0.0), [0.0, 2.0], atol=1e-5)
    np.testing.assert_allclose(c.velocity(1.0), [0.0, -2.0], atol=1e-5)
    np.testing.assert_allclose(c.position(1.0), [1.0, 0.0], atol=1e-5)


def test_cardinal_passes_through_points():
    pts = jnp.asarray([[0.0, 0.0], [1.0, 2.0], [2.0, -1.0], [3.0, 0.5]])
    c = cubic_cardinal(pts)
    assert c.num_segments == 3
    for i, p in enumerate(np.asarray(pts)):
        np.testing.assert_allclose(c.position(float(i)), p, atol=1e-5)


def test_bspline_smooth_and_in_hull():
    pts = jnp.asarray([[0.0, 0.0], [1.0, 1.0], [2.0, 1.0], [3.0, 0.0]])
    c = cubic_bspline(pts)
    samples = np.asarray(c.sample_points(32))
    assert samples[:, 0].min() >= -1e-5 and samples[:, 0].max() <= 3.0
    assert samples[:, 1].max() <= 1.0 + 1e-5


def test_arc_length_straight_line():
    pts = jnp.asarray([[0.0, 0.0], [1.0, 0.0], [2.0, 0.0], [3.0, 0.0]])
    c = cubic_bezier(pts)
    assert abs(float(c.arc_length()) - 3.0) < 1e-3


def test_easing_boundaries():
    for name, fn in EASE_FUNCTIONS.items():
        v0 = float(fn(jnp.asarray(0.0)))
        v1 = float(fn(jnp.asarray(1.0)))
        assert abs(v0) < 1e-4, f"{name}(0) = {v0}"
        assert abs(v1 - 1.0) < 1e-4, f"{name}(1) = {v1}"


def test_easing_batched():
    t = jnp.linspace(0.0, 1.0, 64)
    for name, fn in EASE_FUNCTIONS.items():
        out = np.asarray(fn(t))
        assert out.shape == (64,) and np.isfinite(out).all(), name
