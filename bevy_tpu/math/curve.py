"""Curves (reference twin: bevy_math's curve module — `src/curve/`,
cubic splines `src/cubic_splines/`, easing `src/curve/easing.rs`).

All evaluators are batched jnp functions: control points are (..., N, D)
arrays and `t` broadcasts, so sampling a whole path for every entity in
a column is one fused op — the vectorized counterpart of the
reference's per-call `position(t)`.
"""

from __future__ import annotations

import jax.numpy as jnp

# ---------------------------------------------------------------------------
# cubic segment evaluation (all cubic splines reduce to per-segment
# coefficient matrices; ref: CubicSegment/CubicCurve)


def _cubic_eval(coefs, t):
    """coefs (..., 4, D); t (...,) in [0, 1] → (..., D)."""
    t = jnp.asarray(t, jnp.float32)[..., None]
    return (coefs[..., 0, :] + t * (coefs[..., 1, :] +
            t * (coefs[..., 2, :] + t * coefs[..., 3, :])))


def _cubic_velocity(coefs, t):
    t = jnp.asarray(t, jnp.float32)[..., None]
    return (coefs[..., 1, :] + t * (2.0 * coefs[..., 2, :] +
                                    t * 3.0 * coefs[..., 3, :]))


class CubicCurve:
    """A chain of cubic segments with uniform parameterization over
    [0, num_segments] (ref: CubicCurve::position/velocity)."""

    def __init__(self, coefs):
        self.coefs = jnp.asarray(coefs, jnp.float32)   # (S, 4, D)

    @property
    def num_segments(self):
        return self.coefs.shape[0]

    def position(self, t):
        t = jnp.asarray(t, jnp.float32)
        s = jnp.clip(jnp.floor(t).astype(jnp.int32), 0,
                     self.num_segments - 1)
        return _cubic_eval(self.coefs[s], t - s)

    def velocity(self, t):
        t = jnp.asarray(t, jnp.float32)
        s = jnp.clip(jnp.floor(t).astype(jnp.int32), 0,
                     self.num_segments - 1)
        return _cubic_velocity(self.coefs[s], t - s)

    def sample_points(self, n):
        t = jnp.linspace(0.0, float(self.num_segments), n)
        return self.position(t)

    def arc_length(self, samples_per_segment=32):
        """Polyline approximation (ref: CubicSegment length iteration)."""
        pts = self.sample_points(self.num_segments * samples_per_segment + 1)
        return jnp.sum(jnp.linalg.norm(jnp.diff(pts, axis=0), axis=-1))


def cubic_bezier(points) -> CubicCurve:
    """points (1 + 3S, D): [p0, c0a, c0b, p1, c1a, c1b, p2, …]
    (ref: CubicBezier::to_curve)."""
    p = jnp.asarray(points, jnp.float32)
    s = (p.shape[0] - 1) // 3
    p0 = p[0:-1:3][:s]
    p1 = p[1::3][:s]
    p2 = p[2::3][:s]
    p3 = p[3::3][:s]
    c0 = p0
    c1 = 3.0 * (p1 - p0)
    c2 = 3.0 * (p2 - 2.0 * p1 + p0)
    c3 = p3 - 3.0 * p2 + 3.0 * p1 - p0
    return CubicCurve(jnp.stack([c0, c1, c2, c3], axis=1))


def cubic_hermite(points, tangents) -> CubicCurve:
    """N points + N tangents → N-1 segments (ref: CubicHermite)."""
    p = jnp.asarray(points, jnp.float32)
    m = jnp.asarray(tangents, jnp.float32)
    p0, p1 = p[:-1], p[1:]
    m0, m1 = m[:-1], m[1:]
    c0 = p0
    c1 = m0
    c2 = 3.0 * (p1 - p0) - 2.0 * m0 - m1
    c3 = 2.0 * (p0 - p1) + m0 + m1
    return CubicCurve(jnp.stack([c0, c1, c2, c3], axis=1))


def cubic_cardinal(points, tension=0.5) -> CubicCurve:
    """Catmull-Rom family: tangents from neighboring points, endpoints
    mirrored (ref: CubicCardinalSpline, tension 0.5 = Catmull-Rom)."""
    p = jnp.asarray(points, jnp.float32)
    ext = jnp.concatenate([p[:1] * 2.0 - p[1:2], p,
                           p[-1:] * 2.0 - p[-2:-1]], axis=0)
    m = tension * (ext[2:] - ext[:-2])
    return cubic_hermite(p, m)


def cubic_bspline(points) -> CubicCurve:
    """Uniform cubic B-spline over control points (ref: CubicBSpline)."""
    p = jnp.asarray(points, jnp.float32)
    s = p.shape[0] - 3
    p0, p1, p2, p3 = p[:s], p[1:s + 1], p[2:s + 2], p[3:s + 3]
    c0 = (p0 + 4.0 * p1 + p2) / 6.0
    c1 = (p2 - p0) / 2.0
    c2 = (p0 - 2.0 * p1 + p2) / 2.0
    c3 = (p3 - p0 + 3.0 * (p1 - p2)) / 6.0
    return CubicCurve(jnp.stack([c0, c1, c2, c3], axis=1))


# ---------------------------------------------------------------------------
# easing (ref: bevy_math EaseFunction)


def linear(t):
    return t


def quadratic_in(t):
    return t * t


def quadratic_out(t):
    return t * (2.0 - t)


def quadratic_in_out(t):
    return jnp.where(t < 0.5, 2.0 * t * t, -1.0 + (4.0 - 2.0 * t) * t)


def cubic_in(t):
    return t ** 3


def cubic_out(t):
    u = t - 1.0
    return u ** 3 + 1.0


def cubic_in_out(t):
    return jnp.where(t < 0.5, 4.0 * t ** 3,
                     (t - 1.0) * (2.0 * t - 2.0) ** 2 + 1.0)


def sine_in(t):
    return 1.0 - jnp.cos(t * jnp.pi / 2.0)


def sine_out(t):
    return jnp.sin(t * jnp.pi / 2.0)


def sine_in_out(t):
    return 0.5 * (1.0 - jnp.cos(jnp.pi * t))


def exponential_in(t):
    return jnp.where(t <= 0.0, 0.0, jnp.power(2.0, 10.0 * (t - 1.0)))


def exponential_out(t):
    return jnp.where(t >= 1.0, 1.0, 1.0 - jnp.power(2.0, -10.0 * t))


def back_in(t, c=1.70158):
    return t * t * ((c + 1.0) * t - c)


def back_out(t, c=1.70158):
    u = t - 1.0
    return u * u * ((c + 1.0) * u + c) + 1.0


def elastic_out(t):
    return jnp.where(
        t >= 1.0, 1.0,
        jnp.power(2.0, -10.0 * t) * jnp.sin((t - 0.075) *
                                            (2.0 * jnp.pi) / 0.3) + 1.0)


def bounce_out(t):
    n1, d1 = 7.5625, 2.75
    t = jnp.asarray(t, jnp.float32)
    return jnp.where(
        t < 1.0 / d1, n1 * t * t,
        jnp.where(t < 2.0 / d1, n1 * (t - 1.5 / d1) ** 2 + 0.75,
                  jnp.where(t < 2.5 / d1, n1 * (t - 2.25 / d1) ** 2 + 0.9375,
                            n1 * (t - 2.625 / d1) ** 2 + 0.984375)))


def smoothstep(t):
    return t * t * (3.0 - 2.0 * t)


EASE_FUNCTIONS = {
    "linear": linear,
    "quadratic_in": quadratic_in, "quadratic_out": quadratic_out,
    "quadratic_in_out": quadratic_in_out,
    "cubic_in": cubic_in, "cubic_out": cubic_out,
    "cubic_in_out": cubic_in_out,
    "sine_in": sine_in, "sine_out": sine_out, "sine_in_out": sine_in_out,
    "exponential_in": exponential_in, "exponential_out": exponential_out,
    "back_in": back_in, "back_out": back_out,
    "elastic_out": elastic_out, "bounce_out": bounce_out,
    "smoothstep": smoothstep,
}
