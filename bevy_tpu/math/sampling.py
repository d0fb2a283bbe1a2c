"""Shape sampling (reference twin: bevy_math src/sampling/ —
ShapeSample's sample_interior / sample_boundary for the primitive set).

TPU form: every sampler is batched — pass a jax.random key and `n`,
get (n, dim) points in one vectorized draw (the reference's rand
distributions become jax.random calls; rejection sampling is replaced
by closed-form transforms so shapes stay static)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def circle_interior(key, n, radius=1.0):
    """Uniform in a disk (sqrt-radius transform)."""
    k1, k2 = jax.random.split(key)
    r = radius * jnp.sqrt(jax.random.uniform(k1, (n,)))
    t = 2 * jnp.pi * jax.random.uniform(k2, (n,))
    return jnp.stack([r * jnp.cos(t), r * jnp.sin(t)], 1)


def circle_boundary(key, n, radius=1.0):
    t = 2 * jnp.pi * jax.random.uniform(key, (n,))
    return radius * jnp.stack([jnp.cos(t), jnp.sin(t)], 1)


def sphere_interior(key, n, radius=1.0):
    """Uniform in a ball (cbrt-radius × uniform direction)."""
    k1, k2 = jax.random.split(key)
    r = radius * jax.random.uniform(k1, (n,)) ** (1.0 / 3.0)
    d = sphere_boundary(k2, n, 1.0)
    return d * r[:, None]


def sphere_boundary(key, n, radius=1.0):
    """Uniform on a sphere (normalized gaussians)."""
    v = jax.random.normal(key, (n, 3))
    return radius * v * jax.lax.rsqrt(
        jnp.maximum(jnp.sum(v * v, 1, keepdims=True), 1e-12))


def cuboid_interior(key, n, half_size=(1.0, 1.0, 1.0)):
    h = jnp.asarray(half_size, jnp.float32)
    return jax.random.uniform(key, (n, h.shape[0]), minval=-1.0,
                              maxval=1.0) * h


def rect_interior(key, n, half_size=(1.0, 1.0)):
    return cuboid_interior(key, n, half_size)


def triangle_interior(key, n, a, b, c):
    """Uniform in a triangle (fold-over barycentric transform)."""
    u = jax.random.uniform(key, (n, 2))
    over = u.sum(1) > 1.0
    u = jnp.where(over[:, None], 1.0 - u, u)
    a = jnp.asarray(a, jnp.float32)
    b = jnp.asarray(b, jnp.float32)
    c = jnp.asarray(c, jnp.float32)
    return a + u[:, :1] * (b - a) + u[:, 1:2] * (c - a)


def annulus_interior(key, n, inner, outer):
    """Uniform between two radii (area-weighted radius transform)."""
    k1, k2 = jax.random.split(key)
    u = jax.random.uniform(k1, (n,))
    r = jnp.sqrt(inner * inner + u * (outer * outer - inner * inner))
    t = 2 * jnp.pi * jax.random.uniform(k2, (n,))
    return jnp.stack([r * jnp.cos(t), r * jnp.sin(t)], 1)
