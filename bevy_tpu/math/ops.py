"""Deterministic float ops layer (reference twin: bevy_math/src/ops.rs).

The reference pins `ops::sin` etc. to libm for cross-platform determinism.
On TPU the analogue is: always fp32, never let XLA downcast transcendentals,
and route everything through one module so precision policy is auditable.
"""

import jax.numpy as jnp
from jax import lax

F32 = jnp.float32


def sin(x):
    return jnp.sin(x.astype(F32) if hasattr(x, "astype") else F32(x))


def cos(x):
    return jnp.cos(x.astype(F32) if hasattr(x, "astype") else F32(x))


def sin_cos(x):
    return sin(x), cos(x)


def atan2(y, x):
    return jnp.arctan2(y, x)


def rsqrt(x):
    return lax.rsqrt(x)


def safe_normalize(v, axis=-1, eps=1e-12):
    """Normalize, returning zeros for zero-length vectors (ref: glam
    `normalize_or_zero`)."""
    sq = jnp.sum(v * v, axis=axis, keepdims=True)
    inv = jnp.where(sq > eps, lax.rsqrt(jnp.maximum(sq, eps)), 0.0)
    return v * inv


def length(v, axis=-1):
    return jnp.sqrt(jnp.sum(v * v, axis=axis))


def length_squared(v, axis=-1):
    return jnp.sum(v * v, axis=axis)


def dot(a, b, axis=-1):
    return jnp.sum(a * b, axis=axis)


def cross(a, b):
    return jnp.cross(a, b)


def lerp(a, b, t):
    return a + (b - a) * t


def clamp(x, lo, hi):
    return jnp.clip(x, lo, hi)
