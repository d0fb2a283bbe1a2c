"""Shape sampling (ref model: bevy_math sampling/ ShapeSample —
uniformity over interiors and boundaries)."""

import jax
import numpy as np

from bevy_tpu.math import sampling as S

KEY = jax.random.PRNGKey(7)
N = 20000


def test_circle_interior_uniform():
    p = np.asarray(S.circle_interior(KEY, N, radius=2.0))
    r = np.linalg.norm(p, axis=1)
    assert r.max() <= 2.0 + 1e-5
    # uniform area ⇒ median radius = sqrt(1/2) * R
    assert abs(np.median(r) - 2.0 * np.sqrt(0.5)) < 0.05


def test_sphere_boundary_unit():
    p = np.asarray(S.sphere_boundary(KEY, N))
    r = np.linalg.norm(p, axis=1)
    assert np.allclose(r, 1.0, atol=1e-4)
    assert np.abs(p.mean(0)).max() < 0.02          # centered


def test_sphere_interior_radial_cdf():
    p = np.asarray(S.sphere_interior(KEY, N))
    r = np.linalg.norm(p, axis=1)
    # volume-uniform ⇒ median radius = (1/2)^(1/3)
    assert abs(np.median(r) - 0.5 ** (1 / 3)) < 0.02


def test_triangle_interior_inside():
    a, b, c = (0.0, 0.0), (4.0, 0.0), (0.0, 2.0)
    p = np.asarray(S.triangle_interior(KEY, N, a, b, c))
    assert (p[:, 0] >= -1e-6).all() and (p[:, 1] >= -1e-6).all()
    assert (p[:, 0] / 4.0 + p[:, 1] / 2.0 <= 1.0 + 1e-6).all()
    # centroid of uniform samples ≈ triangle centroid
    assert np.allclose(p.mean(0), [4 / 3, 2 / 3], atol=0.05)


def test_annulus_bounds():
    p = np.asarray(S.annulus_interior(KEY, N, 1.0, 2.0))
    r = np.linalg.norm(p, axis=1)
    assert r.min() >= 1.0 - 1e-5 and r.max() <= 2.0 + 1e-5
