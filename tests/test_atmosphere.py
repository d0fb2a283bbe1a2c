"""Atmosphere (ref model: bevy_pbr atmosphere — blue zenith, warm
horizon at low sun, sun disc along the light direction)."""

import numpy as np
import jax.numpy as jnp

from bevy_tpu.render.atmosphere import sky_radiance
from bevy_tpu.render.skybox import view_rays


def _sky(sun_dir, pitch_up=0.35):
    # camera looking toward -z, slightly up
    s = np.sin(pitch_up / 2)
    rot = jnp.asarray([s, 0.0, 0.0, np.cos(pitch_up / 2)], jnp.float32)
    rays = view_rays(rot, jnp.asarray(0.9), 160 / 96, 96, 160)
    return np.asarray(sky_radiance(rays, jnp.asarray(sun_dir, jnp.float32)))


def test_high_sun_blue_sky():
    sky = _sky([0.0, -1.0, 0.0])      # sun overhead (light points down)
    top = sky[:, 5, 80]
    assert top[2] > top[0], top       # blue dominates
    assert np.isfinite(sky).all() and sky.min() >= 0


def test_horizon_brighter_than_zenith():
    sky = _sky([0.0, -1.0, 0.0])
    zen = sky[:, 2, 80].sum()
    hor = sky[:, 90, 80].sum()
    assert hor > zen                  # longer path = brighter horizon


def test_sun_disc_in_sun_direction():
    # sun low in front of the camera (light travels toward +z-ish, down)
    sun = np.asarray([0.0, -0.35, 0.937], np.float32)
    sun /= np.linalg.norm(sun)
    sky = _sky(sun)
    total = sky.sum(0)
    ys, xs = np.unravel_index(np.argmax(total), total.shape)
    # brightest pixel is in the upper-forward region, far brighter than
    # the median (the disc)
    assert total[ys, xs] > np.median(total) * 3
