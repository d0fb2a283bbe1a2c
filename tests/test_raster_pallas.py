"""Pallas sprite kernel parity vs the XLA reference (interpret mode on CPU;
the same kernel compiles for TPU — tests/conftest pins the cpu platform)."""

import jax.numpy as jnp
import numpy as np

from bevy_tpu.ops.raster2d import pack_sprite_instances, raster_sprites
from bevy_tpu.ops.raster2d_pallas import raster_sprites_pallas


def _rand_insts(rng, n, w, h, rot=False):
    return dict(
        center=jnp.asarray(rng.uniform(-20, w + 20, (n, 2)), jnp.float32),
        half=jnp.asarray(rng.uniform(3, 20, (n, 2)), jnp.float32),
        rot=jnp.asarray(rng.uniform(-3, 3, n) if rot else np.zeros(n), jnp.float32),
        color=jnp.asarray(rng.uniform(0.2, 1, (n, 4)), jnp.float32),
        uv_min=jnp.zeros((n, 2)), uv_max=jnp.ones((n, 2)),
        tex=jnp.asarray(rng.randint(-1, 1, n), jnp.int32),
        z=jnp.asarray(rng.uniform(0, 1, n), jnp.float32),
        active=jnp.asarray(rng.rand(n) < 0.8))


def _run_both(insts, w=128, h=64, atlas_hw=8, max_visible=None):
    rng = np.random.RandomState(7)
    packed = pack_sprite_instances(**insts)
    fb = jnp.zeros((h, w, 4), jnp.float32)
    atlas = jnp.asarray(rng.uniform(0, 1, (atlas_hw, atlas_hw, 4)), jnp.float32)
    ref, _ = raster_sprites(fb, packed, atlas, bilinear=True)
    out, stats = raster_sprites_pallas(
        fb.transpose(2, 0, 1), packed, atlas.transpose(2, 0, 1),
        bilinear=True, interpret=True, max_visible=max_visible)
    return np.asarray(ref), np.asarray(out).transpose(1, 2, 0), stats


def test_pallas_matches_reference_axis_aligned():
    rng = np.random.RandomState(0)
    ref, out, _ = _run_both(_rand_insts(rng, 40, 128, 64))
    assert np.abs(ref - out).max() < 1e-5


def test_pallas_matches_reference_rotated_solid():
    rng = np.random.RandomState(1)
    insts = _rand_insts(rng, 24, 128, 64, rot=True)
    insts["tex"] = jnp.full(24, -1, jnp.int32)  # solid: rotation exact
    ref, out, _ = _run_both(insts)
    assert np.abs(ref - out).max() < 1e-5


def test_pallas_visible_budget_overflow_counted():
    rng = np.random.RandomState(2)
    insts = _rand_insts(rng, 32, 128, 64)
    insts["active"] = jnp.ones(32, bool)
    insts["center"] = jnp.asarray(rng.uniform(20, 40, (32, 2)), jnp.float32)
    _, _, stats = _run_both(insts, max_visible=8)
    assert int(stats["visible_overflow"]) > 0
