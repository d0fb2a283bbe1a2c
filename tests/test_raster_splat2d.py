"""Window-splat sprite kernel parity vs the XLA reference (interpret on
CPU; ref: ops/raster2d_splat.py — the sort-free bevymark-class path)."""

import jax.numpy as jnp
import numpy as np

from bevy_tpu.ops.raster2d import pack_sprite_instances, raster_sprites
from bevy_tpu.ops.raster2d_splat import raster_sprites_splat


def _rand_insts(rng, n, w, h, rot=False, big=False):
    hi = 60 if big else 20
    return dict(
        center=jnp.asarray(rng.uniform(-20, w + 20, (n, 2)), jnp.float32),
        half=jnp.asarray(rng.uniform(3, hi, (n, 2)), jnp.float32),
        rot=jnp.asarray(rng.uniform(-3, 3, n) if rot else np.zeros(n), jnp.float32),
        color=jnp.asarray(rng.uniform(0.2, 1, (n, 4)), jnp.float32),
        uv_min=jnp.zeros((n, 2)), uv_max=jnp.ones((n, 2)),
        tex=jnp.asarray(rng.randint(-1, 1, n), jnp.int32),
        z=jnp.asarray(rng.uniform(0, 1, n), jnp.float32),
        active=jnp.asarray(rng.rand(n) < 0.8))


def _run_both(insts, w=256, h=96, atlas_hw=8, max_visible=None, passes=2,
              rotated=True, alpha_only=False):
    rng = np.random.RandomState(7)
    packed = pack_sprite_instances(**insts)
    fb = jnp.zeros((h, w, 4), jnp.float32).at[:, :, 1].set(0.25)
    atlas = jnp.asarray(rng.uniform(0, 1, (atlas_hw, atlas_hw, 4)), jnp.float32)
    if alpha_only:
        atlas = atlas.at[:, :, :3].set(1.0)
    ref, _ = raster_sprites(fb, packed, atlas, bilinear=True)
    out, stats = raster_sprites_splat(
        fb.transpose(2, 0, 1), packed, atlas.transpose(2, 0, 1),
        bilinear=True, interpret=True, max_visible=max_visible,
        passes=passes, rotated=rotated, alpha_only=alpha_only)
    return np.asarray(ref), np.asarray(out).transpose(1, 2, 0), stats


def test_splat_matches_reference_axis_aligned():
    rng = np.random.RandomState(0)
    ref, out, _ = _run_both(_rand_insts(rng, 40, 256, 96))
    assert np.abs(ref - out).max() < 1e-5


def test_splat_matches_reference_rotated_solid():
    rng = np.random.RandomState(1)
    insts = _rand_insts(rng, 24, 256, 96, rot=True)
    insts["tex"] = jnp.full(24, -1, jnp.int32)
    ref, out, _ = _run_both(insts)
    assert np.abs(ref - out).max() < 1e-5


def test_splat_axis_aligned_specialization_matches():
    # rotated=False static path (separable row/col coverage) must be
    # identical to the reference for unrotated sprites
    rng = np.random.RandomState(11)
    ref, out, _ = _run_both(_rand_insts(rng, 40, 256, 96), rotated=False)
    assert np.abs(ref - out).max() < 1e-5


def test_splat_alpha_only_specialization_matches():
    # alpha_only=True static path (atlas RGB == 1) vs reference with an
    # all-ones-RGB atlas; mixed textured + solid sprites
    rng = np.random.RandomState(12)
    insts = _rand_insts(rng, 40, 256, 96)
    ref, out, _ = _run_both(insts, rotated=False, alpha_only=True)
    assert np.abs(ref - out).max() < 1e-5


def test_splat_tall_sprites_multiband_and_slab_straddle():
    # sprites taller than win_h exercise the aligned-band path; slab
    # passes=3 exercises boundary clamping of tight windows
    rng = np.random.RandomState(2)
    insts = _rand_insts(rng, 16, 256, 96, big=True)
    ref, out, _ = _run_both(insts, passes=3)
    assert np.abs(ref - out).max() < 1e-5


def test_splat_equal_z_tie_order_matches():
    rng = np.random.RandomState(3)
    insts = _rand_insts(rng, 12, 256, 96)
    insts["z"] = jnp.zeros(12)          # all ties: spawn order decides
    insts["active"] = jnp.ones(12, bool)
    insts["center"] = jnp.asarray(
        100 + rng.uniform(-10, 10, (12, 2)), jnp.float32)  # forced overlap
    ref, out, _ = _run_both(insts)
    assert np.abs(ref - out).max() < 1e-5


def test_splat_opaque_early_skip_exact():
    # a front opaque wall over many behind sprites: skip must be exact
    rng = np.random.RandomState(4)
    n = 20
    insts = _rand_insts(rng, n, 256, 96)
    insts["active"] = jnp.ones(n, bool)
    insts["color"] = jnp.asarray(rng.uniform(0.2, 1, (n, 4)), jnp.float32)
    insts["color"] = insts["color"].at[0, 3].set(1.0)
    insts["tex"] = jnp.full(n, -1, jnp.int32)
    insts["z"] = jnp.asarray(np.linspace(1, 0, n), jnp.float32)  # 0 = front
    insts["center"] = jnp.asarray(
        np.tile([[128.0, 48.0]], (n, 1)), jnp.float32)
    insts["half"] = jnp.asarray(np.full((n, 2), 30.0), jnp.float32)
    ref, out, _ = _run_both(insts)
    assert np.abs(ref - out).max() < 1e-5
