"""SMAA morphological AA (ref model: bevy_anti_alias/src/smaa — Jimenez
SMAA 1x: edge detect -> span search -> area blend)."""

import jax.numpy as jnp
import numpy as np

from bevy_tpu.render.post import smaa_filter


def _stairstep(h=32, w=64):
    """A hard diagonal staircase: white above the line y = x/4."""
    img = np.zeros((3, h, w), np.float32)
    for y in range(h):
        img[:, y, : min(w, y * 4)] = 1.0
    return img


def test_smaa_softens_staircase():
    img = _stairstep()
    out = np.asarray(smaa_filter(jnp.asarray(img)))
    # staircase jumps gain intermediate coverage values
    frac = ((out > 0.05) & (out < 0.95)).mean()
    assert frac > 0.01, frac
    # long-span revectorization: a pixel mid-span on a 4-long step gets
    # a graded (not half-blurred) value
    assert not np.allclose(out, img)


def test_smaa_flat_regions_untouched():
    img = np.full((3, 16, 32), 0.5, np.float32)
    out = np.asarray(smaa_filter(jnp.asarray(img)))
    np.testing.assert_allclose(out, img)


def test_smaa_preserves_sharp_isolated_dot():
    """A single bright pixel has zero-length spans with no crossings —
    coverage 0, the dot must survive (MLAA does not blur features)."""
    img = np.zeros((3, 16, 32), np.float32)
    img[:, 8, 16] = 1.0
    out = np.asarray(smaa_filter(jnp.asarray(img)))
    assert out[0, 8, 16] > 0.55, out[0, 8, 16]
