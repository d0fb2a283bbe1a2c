"""Deferred point-light pipeline tests (ref model: many_lights example +
clustered-forward binning semantics)."""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "examples"))

import many_lights  # noqa: E402
from bevy_tpu.render.plugin import frame_image  # noqa: E402


def _app(**kw):
    kw.setdefault("n_lights", 32)
    kw.setdefault("n_cubes", 9)
    kw.setdefault("width", 192)
    kw.setdefault("height", 96)
    kw.setdefault("capacity", 128)
    kw.setdefault("camera", (0.0, 8.0, 20.0))
    return many_lights.build_app(**kw)


def test_floor_and_light_pools_render():
    app = _app()
    app.update(dt=1 / 60)
    img = frame_image(app)
    h, w = img.shape[:2]
    # the floor fills the lower view (near-plane clipping works): pixels
    # differ from the CLEAR color (~[88, 88, 102] sRGB of the default)
    clear = np.asarray([88, 88, 102])
    lower = img[int(h * 0.7):, :, :3].astype(int)
    assert (np.abs(lower - clear).sum(-1) > 20).mean() > 0.9, \
        "floor not covering lower view"
    # some pixels are clearly lit by tinted point lights (saturated hues)
    rgb = img[..., :3].astype(int)
    sat = rgb.max(-1) - rgb.min(-1)
    assert (sat > 25).sum() > 20, f"no tinted light pools ({(sat > 25).sum()})"


def test_light_range_limits_pool():
    """Shrinking the range must shrink lit-pixel area."""
    big = _app(light_range=10.0)
    small = _app(light_range=2.0)
    big.update(dt=1 / 60)
    small.update(dt=1 / 60)
    sat_big = _saturated(frame_image(big))
    sat_small = _saturated(frame_image(small))
    assert sat_small < sat_big, (sat_small, sat_big)


def _saturated(img):
    rgb = img[..., :3].astype(int)
    sat = rgb.max(-1) - rgb.min(-1)
    return int((sat > 30).sum())


def test_no_lights_leaves_ambient_only():
    app = _app(n_lights=0)
    app.update(dt=1 / 60)
    img = frame_image(app)
    assert _saturated(img) < 10
