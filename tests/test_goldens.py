"""Golden-image regression tests (ref model: the reference CI's
screenshot-vs-golden comparison via Pixel Eagle,
.github/workflows/send-screenshots-to-pixeleagle.yml).

Each scene renders deterministically on the CPU backend; goldens live in
tests/goldens/. Comparison tolerates small per-channel drift (kernel
variants may differ by a few edge pixels) but fails on structural change.
Regenerate intentionally with:  REGEN_GOLDENS=1 python -m pytest tests/test_goldens.py
"""

import os
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "examples"))

GOLDEN_DIR = Path(__file__).resolve().parent / "goldens"
REGEN = os.environ.get("REGEN_GOLDENS") == "1"


def _check(name, img):
    from PIL import Image

    path = GOLDEN_DIR / f"{name}.png"
    if REGEN or not path.exists():
        GOLDEN_DIR.mkdir(exist_ok=True)
        Image.fromarray(img).save(path)
        if REGEN:
            pytest.skip(f"regenerated {path.name}")
        return
    golden = np.asarray(Image.open(path)).astype(int)
    cur = img.astype(int)
    assert golden.shape == cur.shape, (golden.shape, cur.shape)
    diff = np.abs(golden - cur).max(-1)
    frac_changed = (diff > 8).mean()
    assert frac_changed < 0.01, (
        f"{name}: {frac_changed:.2%} of pixels drifted "
        f"(max channel diff {diff.max()})")


def test_golden_breakout():
    import breakout
    from bevy_tpu.render.plugin import frame_image

    app = breakout.build_app(width=320, height=200, camera_scale=3.2,
                             ball_velocity=(120.0, 380.0))
    app.run(max_frames=25, dt=1 / 60)
    _check("breakout_f25", frame_image(app))


def test_golden_cubes_splat():
    """The pallas/splat raster path at small scale (interpret mode) —
    locks the window-splat + flat-resolve image."""
    import many_cubes
    from bevy_tpu.render.plugin import frame_image

    app = many_cubes.build_app(n_cubes=300, width=320, height=180,
                               backend="pallas_interpret", capacity=512,
                               window_budget=4096)
    app.run(max_frames=2, dt=1 / 60)
    _check("cubes_splat_f2", frame_image(app))


def test_golden_cubes():
    import many_cubes
    from bevy_tpu.render.plugin import frame_image

    app = many_cubes.build_app(n_cubes=300, width=320, height=180,
                               backend="xla", capacity=512)
    app.run(max_frames=3, dt=1 / 60)
    _check("cubes_f3", frame_image(app))


def test_golden_foxes():
    import many_foxes
    from bevy_tpu.render.plugin import frame_image

    app = many_foxes.build_app(n_foxes=9, width=256, height=144, capacity=32,
                               camera=(0.0, 3.0, 10.0), camera_pitch=-0.25)
    app.run(max_frames=8, dt=1 / 60)
    _check("foxes_f8", frame_image(app))


def test_golden_lights():
    import many_lights
    from bevy_tpu.render.plugin import frame_image

    app = many_lights.build_app(n_lights=48, n_cubes=16, width=256,
                                height=144, capacity=256,
                                camera=(0.0, 9.0, 22.0))
    app.update(dt=1 / 60)
    _check("lights_f1", frame_image(app))
