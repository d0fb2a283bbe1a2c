"""bevymark: in-jit continuous spawning under load (ref:
examples/stress_tests/bevymark.rs semantics)."""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "examples"))

import bevymark  # noqa: E402
from bevy_tpu.render.plugin import frame_image  # noqa: E402


def test_birds_spawn_move_and_render():
    app = bevymark.build_app(width=256, height=144, capacity=2048,
                             spawn_budget=32, max_per_tile=256)
    for _ in range(20):
        app.update(dt=1 / 60)
    app.world.mark_device_dirty()
    birds = app.world.entity_count(bevymark.Bird)
    assert birds == 20 * 32, birds
    img = frame_image(app)
    bg = img[1, 1, 0]
    assert (img[..., 0] != bg).sum() > 500, "birds not rendered"
    # birds stay in bounds
    import jax
    rows = app.world.query_rows(bevymark.Bird)
    pos = np.asarray(jax.device_get(
        app.world.column(bevymark.Transform, "translation")))[rows]
    assert (np.abs(pos[:, 0]) <= 128).all()
    assert (np.abs(pos[:, 1]) <= 72).all()


def test_spawning_is_deterministic():
    imgs = []
    for _ in range(2):
        app = bevymark.build_app(width=192, height=96, capacity=1024,
                                 spawn_budget=16, max_per_tile=256)
        for _ in range(15):
            app.update(dt=1 / 60)
        imgs.append(frame_image(app))
    assert np.array_equal(imgs[0], imgs[1])
