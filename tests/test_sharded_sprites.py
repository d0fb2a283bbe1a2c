"""Sharded 2D sprite frame image identity (VERDICT r3 weak #9: the
dryrun runs a sharded sprite frame and 3D identity is tested, but
nothing asserted the sharded SPRITE frame matches single-device output).

Runs the many_sprites-class app twice — unsharded, and world-sharded
over the 8-device CPU mesh — and requires bit-identical framebuffers.
Ref: bevy has no distributed axis (SURVEY §2.8); the identity bar is
this build's own correctness requirement for entity/row sharding."""

import sys
from pathlib import Path

import jax
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "examples"))


def _build(n=512, width=256, height=128):
    import numpy as np

    from bevy_tpu import App, Query, Res, Update
    from bevy_tpu.ecs.system import system
    from bevy_tpu.render import (
        AtlasBuilder, Camera2d, RenderPlugin, SpritePlugin, TextureAtlas,
    )
    from bevy_tpu.render.sprite import Sprite
    from bevy_tpu.time import Time, TimePlugin
    from bevy_tpu.transform import (
        Transform, TransformPlugin, transform_bundle,
    )

    app = App(capacity=1024)
    app.add_plugins(TimePlugin(), TransformPlugin(),
                    RenderPlugin(width=width, height=height),
                    SpritePlugin(backend="xla"))
    app.world.spawn(Camera2d(), *transform_bundle())
    atlas = AtlasBuilder(16, 16)
    img = np.zeros((16, 16, 4), np.float32)
    img[2:14, 2:14] = (1.0, 1.0, 1.0, 0.9)
    h = atlas.add(img, "chip", srgb=False)
    app.insert_resource(TextureAtlas.RESOURCE, {"data": atlas.build()})
    rng = np.random.RandomState(3)
    for i in range(n):
        app.world.spawn(
            Sprite(size=(12.0, 12.0), uv_min=h["uv_min"], uv_max=h["uv_max"],
                   tex=h["tex"],
                   color=np.append(rng.uniform(0.3, 1.0, 3), 0.8)),
            *transform_bundle(translation=(
                float(rng.uniform(-120, 120)), float(rng.uniform(-56, 56)),
                float(rng.uniform(0, 10)))))

    @system
    def drift(q=Query(Transform, Sprite), time=Res(Time)):
        t = q.transform.translation
        q.transform.translation = t.at[:, 0].add(10.0 * time.delta)

    app.add_systems(Update, drift)
    return app


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8-device mesh")
def test_sharded_sprite_frame_identical():
    from bevy_tpu.parallel import make_mesh, shard_world
    from bevy_tpu.render.plugin import frame_image

    app = _build()
    step = jax.jit(app.frame_fn())
    state = app.world.state
    for _ in range(3):
        state = step(state)
    app.world.state = state
    ref = np.asarray(frame_image(app))

    app2 = _build()
    mesh = make_mesh(8)
    shard_world(app2.world, mesh)
    step2 = jax.jit(app2.frame_fn())
    state2 = app2.world.state
    for _ in range(3):
        state2 = step2(state2)
    app2.world.state = state2
    sharded = np.asarray(frame_image(app2))

    assert sharded.shape == ref.shape
    assert np.array_equal(sharded, ref), (
        f"sharded sprite frame differs: {np.abs(sharded.astype(int) - ref.astype(int)).max()} max diff")
