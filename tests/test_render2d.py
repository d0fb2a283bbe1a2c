"""2D raster pipeline tests (test-strategy model: the reference's in-crate
unit tests + golden-image CI pattern, SURVEY.md §4.1/§4.7 — goldens here are
analytic pixel assertions, deterministic on any backend)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bevy_tpu.ops.binning import draw_order_ranks, expand_runs
from bevy_tpu.ops.raster2d import pack_sprite_instances, raster_sprites


def test_expand_runs_matches_numpy():
    counts = jnp.asarray([2, 0, 3, 1, 0], jnp.int32)
    owner, rank, valid, total = expand_runs(counts, 10)
    assert int(total) == 6
    np_owner = np.repeat(np.arange(5), np.asarray(counts))
    np_rank = np.concatenate([np.arange(c) for c in np.asarray(counts)])
    assert np.array_equal(np.asarray(owner)[:6], np_owner)
    assert np.array_equal(np.asarray(rank)[:6], np_rank)
    assert np.array_equal(np.asarray(valid), np.arange(10) < 6)


def test_expand_runs_overflow_counted():
    counts = jnp.asarray([4, 4], jnp.int32)
    owner, rank, valid, total = expand_runs(counts, 5)
    assert int(total) == 8
    assert int(valid.sum()) == 5


def test_draw_order_ranks():
    z = jnp.asarray([3.0, 1.0, 2.0, 9.0])
    active = jnp.asarray([True, True, True, False])
    ranks = draw_order_ranks(z, active)
    assert list(np.asarray(ranks)[:3]) == [2, 0, 1]
    assert int(ranks[3]) == 3


def _solid(center, half, color, z=0.0, rot=0.0, active=True):
    return dict(center=jnp.asarray([center], jnp.float32),
                half=jnp.asarray([half], jnp.float32),
                rot=jnp.asarray([rot], jnp.float32),
                color=jnp.asarray([color], jnp.float32),
                uv_min=jnp.zeros((1, 2)), uv_max=jnp.ones((1, 2)),
                tex=jnp.asarray([-1], jnp.int32),
                z=jnp.asarray([z], jnp.float32),
                active=jnp.asarray([active]))


def _cat(*insts):
    return {k: jnp.concatenate([i[k] for i in insts]) for k in insts[0]}


def _raster(insts, h=64, w=128, **kw):
    fb = jnp.zeros((h, w, 4), jnp.float32)
    atlas = jnp.ones((1, 1, 4), jnp.float32)
    packed = pack_sprite_instances(**insts)
    fb, stats = raster_sprites(fb, packed, atlas, **kw)
    return np.asarray(fb), stats


RED = (1.0, 0.0, 0.0, 1.0)
GREEN = (0.0, 1.0, 0.0, 1.0)


def test_solid_sprite_coverage():
    fb, _ = _raster(_solid((64.0, 32.0), (8.0, 4.0), RED))
    assert np.allclose(fb[32, 64], RED)        # inside
    assert np.allclose(fb[28, 64], RED)        # top edge inside (y=28..35)
    assert np.allclose(fb[27, 64], 0.0)        # just outside
    assert np.allclose(fb[32, 55], 0.0)        # left outside (x=56..71)
    assert np.allclose(fb[32, 56], RED)
    # exact pixel-count: 16 wide * 8 tall
    assert int((fb[..., 0] > 0.5).sum()) == 16 * 8


def test_z_order_and_alpha_blend():
    below = _solid((64.0, 32.0), (10.0, 10.0), RED, z=0.0)
    above = _solid((64.0, 32.0), (5.0, 5.0), (0.0, 1.0, 0.0, 0.5), z=1.0)
    fb, _ = _raster(_cat(below, above))
    assert np.allclose(fb[32, 64], [0.5, 0.5, 0.0, 1.0])  # 50% green over red
    assert np.allclose(fb[32, 56], RED)                    # red only region
    # order independence of instance index: reversed spawn order, same image
    fb2, _ = _raster(_cat(above, below))
    assert np.allclose(fb, fb2)


def test_rotation_90deg_swaps_extents():
    fb, _ = _raster(_solid((64.0, 32.0), (12.0, 4.0), RED, rot=np.pi / 2))
    # rotated: tall 8-wide, 24-tall
    assert np.allclose(fb[32, 64], RED)
    assert np.allclose(fb[32 + 10, 64], RED)   # inside vertically now
    assert np.allclose(fb[32, 64 + 10], 0.0)   # outside horizontally now


def test_tiling_invariance():
    insts = _cat(
        _solid((10.0, 10.0), (30.0, 20.0), RED, z=0.0),
        _solid((100.0, 40.0), (40.0, 12.0), (0.2, 0.4, 1.0, 0.7), z=1.0),
        _solid((64.0, 32.0), (64.0, 32.0), (1.0, 1.0, 1.0, 0.25), z=2.0),
    )
    fb_a, _ = _raster(insts, tile_h=8, tile_w=128)
    fb_b, _ = _raster(insts, tile_h=32, tile_w=256)
    assert np.allclose(fb_a, fb_b)


def test_texture_nearest_sampling():
    atlas = jnp.zeros((2, 2, 4), jnp.float32)
    atlas = atlas.at[0, 0].set(jnp.asarray([1.0, 0.0, 0.0, 1.0]))
    atlas = atlas.at[0, 1].set(jnp.asarray([0.0, 1.0, 0.0, 1.0]))
    atlas = atlas.at[1, 0].set(jnp.asarray([0.0, 0.0, 1.0, 1.0]))
    atlas = atlas.at[1, 1].set(jnp.asarray([1.0, 1.0, 1.0, 1.0]))
    insts = _solid((64.0, 32.0), (16.0, 16.0), (1.0, 1.0, 1.0, 1.0))
    insts["tex"] = jnp.asarray([0], jnp.int32)
    fb = jnp.zeros((64, 128, 4), jnp.float32)
    packed = pack_sprite_instances(**insts)
    fb, _ = raster_sprites(fb, packed, atlas, bilinear=False)
    fb = np.asarray(fb)
    assert np.allclose(fb[32 - 8, 64 - 8], [1.0, 0.0, 0.0, 1.0])  # top-left quad
    assert np.allclose(fb[32 - 8, 64 + 8], [0.0, 1.0, 0.0, 1.0])
    assert np.allclose(fb[32 + 8, 64 - 8], [0.0, 0.0, 1.0, 1.0])
    assert np.allclose(fb[32 + 8, 64 + 8], [1.0, 1.0, 1.0, 1.0])


def test_overflow_stats():
    insts = _cat(*[_solid((64.0, 32.0), (60.0, 30.0), RED, z=float(i))
                   for i in range(8)])
    _, stats = _raster(insts, max_per_tile=4)
    assert int(stats["tile_overflow"]) > 0


def test_sprite_pipeline_end_to_end():
    """Full App: camera + sprites -> framebuffer (the §7.5 slice)."""
    from bevy_tpu import App, Update
    from bevy_tpu.render import (
        Camera2d, ClearColor, RenderPlugin, Sprite, SpritePlugin)
    from bevy_tpu.render.plugin import frame_image
    from bevy_tpu.time import TimePlugin
    from bevy_tpu.transform import TransformPlugin, transform_bundle

    app = App(capacity=64)
    app.add_plugins(TimePlugin(), TransformPlugin(),
                    RenderPlugin(width=128, height=64), SpritePlugin())
    app.world.spawn(Camera2d(), *transform_bundle())
    app.world.spawn(Sprite(size=(20.0, 10.0), color=(1.0, 0.0, 0.0, 1.0)),
                    *transform_bundle(translation=(0.0, 0.0, 0.0)))
    app.world.spawn(Sprite(size=(10.0, 10.0), color=(0.0, 1.0, 0.0, 1.0)),
                    *transform_bundle(translation=(-40.0, 20.0, 1.0)))
    app.update(dt=1 / 60)
    img = frame_image(app)
    assert img.shape == (64, 128, 4)
    # red sprite centered (world origin = screen center 64,32)
    assert img[32, 64, 0] > 200 and img[32, 64, 1] < 60
    # green sprite at world (-40, 20) => screen (64-40, 32-20) = (24, 12)
    assert img[12, 24, 1] > 200 and img[12, 24, 0] < 60
    # background = default clear color (dark), alpha 255
    assert img[5, 120, 3] == 255 and img[5, 120, 0] < 120


def test_camera_scale_and_position():
    from bevy_tpu import App
    from bevy_tpu.render import Camera2d, RenderPlugin, Sprite, SpritePlugin
    from bevy_tpu.render.plugin import frame_image
    from bevy_tpu.time import TimePlugin
    from bevy_tpu.transform import TransformPlugin, transform_bundle

    app = App(capacity=64)
    app.add_plugins(TimePlugin(), TransformPlugin(),
                    RenderPlugin(width=128, height=64), SpritePlugin())
    # camera at (100, 0), zoomed out 2x: world->px divides by 2
    app.world.spawn(Camera2d(scale=2.0), *transform_bundle(translation=(100.0, 0.0, 0.0)))
    app.world.spawn(Sprite(size=(40.0, 40.0), color=(1.0, 0.0, 0.0, 1.0)),
                    *transform_bundle(translation=(100.0, 0.0, 0.0)))
    app.update(dt=1 / 60)
    img = frame_image(app)
    assert img[32, 64, 0] > 200          # center covered
    assert img[32, 64 + 9, 0] > 200      # 40/2/2=10px half-extent
    assert img[32, 64 + 11, 0] < 120     # outside
