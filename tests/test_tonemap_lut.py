"""3D-LUT tonemapping (ref model: the LUT-based modes of
bevy_core_pipeline/tonemapping — TonyMcMapface etc. sample a 3D LUT)."""

import numpy as np


def test_lut_identity_roundtrip():
    import jax.numpy as jnp

    from bevy_tpu.render.post import sample_lut3d

    # identity LUT in the shaped grid: stores decoded grid coords
    n, sh = 33, 4.0
    ax = np.linspace(0, 1, n, dtype=np.float32)
    r, g, b = np.meshgrid(ax, ax, ax, indexing="ij")
    lut = (np.stack([r, g, b], -1) ** 2 * sh).astype(np.float32)
    rgb = jnp.asarray(np.random.default_rng(0)
                      .uniform(0, 3.5, (3, 8, 8)).astype(np.float32))
    out = sample_lut3d(rgb, lut, shoulder=sh)
    assert np.allclose(np.asarray(out), np.asarray(rgb), atol=0.03)


def test_neutral_lut_tonemaps():
    import jax.numpy as jnp

    from bevy_tpu.render.post import Tonemapping, tonemap

    hdr = jnp.asarray(np.full((3, 4, 4), 3.0, np.float32))
    out = np.asarray(tonemap(hdr, Tonemapping.LUT, 1.0))
    assert out.max() <= 1.01            # compressed into display range
    assert out.min() > 0.5              # bright input stays bright
    lo = np.asarray(tonemap(hdr * 0.05, Tonemapping.LUT, 1.0))
    assert lo.mean() < out.mean()       # monotone


def test_lut_plugin_runs():
    from bevy_tpu import App
    from bevy_tpu.render import Camera2d, RenderPlugin, SpritePlugin
    from bevy_tpu.render.plugin import frame_image
    from bevy_tpu.render.post import Tonemapping, TonemappingPlugin
    from bevy_tpu.render.sprite import Sprite
    from bevy_tpu.time import TimePlugin
    from bevy_tpu.transform import TransformPlugin, transform_bundle

    app = App(capacity=8)
    app.add_plugins(TimePlugin(), TransformPlugin(),
                    RenderPlugin(width=64, height=48), SpritePlugin(),
                    TonemappingPlugin(mode=Tonemapping.LUT))
    app.world.spawn(Camera2d(), *transform_bundle())
    app.world.spawn(Sprite(size=(30, 30), color=(4.0, 4.0, 0.5, 1.0)),
                    *transform_bundle())
    app.update(dt=1 / 60)
    img = frame_image(app)
    c = img[24, 32]
    assert c[0] > 150 and c[2] < c[0]   # hdr yellow compressed, hue kept
