"""9-slice and tiled sprites (ref models: SpriteImageMode::Sliced /
Tiled + ComputedTextureSlices — corners keep size, center stretches;
tiles repeat at natural size)."""

import numpy as np

from bevy_tpu import App
from bevy_tpu.render import Camera2d, RenderPlugin, SpritePlugin
from bevy_tpu.render.plugin import frame_image
from bevy_tpu.render.sprite import spawn_sliced, spawn_tiled
from bevy_tpu.render.texture import AtlasBuilder, TextureAtlas
from bevy_tpu.time import TimePlugin
from bevy_tpu.transform import TransformPlugin, transform_bundle


def _app_with(handle_img):
    app = App(capacity=256)
    builder = AtlasBuilder(128, 128)
    h = builder.add(handle_img, srgb=False)
    app.add_plugins(TimePlugin(), TransformPlugin(),
                    RenderPlugin(width=200, height=120), SpritePlugin())
    app.insert_resource(TextureAtlas.RESOURCE, {"data": builder.build()})
    app.world.spawn(Camera2d(), *transform_bundle())
    return app, h


def test_nine_slice_keeps_corners_stretches_center():
    # 12x12 image: 4px red border ring, green 4x4 center
    img = np.zeros((12, 12, 4), np.float32)
    img[:] = (1.0, 0.0, 0.0, 1.0)
    img[4:8, 4:8] = (0.0, 1.0, 0.0, 1.0)
    app, h = _app_with(img)
    rows = spawn_sliced(app.world, h, size=(120, 60), border=4)
    assert len(rows) == 9
    app.update(dt=1 / 60)
    out = frame_image(app).astype(int)
    cy, cx = 60, 100
    center = out[cy, cx]
    assert center[1] > center[0] + 60, center     # stretched green center
    corner = out[cy - 28, cx - 58]                # inside the 4px border
    assert corner[0] > corner[1] + 60, corner     # red corner ring
    edge_top = out[cy - 28, cx]
    assert edge_top[0] > edge_top[1] + 60, edge_top


def test_tiled_repeats_at_natural_size():
    # 10x10 image: left half red, right half blue → tiling produces
    # alternating columns every 5px
    img = np.zeros((10, 10, 4), np.float32)
    img[:, :5] = (1.0, 0.0, 0.0, 1.0)
    img[:, 5:] = (0.0, 0.0, 1.0, 1.0)
    app, h = _app_with(img)
    rows = spawn_tiled(app.world, h, size=(40, 20))
    assert len(rows) == 4 * 2
    app.update(dt=1 / 60)
    out = frame_image(app).astype(int)
    cy = 60
    x0 = 100 - 20                                  # sprite left edge
    reds = [out[cy, x0 + 2][0] > out[cy, x0 + 2][2],
            out[cy, x0 + 12][0] > out[cy, x0 + 12][2]]
    blues = [out[cy, x0 + 7][2] > out[cy, x0 + 7][0],
             out[cy, x0 + 17][2] > out[cy, x0 + 17][0]]
    assert all(reds) and all(blues), (reds, blues)
