"""Sprite scale modes (reference twin: examples/2d/sprite_scale.rs —
the same image drawn stretched, fit-preserving, and fill-cropped into
differently-shaped rects)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

from bevy_tpu import App
from bevy_tpu.render import (
    AtlasBuilder, Camera2d, RenderPlugin, SpritePlugin, TextureAtlas,
)
from bevy_tpu.render.sprite import Sprite, sprite_from_handle
from bevy_tpu.time import TimePlugin
from bevy_tpu.transform import TransformPlugin, transform_bundle


def _fit_rect(handle, box_w, box_h, mode):
    """ScalingMode twins: FitCenter letterboxes, FillCenter crops uvs."""
    iw, ih = handle["size"]
    u0, v0 = handle["uv_min"]
    u1, v1 = handle["uv_max"]
    if mode == "stretch":
        return (box_w, box_h), (u0, v0), (u1, v1)
    s_fit = min(box_w / iw, box_h / ih)
    if mode == "fit":
        return (iw * s_fit, ih * s_fit), (u0, v0), (u1, v1)
    # fill: crop the uv rect to the box aspect
    s_fill = max(box_w / iw, box_h / ih)
    crop_w = box_w / s_fill / iw
    crop_h = box_h / s_fill / ih
    cu = (u0 + u1) / 2
    cv = (v0 + v1) / 2
    du = (u1 - u0) * crop_w / 2
    dv = (v1 - v0) * crop_h / 2
    return (box_w, box_h), (cu - du, cv - dv), (cu + du, cv + dv)


def build_app(width=480, height=200):
    app = App(capacity=16)
    app.add_plugins(TimePlugin(), TransformPlugin(),
                    RenderPlugin(width=width, height=height),
                    SpritePlugin())
    app.world.spawn(Camera2d(), *transform_bundle())
    atlas = AtlasBuilder(64, 64)
    yy, xx = np.mgrid[0:48, 0:64]
    img = np.ones((48, 64, 4), np.float32)
    img[..., 0] = xx / 63.0
    img[..., 1] = yy / 47.0
    img[..., 2] = 0.4
    h = atlas.add(img, "gradient", srgb=False)
    app.insert_resource(TextureAtlas.RESOURCE, {"data": atlas.build()})
    boxes = [(60.0, 120.0, "stretch"), (60.0, 120.0, "fit"),
             (60.0, 120.0, "fill"), (150.0, 60.0, "fit"),
             (150.0, 60.0, "fill")]
    x = -(len(boxes) - 1) * 42.0
    for bw, bh, mode in boxes:
        size, uvm, uvx = _fit_rect(h, bw, bh, mode)
        app.world.spawn(
            Sprite(size=size, uv_min=uvm, uv_max=uvx, tex=h["tex"]),
            *transform_bundle(translation=(x, 0.0, 0.0)))
        x += 84.0
    return app


if __name__ == "__main__":
    import numpy as _np

    from bevy_tpu.render.plugin import frame_image
    app = build_app()
    app.update(dt=1 / 60)
    _np.save("/tmp/sprite_scale.npy", frame_image(app))
    print("saved /tmp/sprite_scale.npy")
