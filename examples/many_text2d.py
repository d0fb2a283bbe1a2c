"""many_text2d stress test (reference twin:
examples/stress_tests/many_text2d.rs — thousands of glyph sprites from
the text pipeline)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import time as pytime

import numpy as np

from bevy_tpu import App
from bevy_tpu.render import (
    AtlasBuilder, Camera2d, RenderPlugin, SpritePlugin, TextureAtlas,
)
from bevy_tpu.render.text import FontAtlas, spawn_text
from bevy_tpu.time import TimePlugin
from bevy_tpu.transform import TransformPlugin, transform_bundle


def build_app(width=640, height=360, n_labels=120):
    app = App(capacity=8192)
    builder = AtlasBuilder(512, 512)
    font = FontAtlas(builder)
    app.add_plugins(TimePlugin(), TransformPlugin(),
                    RenderPlugin(width=width, height=height),
                    SpritePlugin(max_visible=8192))
    app.insert_resource(TextureAtlas.RESOURCE, {"data": builder.build()})
    app.world.spawn(Camera2d(), *transform_bundle())
    rng = np.random.default_rng(5)
    words = ["bevy", "tpu", "text", "stress", "glyphs", "fast"]
    for i in range(n_labels):
        x = float(rng.uniform(-width / 2 + 40, width / 2 - 40))
        y = float(rng.uniform(-height / 2 + 10, height / 2 - 10))
        col = tuple(rng.random(3) * 0.8 + 0.2) + (1.0,)
        spawn_text(app.world, font, words[i % len(words)],
                   pos=(x, y), color=col)
    app.insert_resource(TextureAtlas.RESOURCE, {"data": builder.build()})
    return app


def main():
    app = build_app()
    app.update(dt=1 / 60)
    t0 = pytime.perf_counter()
    for _ in range(10):
        app.update(dt=1 / 60)
    print(f"many_text2d: {(pytime.perf_counter() - t0) / 10 * 1000:.1f} "
          "ms/frame (120 labels)")


if __name__ == "__main__":
    main()
