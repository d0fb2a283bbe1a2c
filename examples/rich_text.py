"""Rich text: multi-style spans, bidi paragraphs, Arabic shaping, font
fallback (reference twin: examples/ui/text.rs + bevy_text's span/parley
pipeline — pipeline.rs, parley_context.rs)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

from bevy_tpu import App
from bevy_tpu.render import RenderPlugin
from bevy_tpu.render.camera import Camera2d
from bevy_tpu.render.rich_text import TextSpan, spawn_rich_text
from bevy_tpu.render.sprite import SpritePlugin
from bevy_tpu.render.text import FontAtlas
from bevy_tpu.render.texture import AtlasBuilder, TextureAtlas
from bevy_tpu.time import TimePlugin
from bevy_tpu.transform import TransformPlugin, transform_bundle


def _ttf_path():
    try:
        import matplotlib
        p = Path(matplotlib.get_data_path()) / "fonts/ttf/DejaVuSans.ttf"
        return str(p) if p.exists() else None
    except ImportError:
        return None


def build_app(width=480, height=270):
    app = App(capacity=1024)
    app.add_plugins(TimePlugin(), TransformPlugin(),
                    RenderPlugin(width=width, height=height),
                    SpritePlugin())
    app.world.spawn(Camera2d(), *transform_bundle())
    builder = AtlasBuilder(1024, 1024)
    path = _ttf_path()
    ascii_font = FontAtlas(builder)            # bitmap builtin: ASCII only
    fallbacks = []
    if path is not None:
        fallbacks.append(FontAtlas(builder, path=path, size=18))

    # one paragraph, many styles — sizes/colors share a baseline
    spawn_rich_text(app.world, [
        TextSpan("Rich ", size=20.0, color=(1.0, 0.85, 0.3, 1.0)),
        TextSpan("text ", size=14.0, color=(0.7, 0.9, 1.0, 1.0)),
        TextSpan("spans", size=26.0, color=(1.0, 0.5, 0.5, 1.0)),
    ], ascii_font, fallbacks=fallbacks, pos=(-200.0, 115.0))

    # mixed-direction paragraph: Latin + Hebrew + Arabic (shaped) + digits,
    # resolved by the engine-owned UAX#9 pass and the DejaVu fallback
    spawn_rich_text(app.world, [
        TextSpan("bidi: ", color=(0.9, 0.9, 0.9, 1.0)),
        TextSpan("שלום", color=(0.5, 1.0, 0.6, 1.0)),
        TextSpan(" and ", color=(0.9, 0.9, 0.9, 1.0)),
        TextSpan("بسم 123", color=(0.6, 0.8, 1.0, 1.0)),
    ], ascii_font, fallbacks=fallbacks, pos=(-200.0, 60.0))

    # an RTL-base paragraph right-aligns itself inside its wrap box
    spawn_rich_text(app.world, [
        TextSpan("שלום עולם (RTL) ", color=(1.0, 0.8, 0.5, 1.0)),
        TextSpan("mixed in LTR", color=(0.8, 0.8, 0.8, 1.0)),
    ], ascii_font, fallbacks=fallbacks, pos=(-200.0, 0.0), max_width=400.0)

    # wrapped multi-span paragraph with justify
    spawn_rich_text(app.world, [
        TextSpan("wrapped ", color=(1.0, 1.0, 1.0, 1.0)),
        TextSpan("styled ", size=22.0, color=(0.9, 0.6, 1.0, 1.0)),
        TextSpan("paragraph flows across lines with per-span color and "
                 "size, centered in its box",
                 color=(0.7, 0.7, 0.9, 1.0)),
    ], ascii_font, fallbacks=fallbacks, pos=(-160.0, -55.0),
        max_width=320.0, justify="center")

    app.insert_resource(TextureAtlas.RESOURCE, {"data": builder.build()})
    return app


if __name__ == "__main__":
    from bevy_tpu.render.plugin import frame_image

    app = build_app()
    app.update(dt=1 / 60)
    np.save("/tmp/rich_text_frame.npy", frame_image(app))
    print("saved /tmp/rich_text_frame.npy")
