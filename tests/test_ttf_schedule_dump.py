"""TTF font atlases + schedule dump (ref models: bevy_text truetype
rasterisation via cosmic-text; bevy_mod_debugdump-style schedule graph)."""

import numpy as np
import pytest


def _ttf_path():
    import matplotlib
    from pathlib import Path
    p = Path(matplotlib.get_data_path()) / "fonts/ttf/DejaVuSans.ttf"
    return str(p) if p.exists() else None


def test_ttf_font_atlas_proportional():
    from bevy_tpu.render.text import FontAtlas
    from bevy_tpu.render.texture import AtlasBuilder
    path = _ttf_path()
    if path is None:
        pytest.skip("no ttf on system")
    b = AtlasBuilder(512, 512)
    font = FontAtlas(b, path=path, size=20)
    assert font.proportional
    # proportional: 'i' narrower than 'W'
    assert font.advances["i"] < font.advances["W"] * 0.6
    assert font.measure("iii") < font.measure("WWW")
    assert font.ascent > 10


def test_ttf_text_renders_and_justifies():
    from bevy_tpu import App
    from bevy_tpu.render import Camera2d, RenderPlugin, SpritePlugin
    from bevy_tpu.render.plugin import frame_image
    from bevy_tpu.render.text import FontAtlas, spawn_text
    from bevy_tpu.render.texture import AtlasBuilder, TextureAtlas
    from bevy_tpu.time import TimePlugin
    from bevy_tpu.transform import TransformPlugin, transform_bundle
    path = _ttf_path()
    if path is None:
        pytest.skip("no ttf on system")
    app = App(capacity=256)
    b = AtlasBuilder(512, 512)
    font = FontAtlas(b, path=path, size=18)
    app.add_plugins(TimePlugin(), TransformPlugin(),
                    RenderPlugin(width=240, height=120), SpritePlugin())
    app.insert_resource(TextureAtlas.RESOURCE, {"data": b.build()})
    app.world.spawn(Camera2d(), *transform_bundle())
    rows = spawn_text(app.world, font, "Wide and thin text",
                      pos=(-110, 40), max_width=220, justify="center")
    assert len(rows) > 10
    app.update(dt=1 / 60)
    img = frame_image(app).astype(int)
    bg = img[0, 0]
    cov = np.abs(img - bg).max(-1) > 10
    assert cov.mean() > 0.005                # glyphs visible


def test_builtin_font_still_monospace():
    from bevy_tpu.render.text import FontAtlas
    from bevy_tpu.render.texture import AtlasBuilder
    b = AtlasBuilder(512, 256)
    font = FontAtlas(b)
    assert not font.proportional


def test_wrap_lines_measured():
    from bevy_tpu.render.text import wrap_lines_measured
    meas = lambda s: len(s) * 10.0
    lines = wrap_lines_measured("aaa bb c", 60.0, meas)
    assert lines == ["aaa bb", "c"]
    lines = wrap_lines_measured("abcdefgh", 30.0, meas)
    assert lines == ["abc", "def", "gh"]


def test_schedule_dump_text_and_dot():
    from bevy_tpu import App, Update
    from bevy_tpu.dev_tools import dump_schedule, dump_schedules
    from bevy_tpu.ecs.query import ResMut
    from bevy_tpu.ecs.system import system

    app = App(capacity=8)
    app.insert_resource("acc", {"v": np.float32(0.0)})

    @system(name="sys_a")
    def sys_a(r=ResMut("acc")):
        r.v = r.v + 1

    @system(name="sys_b")
    def sys_b(r=ResMut("acc")):
        r.v = r.v * 2

    app.add_systems(Update, sys_a)
    app.add_systems(Update, sys_b, after="sys_a")
    out = dump_schedule(app, Update)
    assert "sys_a" in out and "sys_b" in out
    # order respected in the listing
    assert out.index("sys_a") < out.index("sys_b")
    dot = dump_schedule(app, Update, dot=True)
    assert dot.startswith("digraph") and "->" in dot
    allout = dump_schedules(app)
    assert "sys_a" in allout
