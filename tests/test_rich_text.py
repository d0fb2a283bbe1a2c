"""Owned rich-text layout: multi-style spans, bidi paragraphs, Arabic
joining, font fallback (ref: bevy_text/src/pipeline.rs + parley_context.rs
— the parley layout stack, owned in-engine here)."""

import numpy as np
import pytest

from bevy_tpu.render.rich_text import (
    TextSpan, arabic_join, bidi_levels, layout_rich, line_reset, mirror,
    visual_order,
)


HEB = "שלום"          # shalom
ARA = "بسم"                 # beh-seen-meem


def _ttf_path():
    import matplotlib
    from pathlib import Path
    p = Path(matplotlib.get_data_path()) / "fonts/ttf/DejaVuSans.ttf"
    return str(p) if p.exists() else None


# ---------------------------------------------------------------------------
# UAX #9 core
# ---------------------------------------------------------------------------


def test_bidi_pure_ltr_and_rtl():
    lv, base = bidi_levels("hello")
    assert base == 0 and lv == [0] * 5
    lv, base = bidi_levels(HEB)
    assert base == 1 and all(l == 1 for l in lv)


def test_bidi_mixed_reverses_rtl_run():
    text = "ab " + HEB + " cd"
    lv, base = bidi_levels(text)
    assert base == 0
    order = visual_order(line_reset(text, lv, base))
    vis = "".join(text[i] for i in order)
    # Latin stays in place, the Hebrew run is reversed in visual order
    assert vis == "ab " + HEB[::-1] + " cd"


def test_bidi_numbers_in_rtl_stay_ltr():
    # digits inside an RTL paragraph read left-to-right: I2 gives EN/AN
    # level base+1 = 2, which is even → an LTR run inside the RTL line
    text = HEB + " 123 " + HEB
    lv, base = bidi_levels(text)
    assert base == 1
    i = text.index("1")
    assert lv[i] == lv[i + 1] == lv[i + 2] == 2
    order = visual_order(line_reset(text, lv, base))
    vis = "".join(text[i] for i in order)
    assert "123" in vis              # digit run not reversed
    # RTL paragraph: the FIRST logical word appears at the right
    assert vis.index(HEB[::-1]) > vis.index("123") or \
        vis == HEB[::-1] + " 123 " + HEB[::-1]


def test_line_reset_trailing_whitespace():
    text = "abc " + HEB + "  "
    lv, base = bidi_levels(text)
    out = line_reset(text, lv, base)
    assert out[-1] == base and out[-2] == base


def test_mirror_brackets_in_rtl():
    assert mirror("(", 1) == ")"
    assert mirror("(", 0) == "("
    assert mirror("a", 1) == "a"


# ---------------------------------------------------------------------------
# Arabic contextual joining
# ---------------------------------------------------------------------------


def test_arabic_join_forms():
    out = arabic_join(ARA)
    # beh initial, seen medial, meem final
    assert [ord(c) for c in out] == [0xFE91, 0xFEB4, 0xFEE2]


def test_arabic_join_lam_alef_ligature():
    out = arabic_join("لا")          # lam + alef → isolated lig
    assert [ord(c) for c in out] == [0xFEFB]
    out = arabic_join("بلا")    # beh joins → final lig
    assert [ord(c) for c in out] == [0xFE91, 0xFEFC]


def test_arabic_join_non_joining_right():
    # reh never connects to the following letter → next glyph is initial
    out = arabic_join("ربا")    # reh, beh, alef
    assert [ord(c) for c in out] == [0xFEAD, 0xFE91, 0xFE8E]


def test_arabic_join_transparent_marks():
    # tashkeel between letters must not break the join
    out = arabic_join("بَس")    # beh, fatha, seen
    # beh takes INITIAL form (joined across the mark), seen FINAL form
    assert ord(out[0]) == 0xFE91 and ord(out[2]) == 0xFEB2


def test_arabic_join_passthrough():
    assert arabic_join("plain ascii") == "plain ascii"


# ---------------------------------------------------------------------------
# Span layout (needs an atlas)
# ---------------------------------------------------------------------------


def _font(size=None, path=None):
    from bevy_tpu.render.text import FontAtlas
    from bevy_tpu.render.texture import AtlasBuilder
    return FontAtlas(AtlasBuilder(1024, 1024), path=path, size=size)


def test_spans_mixed_sizes_share_baseline():
    f = _font()
    spans = [TextSpan("big", size=f.char_h * 2, color=(1, 0, 0, 1)),
             TextSpan("small", size=f.char_h)]
    glyphs, w, h = layout_rich(spans, f)
    assert w > 0 and h >= f.char_h * 2
    ys = {round(g.y, 3) for g in glyphs}
    assert len(ys) == 1              # one baseline for the whole line
    big = [g for g in glyphs if g.color == (1, 0, 0, 1)]
    small = [g for g in glyphs if g.color != (1, 0, 0, 1)]
    assert len(big) == 3 and len(small) == 5
    assert big[0].k == pytest.approx(2 * small[0].k)


def test_word_wrap_and_long_word_split():
    f = _font()
    cw = f.char_w
    glyphs, w, h = layout_rich([TextSpan("aa bb cc")], f,
                               max_width=cw * 5.5)
    assert h > f.char_h              # wrapped to >1 line
    glyphs, w, h = layout_rich([TextSpan("aaaaaaaaaa")], f,
                               max_width=cw * 4.5)
    assert h > f.char_h              # unbreakable word hard-split
    assert all(g.x + g.adv <= w + 1e-3 for g in glyphs)


def test_rtl_paragraph_right_aligns_under_left_justify():
    path = _ttf_path()
    if path is None:
        pytest.skip("no ttf on system")
    f = _font(size=16, path=path)
    box = 200.0
    glyphs, w, h = layout_rich([TextSpan(HEB)], f, max_width=box)
    assert max(g.x + g.adv for g in glyphs) > box * 0.8
    # and visually the first logical letter sits rightmost
    first = next(g for g in glyphs if g.ch == HEB[0])
    assert first.x == max(g.x for g in glyphs)


def test_font_fallback_chain():
    path = _ttf_path()
    if path is None:
        pytest.skip("no ttf on system")
    ascii_font = _font()                       # PIL builtin: ASCII only
    full = _font(size=16, path=path)
    spans = [TextSpan("ok " + HEB)]
    glyphs, _, _ = layout_rich(spans, ascii_font, fallbacks=[full])
    by_ch = {g.ch: g for g in glyphs}
    assert by_ch["o"].font is ascii_font
    assert by_ch[HEB[0]].font is full          # fell through to DejaVu


def test_spawn_rich_text_renders():
    path = _ttf_path()
    if path is None:
        pytest.skip("no ttf on system")
    from bevy_tpu import App
    from bevy_tpu.render import Camera2d, RenderPlugin, SpritePlugin
    from bevy_tpu.render.plugin import frame_image
    from bevy_tpu.render.rich_text import spawn_rich_text
    from bevy_tpu.render.text import FontAtlas
    from bevy_tpu.render.texture import AtlasBuilder, TextureAtlas
    from bevy_tpu.time import TimePlugin
    from bevy_tpu.transform import TransformPlugin, transform_bundle

    app = App(capacity=512)
    b = AtlasBuilder(1024, 1024)
    font = FontAtlas(b, path=path, size=18)
    app.add_plugins(TimePlugin(), TransformPlugin(),
                    RenderPlugin(width=320, height=160), SpritePlugin())
    spans = [TextSpan("Mix ", color=(1, 1, 1, 1)),
             TextSpan(HEB + " ", color=(1, 0.8, 0.2, 1)),
             TextSpan(arabic_join and ARA, color=(0.4, 0.8, 1, 1)),
             TextSpan(" end", size=24.0)]
    rows, glyphs = spawn_rich_text(app.world, spans, font,
                                   pos=(-150, 40), max_width=300)
    app.insert_resource(TextureAtlas.RESOURCE, {"data": b.build()})
    app.world.spawn(Camera2d(), *transform_bundle())
    assert len(rows) > 8
    app.update(dt=1 / 60)
    img = frame_image(app).astype(int)
    bg = img[0, 0]
    cov = np.abs(img - bg).max(-1) > 10
    assert cov.mean() > 0.004        # mixed-script glyphs visible
