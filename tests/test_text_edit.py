"""Text editing model + shaped runs (ref models: bevy_text editing.rs /
cursor.rs — cursor, anchored selection, word jumps — and the parley
shaping position: ligature/bidi-correct complex-script runs)."""

from pathlib import Path

import numpy as np
import pytest

from bevy_tpu.text_edit import TextEditState


def test_cursor_insert_middle():
    ed = TextEditState("helo")
    ed.left()
    ed.insert("l")
    assert ed.value == "hello" and ed.cursor == 4


def test_selection_replace():
    ed = TextEditState("hello world")
    ed.home()
    for _ in range(5):
        ed.right(select=True)
    assert ed.selected_text == "hello"
    ed.insert("goodbye")
    assert ed.value == "goodbye world"


def test_word_jumps():
    ed = TextEditState("foo bar_baz  qux")
    ed.home()
    ed.word_right()
    assert ed.cursor == 3
    ed.word_right()
    assert ed.cursor == 11          # bar_baz is one word
    ed.end()
    ed.word_left()
    assert ed.cursor == 13


def test_backspace_delete_selection():
    ed = TextEditState("abcdef")
    ed.home()
    ed.right()
    ed.right(select=True)
    ed.right(select=True)
    ed.backspace()                   # deletes selection "bc"
    assert ed.value == "adef"
    ed.delete()                      # deletes "d" at cursor
    assert ed.value == "aef"


def test_undo_and_cut():
    ed = TextEditState("hello")
    ed.select_all()
    cut = ed.cut()
    assert cut == "hello" and ed.value == ""
    ed.undo()
    assert ed.value == "hello"


def test_max_len_clamps_insert():
    ed = TextEditState("12345", max_len=8)
    ed.end()
    ed.insert("67890")
    assert ed.value == "12345678"


def test_display_caret():
    ed = TextEditState("ab")
    ed.left()
    assert ed.display() == "a|b"


def _ttf():
    import matplotlib
    p = Path(matplotlib.get_data_path()) / "fonts/ttf/DejaVuSans.ttf"
    if not p.exists():
        pytest.skip("no DejaVuSans available")
    return str(p)


def test_shaped_run_bidi_differs_from_basic():
    """RAQM shaping (harfbuzz+fribidi) must reorder/join complex text —
    the shaped bitmap differs from the naive per-char layout (ref: the
    parley shaping the reference uses for Arabic/Hebrew)."""
    from PIL import Image, ImageDraw, ImageFont
    path = _ttf()
    text = "abc שלום abc"   # Hebrew run mid-string
    imgs = []
    for eng in (ImageFont.Layout.BASIC, ImageFont.Layout.RAQM):
        font = ImageFont.truetype(path, 24, layout_engine=eng)
        img = Image.new("L", (220, 40), 0)
        ImageDraw.Draw(img).text((2, 2), text, fill=255, font=font)
        imgs.append(np.asarray(img))
    assert (imgs[0] != imgs[1]).sum() > 50


def test_shape_run_bakes_texture():
    from bevy_tpu.render.text import shape_run
    from bevy_tpu.render.texture import AtlasBuilder
    b = AtlasBuilder(512, 128)
    h = shape_run(b, "ffi fjord", _ttf(), size=24)
    w, hh = h["size"]
    assert w > 40 and hh > 10
    u0, v0 = h["uv_min"]
    u1, v1 = h["uv_max"]
    region = b.data[int(v0 * 128):int(v1 * 128), int(u0 * 512):int(u1 * 512)]
    assert region[..., 3].max() == 1.0      # glyph coverage present
