"""Text rendering (reference twin: bevy_text — font assets, glyph atlases
`src/font_atlas*.rs`, layout pipeline; parley shaping is replaced by simple
monospace layout of a bitmap font).

Two tiers:
  * static text: host-side `spawn_text` bakes a string to one glyph-sprite
    per character (re-spawn to change — the reference also relayouts).
  * dynamic numbers: `DigitText` slots select glyph uv rects IN-JIT from a
    numeric resource each frame (no host round trip) — the TPU-native way
    to render counters like the FPS overlay.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
import numpy as np

from bevy_tpu.ecs.component import component, field
from bevy_tpu.ecs.query import Query, Res
from bevy_tpu.ecs.system import system
from bevy_tpu.render.sprite import Sprite
from bevy_tpu.transform import GlobalTransform, Transform

ASCII_START, ASCII_END = 32, 127


class FontAtlas:
    """Glyph atlas baked on the host (ref: bevy_text font_atlas_set.rs —
    rasterize once into a texture atlas, sample per glyph quad).

    Default is PIL's built-in bitmap font (monospace layout). Pass
    `path=` to a .ttf/.otf file (plus `size=` in px) to rasterize a real
    vector font instead — glyphs then carry per-character advances and
    bearings, and `spawn_text` lays them out proportionally (the role
    parley/cosmic-text shaping plays in the reference)."""

    def __init__(self, builder, scale: int = 2, path: str | None = None,
                 size: int | None = None):
        from PIL import Image, ImageDraw, ImageFont
        if path is not None:
            font = ImageFont.truetype(path, size or 16)
        elif size is not None:
            font = ImageFont.load_default(size)   # FreeType default font
        else:
            font = ImageFont.load_default()
        self.proportional = hasattr(font, "getlength") and \
            (path is not None or size is not None)
        self.handles: Dict[str, dict] = {}
        self.advances: Dict[str, float] = {}
        self.bearings: Dict[str, tuple] = {}
        self.scale = scale if path is None and size is None else 1
        scale = self.scale
        self._builder = builder          # lazy non-ASCII glyph bakes
        self._path = path
        self._pil = font
        self._cmap = None                # fontTools coverage, built on demand
        try:
            ascent, descent = font.getmetrics()
            line_h = ascent + descent
        except AttributeError:
            ascent, line_h = None, None
        for code in range(ASCII_START, ASCII_END):
            self._bake(chr(code))
        self.char_w = (self.advances["M"] if self.proportional
                       else self.handles["M"]["size"][0])
        self.char_h = (float(line_h) if line_h is not None
                       else self.handles["M"]["size"][1])
        self.ascent = float(ascent) if ascent is not None else self.char_h
        self._font = font if self.proportional else None

    def _bake(self, ch: str):
        """Rasterize one glyph into the atlas (shared by the eager ASCII
        loop and lazy non-ASCII bakes from the rich-text layout)."""
        from PIL import Image, ImageDraw
        font, scale = self._pil, self.scale
        box = font.getbbox(ch)
        x0, y0 = (box[0], box[1]) if self.proportional else (0, 0)
        w = max(box[2] - x0, 1)
        h = max(box[3] - y0, 1)
        img = Image.new("L", (w, h), 0)
        ImageDraw.Draw(img).text((-x0, -y0), ch, fill=255, font=font)
        a = np.asarray(img, np.float32) / 255.0
        if scale != 1:
            a = np.repeat(np.repeat(a, scale, 0), scale, 1)
        rgba = np.ones(a.shape + (4,), np.float32)
        rgba[..., 3] = a
        self.handles[ch] = self._builder.add(rgba, f"glyph:{ch}",
                                             srgb=False)
        adv = font.getlength(ch) if self.proportional else w
        self.advances[ch] = float(adv) * scale
        self.bearings[ch] = (float(x0) * scale, float(y0) * scale)

    def has(self, ch: str) -> bool:
        """Does this font cover `ch`? (cmap query via fontTools for file
        fonts; the PIL built-in/default fonts report ASCII only). The
        rich-text fallback chain walks this (ref: bevy_text's
        FontFamily fallback resolution in parley_context.rs)."""
        if ch in self.handles:
            return True
        if self._path is None:
            return ASCII_START <= ord(ch) < ASCII_END
        if self._cmap is None:
            from fontTools.ttLib import TTFont
            tt = TTFont(self._path, fontNumber=0, lazy=True)
            self._cmap = tt.getBestCmap()
            tt.close()
        return ord(ch) in self._cmap

    def glyph(self, ch: str) -> dict:
        """Atlas handle for `ch`, baking it on first use. Lazy bakes must
        happen before the atlas builder's build() uploads the texture."""
        if ch not in self.handles:
            self._bake(ch)
        return self.handles[ch]

    def measure(self, text: str) -> float:
        """Pixel width of a single line at native size. FreeType fonts
        measure the whole run, so kerning pairs are included (the role
        swash/parley shaping plays in the reference)."""
        if self._font is not None:
            return float(self._font.getlength(text)) * self.scale
        return sum(self.advances.get(ch, self.char_w) for ch in text)


def wrap_lines_measured(text: str, max_width: float, measure):
    """Word wrap by measured pixel width (proportional fonts)."""
    lines = []
    for raw in text.split("\n"):
        cur = ""
        for word in raw.split(" "):
            while measure(word) > max_width:      # unbreakable long word
                if cur:
                    lines.append(cur)
                    cur = ""
                cut = len(word)
                while cut > 1 and measure(word[:cut]) > max_width:
                    cut -= 1
                lines.append(word[:cut])
                word = word[cut:]
            cand = f"{cur} {word}" if cur else word
            if measure(cand) <= max_width:
                cur = cand
            else:
                lines.append(cur)
                cur = word
        lines.append(cur)
    return lines


def wrap_lines(text: str, chars_per_line: int):
    """Word wrap at spaces, breaking words longer than a line (ref: the
    Linebreak::WordBoundary policy, bevy_text/src/text.rs)."""
    lines = []
    for raw in text.split("\n"):
        cur = ""
        for word in raw.split(" "):
            while len(word) > chars_per_line:     # unbreakable long word
                if cur:
                    lines.append(cur)
                    cur = ""
                lines.append(word[:chars_per_line])
                word = word[chars_per_line:]
            cand = f"{cur} {word}" if cur else word
            if len(cand) <= chars_per_line:
                cur = cand
            else:
                lines.append(cur)
                cur = word
        lines.append(cur)
    return lines


def shape_run(builder, text: str, path: str, size: int = 16,
              direction: str | None = None, features=None,
              language: str | None = None):
    """Shape a COMPLEX-SCRIPT run with HarfBuzz+FriBiDi (PIL's RAQM
    layout engine) and bake it as ONE atlas texture (ref: bevy_text's
    parley shaping — ligatures, Arabic joining, bidi reordering; per-
    glyph layout can't represent these, so shaped runs rasterize whole).

    Returns the atlas handle dict (use as a Sprite's uv rect). features
    e.g. ["-liga"] disables ligatures; direction "rtl"/"ltr"."""
    from PIL import Image, ImageDraw, ImageFont
    font = ImageFont.truetype(path, size,
                              layout_engine=ImageFont.Layout.RAQM)
    kw = {}
    if direction:
        kw["direction"] = direction
    if features:
        kw["features"] = features
    if language:
        kw["language"] = language
    box = ImageDraw.Draw(Image.new("L", (1, 1))).textbbox(
        (0, 0), text, font=font, **kw)
    w = max(int(box[2] - box[0]) + 2, 1)
    h = max(int(box[3] - box[1]) + 2, 1)
    img = Image.new("L", (w, h), 0)
    ImageDraw.Draw(img).text((-box[0] + 1, -box[1] + 1), text, fill=255,
                             font=font, **kw)
    a = np.asarray(img, np.float32) / 255.0
    rgba = np.ones(a.shape + (4,), np.float32)
    rgba[..., 3] = a
    return builder.add(rgba, None, srgb=False)


def spawn_shaped_text(world, builder, text: str, path: str, size: int = 16,
                      pos=(0.0, 0.0), z=10.0,
                      color=(1.0, 1.0, 1.0, 1.0), **shape_kw):
    """Shape + spawn a complex-script run as one sprite (the shaped
    counterpart of spawn_text; ref: bevy_text rich text spans render
    shaped glyph runs)."""
    handle = shape_run(builder, text, path, size, **shape_kw)
    w, h = handle["size"]
    row = world.spawn(
        Sprite(color=color, size=(w, h), uv_min=handle["uv_min"],
               uv_max=handle["uv_max"], tex=1),
        Transform(translation=(pos[0] + w / 2, pos[1] - h / 2, z)),
        GlobalTransform(translation=(pos[0] + w / 2, pos[1] - h / 2, z)),
    )
    return row, handle


def spawn_text(world, font: FontAtlas, text: str, pos=(0.0, 0.0), z=10.0,
               color=(1.0, 1.0, 1.0, 1.0), size=None, max_width=None,
               justify="left"):
    """Bake a string to glyph sprites (monospace advance). Returns rows.
    `max_width` wraps at word boundaries (ref: TextLayout::linebreak);
    `justify` is "left"/"center"/"right" within max_width — or within the
    widest line when max_width is None (ref: Justify)."""
    rows = []
    cw = size or font.char_w
    k = cw / font.char_w                       # uniform scale factor
    ch_h = font.char_h * k
    prop = getattr(font, "proportional", False)

    def line_w(line):
        return font.measure(line) * k if prop else len(line) * cw

    if max_width is not None:
        if prop:
            lines = wrap_lines_measured(text, max_width / max(k, 1e-6),
                                        font.measure)
        else:
            lines = wrap_lines(text, max(1, int(max_width // cw)))
        box_w = float(max_width)
    else:
        lines = text.split("\n")
        box_w = max(line_w(l) for l in lines) if lines else 0.0
    y = float(pos[1])
    for line in lines:
        slack = box_w - line_w(line)
        x0 = float(pos[0]) + {"left": 0.0, "center": slack / 2,
                              "right": slack}[justify]
        x = x0
        for i, ch in enumerate(line):
            if prop:
                # kerned pen position: measured width of the prefix
                pen = x0 + font.measure(line[:i]) * k
            adv = font.advances.get(ch, font.char_w) * k if prop else cw
            if ch != " " and ch in font.handles:
                h = font.handles[ch]
                gw, gh = h["size"][0] * k, h["size"][1] * k
                if prop:
                    bx, by = font.bearings[ch]
                    gx = pen + bx * k + gw / 2
                    gy = y - by * k - gh / 2
                else:
                    gw, gh = cw, ch_h
                    gx, gy = x + cw / 2, y - ch_h / 2
                rows.append(world.spawn(
                    Sprite(size=(gw, gh), color=color,
                           uv_min=h["uv_min"], uv_max=h["uv_max"], tex=h["tex"]),
                    Transform(translation=(gx, gy, z)),
                    GlobalTransform(translation=(gx, gy, z))))
            x += adv
        y -= ch_h * 1.2
    return rows


@component
class DigitText:
    """One digit slot of an in-jit counter: shows digit k of the value in
    the `source` resource field (value read as int32)."""
    slot = field((), jnp.int32)       # 0 = least significant
    num_slots = field((), jnp.int32, default=5)


def make_digit_system(font: FontAtlas, source_res: str, source_field: str):
    """Updates DigitText sprites' uv rects from a numeric resource."""
    uv0 = np.stack([font.handles[str(d)]["uv_min"] for d in range(10)])
    uv1 = np.stack([font.handles[str(d)]["uv_max"] for d in range(10)])
    tex = font.handles["0"]["tex"]

    @system(name=f"digit_text_{source_res}_{source_field}")
    def digit_text(q=Query(Sprite, DigitText), src=Res(source_res)):
        value = jnp.asarray(getattr(src, source_field)).astype(jnp.int32)
        value = jnp.maximum(value, 0)
        slot = q.digit_text.slot
        digit = (value // (10 ** slot)) % 10
        # leading-zero blanking: alpha 0 above the top significant digit
        sig = value < (10 ** slot)
        show = (slot == 0) | ~sig
        u0 = jnp.asarray(uv0)[digit]
        u1 = jnp.asarray(uv1)[digit]
        q.sprite.uv_min = jnp.where(q.mask[:, None], u0, q.sprite.uv_min)
        q.sprite.uv_max = jnp.where(q.mask[:, None], u1, q.sprite.uv_max)
        q.sprite.tex = jnp.where(q.mask, tex, q.sprite.tex)
        alpha = jnp.where(show, 1.0, 0.0)
        q.sprite.color = jnp.where(
            q.mask[:, None], q.sprite.color.at[:, 3].set(alpha),
            q.sprite.color)

    return digit_text


def spawn_digit_counter(world, font: FontAtlas, num_digits=5, pos=(0.0, 0.0),
                        z=10.0, color=(1.0, 1.0, 1.0, 1.0), size=None):
    """Fixed digit slots, most significant on the left."""
    cw = size or font.char_w
    ch_h = cw * font.char_h / font.char_w
    rows = []
    for i in range(num_digits):
        slot = num_digits - 1 - i
        x = pos[0] + i * cw + cw / 2
        rows.append(world.spawn(
            Sprite(size=(cw, ch_h), color=color),
            DigitText(slot=slot, num_slots=num_digits),
            Transform(translation=(x, pos[1] - ch_h / 2, z)),
            GlobalTransform(translation=(x, pos[1] - ch_h / 2, z))))
    return rows
