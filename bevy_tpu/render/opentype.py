"""OpenType GSUB/GPOS shaping subset (reference twin: the parley/swash
shaping stack of bevy_text — `bevy_text/src/parley_context.rs:1`,
parley 0.11 in `bevy_text/Cargo.toml:44`).

The owned shaper (render/rich_text.py) handles bidi + Arabic joining;
this module adds the two OpenType features the reference gets from
parley that matter most for Latin/European text:

- **GSUB LookupType 4 ligature substitution** (`liga`): fi/fl/ffi…
  sequences collapse to their ligature glyph. Only ligatures whose
  glyph is reachable through the cmap (has a Unicode codepoint, e.g.
  U+FB01 for fi) substitute — the atlas rasterizes by character, so
  unreachable ligature glyphs stay as separate letters (correct text,
  just unligated — the same degradation as a renderer without `liga`).
- **GPOS LookupType 4 mark-to-base attachment** (`mark`): combining
  marks (U+0300…) zero their advance and snap their anchor onto the
  base glyph's anchor, instead of advancing the pen like a letter.

Table access uses fontTools (already the cmap dependency of
render/text.py); the shaping LOGIC — greedy longest-match ligation in
logical order, anchor algebra, pixel scaling — is owned, mirroring how
the reference owns shaping policy in parley while reading sfnt tables
through swash/read-fonts.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

_CACHE: Dict[Tuple[str, int], "ShapingTables"] = {}


class ShapingTables:
    """Parsed ligature + mark-attachment data for one font file."""

    def __init__(self, path: str):
        from fontTools.ttLib import TTFont

        tt = TTFont(path, fontNumber=0, lazy=True)
        self.cmap: Dict[int, str] = tt.getBestCmap() or {}
        # glyph name -> a representative codepoint (for atlas baking)
        self.rev: Dict[str, int] = {}
        for cp, g in self.cmap.items():
            if g not in self.rev or cp < self.rev[g]:
                self.rev[g] = cp
        self.upm = float(tt["head"].unitsPerEm)
        hmtx = tt["hmtx"]
        self._adv = {g: hmtx[g][0] for g in self.rev}

        # ---- GSUB ligatures (liga; LookupType 4, incl. extension 7) ----
        self.ligatures: Dict[str, List[Tuple[Tuple[str, ...], str]]] = {}
        gsub = tt.get("GSUB")
        if gsub is not None and gsub.table.FeatureList is not None:
            lookup_ids = set()
            for fr in gsub.table.FeatureList.FeatureRecord:
                if fr.FeatureTag == "liga":
                    lookup_ids.update(fr.Feature.LookupListIndex)
            for li in sorted(lookup_ids):
                lookup = gsub.table.LookupList.Lookup[li]
                subtables = lookup.SubTable
                if lookup.LookupType == 7:          # extension wrapper
                    subtables = [st.ExtSubTable for st in subtables]
                    if subtables and subtables[0].LookupType != 4:
                        continue
                elif lookup.LookupType != 4:
                    continue
                for st in subtables:
                    for first, ligset in st.ligatures.items():
                        lst = self.ligatures.setdefault(first, [])
                        for lig in ligset:
                            lst.append((tuple(lig.Component), lig.LigGlyph))
            # longest component sequence wins (OT spec order)
            for lst in self.ligatures.values():
                lst.sort(key=lambda e: -len(e[0]))

        # ---- GPOS mark-to-base (mark; LookupType 4, incl. ext 9) ----
        self.marks: Dict[str, Tuple[int, float, float]] = {}
        self.bases: Dict[str, Dict[int, Tuple[float, float]]] = {}
        gpos = tt.get("GPOS")
        if gpos is not None and gpos.table.FeatureList is not None:
            lookup_ids = set()
            for fr in gpos.table.FeatureList.FeatureRecord:
                if fr.FeatureTag == "mark":
                    lookup_ids.update(fr.Feature.LookupListIndex)
            for li in sorted(lookup_ids):
                lookup = gpos.table.LookupList.Lookup[li]
                subtables = lookup.SubTable
                if lookup.LookupType == 9:          # extension wrapper
                    subtables = [st.ExtSubTable for st in subtables]
                    if subtables and subtables[0].LookupType != 4:
                        continue
                elif lookup.LookupType != 4:
                    continue
                for st in subtables:
                    mglyphs = st.MarkCoverage.glyphs
                    bglyphs = st.BaseCoverage.glyphs
                    for g, rec in zip(mglyphs, st.MarkArray.MarkRecord):
                        a = rec.MarkAnchor
                        self.marks[g] = (rec.Class,
                                         float(a.XCoordinate),
                                         float(a.YCoordinate))
                    for g, rec in zip(bglyphs, st.BaseArray.BaseRecord):
                        anchors = {}
                        for cls, a in enumerate(rec.BaseAnchor):
                            if a is not None:
                                anchors[cls] = (float(a.XCoordinate),
                                                float(a.YCoordinate))
                        if anchors:
                            self.bases.setdefault(g, {}).update(anchors)
        tt.close()

    # -- queries ---------------------------------------------------------
    def glyph_name(self, ch: str) -> Optional[str]:
        return self.cmap.get(ord(ch))

    def ligate(self, chars: str) -> Optional[Tuple[str, int, float]]:
        """Longest ligature starting at chars[0]: returns
        (ligature_char, consumed_count, advance_font_units) or None.
        Only codepoint-reachable ligature glyphs substitute."""
        first = self.glyph_name(chars[0])
        if first is None or first not in self.ligatures:
            return None
        rest = [self.glyph_name(c) for c in chars[1:]]
        for comps, lig in self.ligatures[first]:
            n = len(comps)
            if n <= len(rest) and tuple(rest[:n]) == comps:
                cp = self.rev.get(lig)
                if cp is None:
                    continue                 # not atlas-reachable
                return chr(cp), n + 1, float(self._adv.get(lig, 0))
        return None

    def mark_offset(self, base_ch: str, mark_ch: str
                    ) -> Optional[Tuple[float, float]]:
        """GPOS anchor delta (dx, dy) in FONT UNITS, y-up, from the
        base glyph's ORIGIN to where the mark's origin must go."""
        bg = self.glyph_name(base_ch)
        mg = self.glyph_name(mark_ch)
        if bg is None or mg is None or mg not in self.marks:
            return None
        cls, mx, my = self.marks[mg]
        anchors = self.bases.get(bg)
        if anchors is None or cls not in anchors:
            return None
        bx, by = anchors[cls]
        return bx - mx, by - my

    def is_mark(self, ch: str) -> bool:
        g = self.glyph_name(ch)
        return g is not None and g in self.marks


def shaping_tables(font) -> Optional[ShapingTables]:
    """Tables for a FontAtlas-like object (needs ._path); cached."""
    path = getattr(font, "_path", None)
    if path is None:
        return None
    key = (path, 0)
    if key not in _CACHE:
        try:
            _CACHE[key] = ShapingTables(path)
        except Exception:
            _CACHE[key] = None           # unparseable: degrade silently
    return _CACHE[key]


def px_per_unit(font) -> float:
    """Font-unit → pixel scale for a FontAtlas file font."""
    tabs = shaping_tables(font)
    if tabs is None or tabs.upm <= 0:
        return 0.0
    size = float(getattr(getattr(font, "_pil", None), "size", 0.0))
    return size / tabs.upm
