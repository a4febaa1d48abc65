"""Generate tests/fixtures/tiny_cjk.ttf — a minimal CJK-subset test font.

The environment ships no CJK fonts (the reference's simhei.ttf/xiaozhuan.ttf
are stripped from its mount), but the PIL rasterization path
(realise_tpu.text.glyphs._pil_glyph / render_vocab_font) must be validated
against a real TrueType font: it mirrors the reference's
font.getmask → crop/pad → global-normalize recipe (reference:
src/models.py:777-793) byte-for-byte for checkpoint parity.

This builds an ~3 KB TTF with distinct box-and-bar outlines for a handful
of common CJK codepoints (plus ASCII 'A' and .notdef) using fontTools'
FontBuilder. Glyph shapes are codepoint-derived so every char renders a
different bitmap. Regenerate with:  python tools/gen_test_font.py
"""

from __future__ import annotations

import os

from fontTools.fontBuilder import FontBuilder
from fontTools.pens.ttGlyphPen import TTGlyphPen

CHARS = "一二三人大好你我的中文字学生国"
UPM = 1000  # units per em

OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "fixtures",
                   "tiny_cjk.ttf")


def draw_glyph(cp: int):
    """A codepoint-derived outline: outer frame + horizontal bars whose
    count/offsets vary with the codepoint, so chars are pairwise distinct."""
    pen = TTGlyphPen(None)
    # outer frame
    pen.moveTo((100, 0))
    pen.lineTo((100, 760))
    pen.lineTo((900, 760))
    pen.lineTo((900, 0))
    pen.closePath()
    # inner cutout (makes it a frame, not a filled box)
    pen.moveTo((180, 80))
    pen.lineTo((820, 80))
    pen.lineTo((820, 680))
    pen.lineTo((180, 680))
    pen.closePath()
    # codepoint-dependent bars
    n_bars = 1 + (cp % 3)
    phase = (cp // 3) % 5
    for i in range(n_bars):
        y0 = 140 + i * 180 + phase * 12
        pen.moveTo((220, y0))
        pen.lineTo((220, y0 + 70))
        pen.lineTo((780 - (cp % 7) * 40, y0 + 70))
        pen.lineTo((780 - (cp % 7) * 40, y0))
        pen.closePath()
    return pen.glyph()


def main():
    glyph_order = [".notdef", "A"] + [f"uni{ord(c):04X}" for c in CHARS]
    cmap = {ord("A"): "A"}
    cmap.update({ord(c): f"uni{ord(c):04X}" for c in CHARS})

    fb = FontBuilder(UPM, isTTF=True)
    fb.setupGlyphOrder(glyph_order)
    fb.setupCharacterMap(cmap)

    glyphs = {".notdef": TTGlyphPen(None).glyph(), "A": draw_glyph(ord("A"))}
    for c in CHARS:
        glyphs[f"uni{ord(c):04X}"] = draw_glyph(ord(c))
    fb.setupGlyf(glyphs)

    metrics = {name: (UPM, 60) for name in glyph_order}
    fb.setupHorizontalMetrics(metrics)
    fb.setupHorizontalHeader(ascent=800, descent=-200)
    fb.setupNameTable({"familyName": "TinyCJK", "styleName": "Regular"})
    fb.setupOS2(sTypoAscender=800, sTypoDescender=-200)
    fb.setupPost()

    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    fb.save(OUT)
    print(f"wrote {OUT} ({os.path.getsize(OUT)} bytes, "
          f"{len(CHARS)} CJK glyphs)")


if __name__ == "__main__":
    main()
