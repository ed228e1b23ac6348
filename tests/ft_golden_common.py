"""Shared matrix + render protocol for the FreeType golden fixtures.

The reference renders glyphs through font-kit's freetype loader
(main.rs:40-85, ncc.rs:143-196); our fonts/ft.py replicates those semantics
with a direct ctypes FreeType binding. All engine parity tests check engines
against each other and the oracle — which would miss a SHARED semantic drift
in the font layer itself (VERDICT r1 "What's weak" #3). These fixtures freeze
the font layer's observable behavior (bounds, advances, bitmaps) across
formats (TTF + CFF/OTF), families (mono/sans/serif/bold), sizes, hinting
modes, and fractional offsets, so any drift in rounding, load flags, or
rasterization shows up as a byte diff against the checked-in goldens.
"""

from __future__ import annotations

import os

import numpy as np

from focr_tpu.fonts.ft import Canvas, Face, HintingOptions

FONTS = {
    "mono": "/usr/share/fonts/truetype/dejavu/DejaVuSansMono.ttf",
    "sans": "/usr/share/fonts/truetype/dejavu/DejaVuSans.ttf",
    "serif": "/usr/share/fonts/truetype/dejavu/DejaVuSerif.ttf",
    "serif-bold": "/usr/share/fonts/truetype/dejavu/DejaVuSerif-Bold.ttf",
    # CFF outlines exercise FreeType's second rasterizer path (the reference's
    # canonical font, Courier New.otf, is CFF — README.md:16)
    "cff-mono": "/opt/venv/lib/python3.12/site-packages/pygame/tests/fixtures/fonts/PyGameMono.otf",
}
SIZES = (8.0, 13.0, 20.0)
HINTINGS = ("none", "full")
OFFSETS = ((0.0, 0.0), (0.25, 0.5), (0.875, 0.125))
CHARS = "AQgj0=/."
MARGIN = 2  # golden canvases pad raster_bounds by this (hinted ink may spill)


def hinting_opts(kind: str, size: float) -> HintingOptions:
    return HintingOptions(full=True, size=size) if kind == "full" else HintingOptions()


def iter_matrix():
    for font_key, path in FONTS.items():
        for size in SIZES:
            for hint in HINTINGS:
                for off in OFFSETS:
                    for ch in CHARS:
                        yield font_key, path, size, hint, off, ch


def entry_key(font_key, size, hint, off, ch) -> str:
    return f"{font_key}|{size}|{hint}|{off[0]},{off[1]}|{ch}"


def render_entry(face: Face, size: float, hint: str, off, ch):
    """One golden observation: gid, advance, typographic + raster bounds, and
    the glyph bitmap rendered with its raster_bounds origin (the reference's
    canvas placement, main.rs:73-83) on a MARGIN-padded canvas."""
    h = hinting_opts(hint, size)
    gid = face.glyph_for_char(ch)
    adv = face.advance(gid)
    tb = face.typographic_bounds(gid)
    rb = face.raster_bounds(gid, size, off, h)
    w, hh = max(rb.width, 0), max(rb.height, 0)
    canvas = Canvas(w + 2 * MARGIN, hh + 2 * MARGIN)
    face.rasterize_glyph(
        canvas, gid, size, (MARGIN - rb.x0 + off[0], MARGIN - rb.y0 + off[1]), h
    )
    return {
        "gid": np.int32(gid),
        "advance": np.float64(adv),
        "typo": np.array([tb.x0, tb.y0, tb.x1, tb.y1], dtype=np.float64),
        "bounds": np.array([rb.x0, rb.y0, rb.x1, rb.y1], dtype=np.int32),
        "bitmap": canvas.pixels.copy(),
    }


def available_fonts() -> dict[str, str]:
    return {k: p for k, p in FONTS.items() if os.path.exists(p)}
