"""Coverage for the less-common reference configurations: BoxSize.FONT,
--save-letters dumps, kerning scaling (-k), and full hinting — each checked
against the oracle (device results must stay bit-identical under every
config, not just the defaults)."""

import numpy as np
import pytest

from focr_tpu.models.types import BoxSize, DecodeOptions, RenderOptions
from focr_tpu.fonts.ft import Face, HintingOptions


def test_font_box_matcher_matches_oracle(mono_font_path):
    from focr_tpu.io.synth import synthesize_page
    from focr_tpu.models.ncc import NccMatcher

    face = Face(mono_font_path)
    ropts = RenderOptions(size=11.0)
    dopts = DecodeOptions(x_start=5, y_start=8, line_height=16, line_advance=20, width=110)
    page = synthesize_page(face, ["AB01"], dopts, ropts, "AB01", (70, 128))
    m = NccMatcher(face, "AB01", ropts, box_size=BoxSize.FONT, threshold=0.6)
    hd = m.get_hits(page)
    ho = m.get_hits_oracle(page)
    assert len(hd) > 0
    key = lambda hs: [(h.letter, h.x, h.y, h.w, h.h, np.float32(h.similarity).tobytes()) for h in hs]
    assert key(hd) == key(ho)


def test_save_letters_dumps(mono_font_path, tmp_path, monkeypatch):
    from focr_tpu.cli.ncc import main
    from focr_tpu.io.synth import synthesize_page
    from focr_tpu.models.types import FOCR_DEFAULT_ALPHABET
    from PIL import Image

    face = Face(mono_font_path)
    ropts = RenderOptions(size=11.0)
    dopts = DecodeOptions(x_start=5, y_start=6, line_height=13, line_advance=15, width=110)
    page = synthesize_page(face, ["AB"], dopts, ropts, FOCR_DEFAULT_ALPHABET, (64, 128))
    p = tmp_path / "p.png"
    Image.fromarray(page).save(p)
    monkeypatch.chdir(tmp_path)  # letters/ is written relative to cwd (ncc.rs:642-649)
    rc = main(["-i", str(p), "-f", mono_font_path, "-t", "11", "-a", "AB",
               "--x-bits", "1", "--save-letters"])
    assert rc == 0
    dumps = sorted(f.name for f in (tmp_path / "letters").iterdir())
    # one PNG per (letter, offset): 2 letters x 2 offsets
    assert len(dumps) == 4
    assert any(d.startswith("A-0_0") for d in dumps)
    assert any(d.startswith("A-500_0") for d in dumps)


@pytest.mark.parametrize("kern", [0.9, 1.5])
def test_kerning_matches_oracle(mono_font_path, kern):
    from focr_tpu.io.synth import synthesize_page
    from focr_tpu.models.focr import GridDecoder
    from focr_tpu.oracle.focr_oracle import decode_image

    face = Face(mono_font_path)
    ropts = RenderOptions(size=11.0, kern_x=kern)
    dopts = DecodeOptions(x_start=4, y_start=5, line_height=13, line_advance=15, width=120)
    page = synthesize_page(face, ["AB01ab"], dopts, ropts, "AB01ab", (60, 140))
    dec = GridDecoder(face, "AB01ab", dopts, ropts, (60, 140))
    got = dec.decode_batch(page[None])[0]
    want = decode_image(page, face, "AB01ab", dopts, ropts)
    assert [(l.text, l.y) for l in got] == [(l.text, l.y) for l in want]


def test_full_hinting_matches_oracle(mono_font_path):
    from focr_tpu.io.synth import synthesize_page
    from focr_tpu.models.focr import GridDecoder
    from focr_tpu.oracle.focr_oracle import decode_image

    face = Face(mono_font_path)
    ropts = RenderOptions(size=11.0, hinting=HintingOptions(full=True, size=11.0))
    dopts = DecodeOptions(x_start=4, y_start=5, line_height=13, line_advance=15, width=120)
    page = synthesize_page(face, ["AB01ab"], dopts, ropts, "AB01ab", (60, 140))
    dec = GridDecoder(face, "AB01ab", dopts, ropts, (60, 140))
    got = dec.decode_batch(page[None])[0]
    want = decode_image(page, face, "AB01ab", dopts, ropts)
    assert got and [(l.text, l.y) for l in got] == [(l.text, l.y) for l in want]


def test_full_hinting_prop_matches_oracle(sans_font_path):
    from focr_tpu.io.synth import synthesize_page
    from focr_tpu.models.focr import GridDecoder
    from focr_tpu.oracle.focr_oracle import decode_image

    face = Face(sans_font_path)
    alpha = "AWim01"
    ropts = RenderOptions(size=12.0, hinting=HintingOptions(full=True, size=12.0))
    dopts = DecodeOptions(x_start=4, y_start=5, line_height=16, line_advance=19, width=110)
    page = synthesize_page(face, ["WAim01"], dopts, ropts, alpha, (45, 130))
    dec = GridDecoder(face, alpha, dopts, ropts, (45, 130))
    assert dec.prop_groups
    got = dec.decode_batch(page[None])[0]
    want = decode_image(page, face, alpha, dopts, ropts)
    assert [(l.text, l.y) for l in got] == [(l.text, l.y) for l in want]
