"""The fixed-width u16 delta candidate wire (ops/pallas_ncc.py:
_encode_delta / decode_delta) and its NccMatcher plumbing.

Bit parity is the product: the wire must be lossless for every candidate
population (escapes carry any delta the u16 cannot), overflow of either
buffer must be exactly detectable (redo-able), and a matcher on
wire="delta" must emit byte-identical results to wire="pos".
"""

import numpy as np
import pytest
import jax.numpy as jnp

from focr_tpu.ops import pallas_ncc as P


def _random_candidates(rng, B, T, K, plane_bits, dense_rows=False):
    """Synthesize (pos, hcnt, nz) in the compaction's contract: per-needle
    ascending positions, concatenated in needle order, 0-padded."""
    hcnt = rng.integers(0, K // max(T // 2, 1), (B, T)).astype(np.int32)
    nz = hcnt.sum(axis=1).astype(np.int32)
    pos = np.zeros((B, K), np.int32)
    for b in range(B):
        j = 0
        for t in range(T):
            m = min(int(hcnt[b, t]), K - j)
            if dense_rows:
                # clustered like text hits: short ascending runs
                start = int(rng.integers(0, max(plane_bits - 4 * K, 1)))
                p = start + np.cumsum(rng.integers(1, 9, m))
            else:
                # sparse random: most deltas and every span start escape
                p = np.sort(rng.choice(plane_bits, m, replace=False))
            pos[b, j : j + m] = p.astype(np.int32)
            j += m
            if j >= K:
                break
    return pos, hcnt, nz


def _encode(pos, hcnt, nz, capw, kesc):
    d16, esc = P._encode_delta(
        jnp.asarray(pos), jnp.asarray(hcnt), jnp.asarray(nz), capw, kesc
    )
    return np.asarray(d16), np.asarray(esc)


@pytest.mark.parametrize("dense_rows", [False, True])
def test_roundtrip_fuzz(dense_rows):
    rng = np.random.default_rng(7 if dense_rows else 8)
    B, T, K = 3, 6, 128
    plane_bits = 1 << 20
    for _ in range(20):
        pos, hcnt, nz = _random_candidates(rng, B, T, K, plane_bits, dense_rows)
        d16, esc = _encode(pos, hcnt, nz, K, K)  # ample rungs: no overflow
        for b in range(B):
            nv = min(int(nz[b]), K)
            dec = P.decode_delta(d16[b], esc[b], hcnt[b], nv)
            np.testing.assert_array_equal(dec, pos[b, :nv])


def test_escape_boundaries():
    """Deltas of exactly 0xFFFE (inline max), 0xFFFF and huge (escaped)."""
    hcnt = np.array([[4]], np.int32)
    pos = np.cumsum([7, 0xFFFE, 0xFFFF, 1 << 19]).astype(np.int32)[None]
    nz = np.array([4], np.int32)
    d16, esc = _encode(pos, hcnt, nz, 8, 8)
    assert int(esc[0, 0]) == 2  # 0xFFFF and the huge delta escape
    dec = P.decode_delta(d16[0], esc[0], hcnt[0], 4)
    np.testing.assert_array_equal(dec, pos[0])


def test_overflows_detectable_and_decode_fails_loudly():
    rng = np.random.default_rng(3)
    B, T, K = 1, 4, 64
    plane_bits = 1 << 20
    pos, hcnt, nz = _random_candidates(rng, B, T, K, plane_bits)
    nv = min(int(nz[0]), K)
    if nv < 8:  # keep the fixture meaningful
        pytest.skip("degenerate draw")
    # capw truncation: exact detection from nz vs buffer size
    d16, esc = _encode(pos, hcnt, nz, 4, K)
    assert nv > d16.shape[1]
    with pytest.raises(ValueError, match="truncated"):
        P.decode_delta(d16[0], esc[0], hcnt[0], nv)
    # escape truncation: exact count survives in slot 0
    d16, esc = _encode(pos, hcnt, nz, K, 1)
    true_esc = int(_encode(pos, hcnt, nz, K, K)[1][0, 0])
    assert int(esc[0, 0]) == true_esc
    if true_esc > 1:
        with pytest.raises(ValueError, match="escape|truncated"):
            P.decode_delta(d16[0], esc[0], hcnt[0], nv)


def test_cap_overflow_truncation_decodes_valid_prefix():
    """nz > caph: the stream carries exactly the first caph candidates and
    decodes them; spans clip the same way the pos wire's hcnt contract does."""
    rng = np.random.default_rng(3)
    B, T, K = 2, 4, 32
    plane_bits = 1 << 16
    # counts total > K: the compaction fills the WHOLE buffer with the first
    # K candidates (suffix truncation is its only loss mode)
    hcnt = rng.integers(8, 20, (B, T)).astype(np.int32)
    nz = hcnt.sum(axis=1).astype(np.int32)
    assert (nz > K).all()
    pos = np.zeros((B, K), np.int32)
    for b in range(B):
        j = 0
        for t in range(T):
            m = min(int(hcnt[b, t]), K - j)
            p = np.sort(rng.choice(plane_bits, m, replace=False))
            pos[b, j : j + m] = p.astype(np.int32)
            j += m
            if j >= K:
                break
    d16, esc = _encode(pos, hcnt, nz, K, K)
    for b in range(B):
        nv = min(int(nz[b]), K)
        dec = P.decode_delta(d16[b], esc[b], hcnt[b], nv)
        np.testing.assert_array_equal(dec, pos[b, :nv])


def test_matcher_wire_parity():
    """delta vs pos wire through the full matcher: identical hits."""
    from focr_tpu.fonts.ft import Face
    from focr_tpu.models.ncc import NccMatcher
    from focr_tpu.models.types import NCC_DEFAULT_ALPHABET, RenderOptions

    face = Face("/usr/share/fonts/truetype/dejavu/DejaVuSansMono.ttf")
    ropts = RenderOptions(size=11.0)
    rng = np.random.default_rng(5)
    page = np.full((90, 130), 255, np.uint8)
    for _ in range(14):
        y, x = rng.integers(0, 80), rng.integers(0, 118)
        page[y : y + 9, x : x + 7] = rng.integers(0, 120, (9, 7))

    outs = {}
    for wire in ("pos", "delta"):
        m = NccMatcher(
            face, NCC_DEFAULT_ALPHABET[:10], ropts, x_bits=1,
            device_kernel="pallas", wire=wire,
        )
        hits = m.get_hits(page)
        outs[wire] = [
            (h.letter, h.x, h.y, np.float32(h.similarity).tobytes())
            for h in hits
        ]
    assert outs["pos"] == outs["delta"]


def _text_page_and_alpha():
    from focr_tpu.fonts.ft import Face
    from focr_tpu.io.synth import synthesize_page
    from focr_tpu.models.types import (
        DecodeOptions, NCC_DEFAULT_ALPHABET, RenderOptions,
    )

    face = Face("/usr/share/fonts/truetype/dejavu/DejaVuSansMono.ttf")
    ropts = RenderOptions(size=11.0)
    dopts = DecodeOptions(
        x_start=8, y_start=10, line_height=11, line_advance=13, width=150
    )
    alpha = NCC_DEFAULT_ALPHABET[:10]
    page = synthesize_page(
        face, ["ABCDABCDABCDABCD"] * 6, dopts, ropts, alpha, (110, 170)
    )
    return face, ropts, alpha, page


def _run_matcher(face, ropts, alpha, page, wire):
    from focr_tpu.models import ncc as ncc_mod

    m = ncc_mod.NccMatcher(
        face, alpha, ropts, x_bits=1, device_kernel="pallas", wire=wire
    )
    hits = m.get_hits(page)
    return m, [
        (h.letter, h.x, h.y, np.float32(h.similarity).tobytes())
        for h in hits
    ]


def test_matcher_delta_cap_redo():
    """A tiny start caph must trigger the cap redo on the delta wire and
    still produce pos-wire-identical results."""
    from focr_tpu.models import ncc as ncc_mod

    face, ropts, alpha, page = _text_page_and_alpha()
    _, want = _run_matcher(face, ropts, alpha, page, "pos")
    orig = ncc_mod._CAPH_START
    ncc_mod._CAPH_START = 8  # force overflow -> redo path
    try:
        m, got = _run_matcher(face, ropts, alpha, page, "delta")
    finally:
        ncc_mod._CAPH_START = orig
    assert got == want
    assert m._caph, "cap redo should have grown a group's caph"


def test_matcher_delta_stream_redo():
    """A tiny start capw must trigger the stream-overflow redo (count cap
    NOT overflowed), grow the remembered rung, and stay bit-identical."""
    from focr_tpu.models import ncc as ncc_mod

    face, ropts, alpha, page = _text_page_and_alpha()
    _, want = _run_matcher(face, ropts, alpha, page, "pos")
    orig = ncc_mod._CAPW_START
    ncc_mod._CAPW_START = 2  # guaranteed stream truncation
    try:
        m, got = _run_matcher(face, ropts, alpha, page, "delta")
    finally:
        ncc_mod._CAPW_START = orig
    assert got == want
    assert m._capw and all(v > 2 for v in m._capw.values()), (
        "stream redo should have grown a rung"
    )
