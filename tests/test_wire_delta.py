"""The delta + nibble-varint candidate wire format (ops/pallas_ncc.py:
_encode_delta / decode_delta / delta_capb) and its NccMatcher plumbing.

Bit parity is the product: the wire must be lossless for every candidate
population, the grown byte rung must be overflow-proof by construction, and
a matcher on wire="delta" must emit byte-identical results to wire="pos".
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
                p = np.sort(rng.choice(plane_bits, m, replace=False))
            pos[b, j : j + m] = p.astype(np.int32)
            j += m
            if j >= K:
                break
    return pos, hcnt, nz


@pytest.mark.parametrize("dense_rows", [False, True])
@pytest.mark.parametrize("tight", [False, True])
def test_roundtrip_fuzz(dense_rows, tight):
    rng = np.random.default_rng(7 if dense_rows else 8)
    B, T, K = 3, 6, 128
    plane_bits = 1 << 20
    bound = P.delta_capb_bound(K, plane_bits)
    capb = K // 2 if tight else bound  # tight rung exercises overflow detect
    for _ in range(20):
        pos, hcnt, nz = _random_candidates(rng, B, T, K, plane_bits, dense_rows)
        stream, nnib = P._encode_delta(
            jnp.asarray(pos), jnp.asarray(hcnt), jnp.asarray(nz),
            plane_bits, capb,
        )
        stream, nnib = np.asarray(stream), np.asarray(nnib)
        for b in range(B):
            nv = min(int(nz[b]), K)
            if int(nnib[b]) > 2 * capb:
                assert tight, "the hard-bound rung must never overflow"
                continue
            dec = P.decode_delta(stream[b], int(nnib[b]), hcnt[b], nv)
            np.testing.assert_array_equal(dec, pos[b, :nv])


def test_grown_rung_is_overflow_proof():
    """Worst case: every candidate at the format's widest varint (absolute
    positions near plane_bits for single-hit needles)."""
    K = 64
    plane_bits = 1 << 20
    T = K
    hcnt = np.ones((1, T), np.int32)  # every value is a span start (absolute)
    pos = np.arange(plane_bits - K, plane_bits, dtype=np.int32)[None]
    nz = np.array([K], np.int32)
    capb = P.delta_capb_bound(K, plane_bits)
    stream, nnib = P._encode_delta(
        jnp.asarray(pos), jnp.asarray(hcnt), jnp.asarray(nz), plane_bits, capb
    )
    assert int(np.asarray(nnib)[0]) <= 2 * capb
    dec = P.decode_delta(np.asarray(stream)[0], int(np.asarray(nnib)[0]), hcnt[0], K)
    np.testing.assert_array_equal(dec, pos[0])


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
    capb = P.delta_capb_bound(K, plane_bits)
    stream, nnib = P._encode_delta(
        jnp.asarray(pos), jnp.asarray(hcnt), jnp.asarray(nz), plane_bits, capb
    )
    stream, nnib = np.asarray(stream), np.asarray(nnib)
    for b in range(B):
        nv = min(int(nz[b]), K)
        dec = P.decode_delta(stream[b], int(nnib[b]), hcnt[b], nv)
        np.testing.assert_array_equal(dec, pos[b, :nv])


def test_corrupt_stream_fails_loudly():
    with pytest.raises(ValueError, match="delta stream"):
        # continuation bit set on the final nibble: one value short
        P.decode_delta(np.array([0x88], np.uint8), 2, np.array([2], np.int32), 2)


def test_delta_capb_bound():
    for plane_bits in (1 << 14, 1 << 20, 1 << 24):
        g = P.delta_groups(plane_bits)
        assert 8 ** (g - 1) < plane_bits <= 8**g or g == 1
        for caph in (4096, 8192, 49152):
            assert P.delta_capb_bound(caph, plane_bits) == -(-caph * g // 2)


def test_matcher_wire_parity():
    """delta vs pos wire through the full matcher: identical hits, and the
    delta matcher's stream really is the smaller fetch."""
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


def test_matcher_delta_cap_redo():
    """A tiny start caph must trigger the cap redo on the delta wire and
    still produce pos-wire-identical results."""
    from focr_tpu.fonts.ft import Face
    from focr_tpu.models import ncc as ncc_mod
    from focr_tpu.models.types import NCC_DEFAULT_ALPHABET, RenderOptions

    from focr_tpu.io.synth import synthesize_page
    from focr_tpu.models.types import DecodeOptions

    face = Face("/usr/share/fonts/truetype/dejavu/DejaVuSansMono.ttf")
    ropts = RenderOptions(size=11.0)
    dopts = DecodeOptions(
        x_start=8, y_start=10, line_height=11, line_advance=13, width=150
    )
    alpha = NCC_DEFAULT_ALPHABET[:10]
    page = synthesize_page(
        face, ["ABCDABCDABCDABCD"] * 6, dopts, ropts, alpha, (110, 170)
    )

    def run(wire):
        m = ncc_mod.NccMatcher(
            face, NCC_DEFAULT_ALPHABET[:10], ropts, x_bits=1,
            device_kernel="pallas", wire=wire,
        )
        hits = m.get_hits(page)
        return m, [
            (h.letter, h.x, h.y, np.float32(h.similarity).tobytes())
            for h in hits
        ]

    _, want = run("pos")
    orig = ncc_mod._CAPH_START
    ncc_mod._CAPH_START = 8  # force overflow -> redo path
    try:
        m, got = run("delta")
    finally:
        ncc_mod._CAPH_START = orig
    assert got == want
    assert m._caph, "cap redo should have grown a group's caph"


def test_matcher_delta_byte_redo():
    """A tiny start byte rung must trigger the byte-overflow redo (count cap
    NOT overflowed), grow the remembered rung, and stay bit-identical."""
    from focr_tpu.fonts.ft import Face
    from focr_tpu.io.synth import synthesize_page
    from focr_tpu.models import ncc as ncc_mod
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

    def run(wire):
        m = ncc_mod.NccMatcher(
            face, alpha, ropts, x_bits=1, device_kernel="pallas", wire=wire
        )
        hits = m.get_hits(page)
        return m, [
            (h.letter, h.x, h.y, np.float32(h.similarity).tobytes())
            for h in hits
        ]

    _, want = run("pos")
    orig = ncc_mod._CAPB_START
    ncc_mod._CAPB_START = 2  # 4 nibbles total: guaranteed byte overflow
    try:
        m, got = run("delta")
    finally:
        ncc_mod._CAPB_START = orig
    assert got == want
    assert m._capb and all(v > 2 for v in m._capb.values()), (
        "byte redo should have grown a stream rung"
    )
