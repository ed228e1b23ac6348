"""Pallas NCC kernel tests (interpret mode on CPU).

The kernel's packed-bitmask candidate set must match the XLA path's candidate
set exactly, and the full NccMatcher pipeline through the Pallas path must be
hit-for-hit identical to the oracle (SURVEY.md §4 differential-oracle model).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from focr_tpu.models.types import DecodeOptions, RenderOptions
from focr_tpu.ops import ncc as ncc_ops
from focr_tpu.ops import pallas_ncc


def _unpack(lo, hi, hcnt, nzh, WW, t):
    """Candidates of needle t from the packed local-position wire buffers:
    needle t owns entries [Σ_{<t} hcnt, …+hcnt[t]), clipped to the valid
    prefix min(nzh, caph); each entry is y*W1 + x with W1 = WW*32."""
    W1 = WW * 32
    nv = min(int(nzh), len(lo))
    pos = pallas_ncc.unpack_pos(lo, hi, nv)
    ends = np.cumsum(hcnt.astype(np.int64))
    s = int(min(ends[t] - hcnt[t], nv))
    e = int(min(ends[t], nv))
    return [(int(p) // W1, int(p) % W1) for p in pos[s:e]]


@pytest.mark.parametrize("plane_bits", [1 << 18, 1 << 22, 1 << 26])
def test_pos_pack_roundtrip(plane_bits):
    """_pack_pos/unpack_pos are lossless for every wire format tier (nibble-
    packed hi, u8 hi, u16 hi) across the full position range of the tier."""
    rng = np.random.default_rng(plane_bits)
    K = 512
    pos = np.sort(rng.integers(0, plane_bits, K)).astype(np.int32)
    lo, hi = jax.device_get(pallas_ncc._pack_pos(jnp.asarray(pos), plane_bits))
    assert lo.dtype == np.uint16
    for nv in (0, 1, K - 1, K):
        np.testing.assert_array_equal(
            pallas_ncc.unpack_pos(lo, hi, nv), pos[:nv]
        )
    if plane_bits <= 1 << 20:
        assert hi.shape[-1] == K // 2 and hi.dtype == np.uint8
    elif plane_bits <= 1 << 24:
        assert hi.shape[-1] == K and hi.dtype == np.uint8
    else:
        assert hi.dtype == np.uint16


@pytest.mark.parametrize("seed,nh,nw", [(0, 7, 6), (1, 9, 13), (2, 4, 16), (3, 12, 8)])
def test_pallas_mask_matches_xla_candidates(seed, nh, nw):
    rng = np.random.default_rng(seed)
    H, W, T = 72, 101, 6
    img = rng.integers(0, 40, (H, W), dtype=np.uint8)
    needles = rng.integers(0, 255, (T, nh, nw), dtype=np.uint8)
    for t, (x, y) in enumerate([(5, 9), (40, 30), (70, 50)]):
        img[y : y + nh, x : x + nw] = needles[t % T]
    s_n = needles.reshape(T, -1).astype(np.int64).sum(1)
    s2 = (needles.reshape(T, -1).astype(np.int64) ** 2).sum(1)
    thr = jnp.asarray(np.float32(0.8))
    assert pallas_ncc.pallas_supported(H, W, nw, nh, 0.8)

    lo, hi, hcnt, nzh = jax.device_get(
        pallas_ncc.ncc_candidates_pallas(
            jnp.asarray(img), jnp.asarray(needles), jnp.asarray(s_n),
            jnp.asarray(s2), thr, nw=nw, nh=nh, caph=512, interpret=True,
        )
    )
    idx, acc, sp, s2p, cnt = jax.device_get(
        ncc_ops.ncc_candidates(
            jnp.asarray(img), jnp.asarray(needles), jnp.asarray(s_n),
            jnp.asarray(s2), thr, nw=nw, nh=nh, cap=512,
        )
    )
    WW = pallas_ncc.word_stride(W, nw)
    W2 = W - nw
    assert nzh[0] <= len(lo), "cap overflow would invalidate the comparison"
    assert nzh[0] == hcnt.sum()
    for t in range(T):
        cand = _unpack(lo, hi, hcnt, nzh[0], WW, t)
        xla = [(1 + int(li) // W2, 1 + int(li) % W2) for li in idx[t] if li >= 0]
        # both are ε-supersets of the true accept set, exact-replayed on the
        # host; the Pallas kernel's f32 slack makes it the (slightly) wider
        # one — it must contain every XLA candidate, in the same scan order
        assert set(xla) <= set(cand), f"needle {t}: pallas dropped candidates"
        both = [c for c in cand if c in set(xla)]
        assert both == xla, f"needle {t}: scan order differs"
        assert len(cand) >= cnt[t]


def test_pallas_matcher_matches_oracle(mono_font_path):
    from focr_tpu.fonts.ft import Face
    from focr_tpu.io.synth import synthesize_page
    from focr_tpu.models.ncc import NccMatcher

    face = Face(mono_font_path)
    ropts = RenderOptions(size=11.0)
    dopts = DecodeOptions(x_start=5, y_start=6, line_height=13, line_advance=15, width=110)
    page = synthesize_page(face, ["AB01ab", "10BAba"], dopts, ropts, "AB01ab", (64, 128))
    m = NccMatcher(face, "AB01ab", ropts, x_bits=1, threshold=0.8, device_kernel="pallas")
    hp = m.get_hits(page)
    ho = m.get_hits_oracle(page)
    assert len(hp) > 0
    assert [
        (h.letter, h.x, h.y, h.w, h.h, np.float32(h.similarity).tobytes()) for h in hp
    ] == [
        (h.letter, h.x, h.y, h.w, h.h, np.float32(h.similarity).tobytes()) for h in ho
    ]


def test_pallas_batch_matches_single_pages():
    """The batched-page kernel must return, per page, exactly the buffers
    the single-page call returns (same kernel body, page axis = outermost
    grid dim) — including the zero-candidate pad page semantics."""
    rng = np.random.default_rng(5)
    H, W, T, nh, nw = 64, 96, 5, 8, 9
    imgs = rng.integers(0, 50, (3, H, W), dtype=np.uint8)
    needles = rng.integers(0, 255, (T, nh, nw), dtype=np.uint8)
    for b in range(3):  # plant per-page distinct matches
        for t, (x, y) in enumerate([(4 + 7 * b, 8), (30, 20 + 5 * b)]):
            imgs[b, y : y + nh, x : x + nw] = needles[(t + b) % T]
    imgs[2] = 0  # inverted-white page: the wave-padding case, zero candidates
    s_n = needles.reshape(T, -1).astype(np.int64).sum(1)
    s2 = (needles.reshape(T, -1).astype(np.int64) ** 2).sum(1)
    thr = jnp.asarray(np.float32(0.8))

    blo, bhi, bc, bz = jax.device_get(
        pallas_ncc.ncc_candidates_pallas_batch(
            jnp.asarray(imgs), jnp.asarray(needles), jnp.asarray(s_n),
            jnp.asarray(s2), thr, nw=nw, nh=nh, caph=512, interpret=True,
        )
    )
    for b in range(3):
        slo, shi, sc, sz = jax.device_get(
            pallas_ncc.ncc_candidates_pallas(
                jnp.asarray(imgs[b]), jnp.asarray(needles), jnp.asarray(s_n),
                jnp.asarray(s2), thr, nw=nw, nh=nh, caph=512, interpret=True,
            )
        )
        np.testing.assert_array_equal(blo[b], slo)
        np.testing.assert_array_equal(bhi[b], shi)
        np.testing.assert_array_equal(bc[b], sc)
        assert bz[b] == sz[0]
    assert bz[2] == 0 and bc[2].sum() == 0  # white page: no candidates


def test_get_hits_many_wave_parity_mixed_shapes(mono_font_path):
    """The batched-wave pipeline (shape buckets + pow2 page padding + one
    fetch) must be hit-for-hit identical to per-page get_hits, across mixed
    page shapes and a wave smaller than the corpus."""
    import os

    from focr_tpu.fonts.ft import Face
    from focr_tpu.io.synth import synthesize_page
    from focr_tpu.models.ncc import NccMatcher
    from focr_tpu.models.types import DecodeOptions, RenderOptions

    face = Face(mono_font_path)
    ropts = RenderOptions(size=11.0)
    dopts = DecodeOptions(x_start=5, y_start=6, line_height=13, line_advance=15, width=110)
    texts = [["AB01ab"], ["10BAba"], ["baAB10"], ["A0b1Ba"], ["bbAA11"]]
    shapes = [(64, 128), (64, 128), (48, 112), (64, 128), (48, 112)]
    pages = [
        synthesize_page(face, t, dopts, ropts, "AB01ab", s)
        for t, s in zip(texts, shapes)
    ]
    m = NccMatcher(face, "AB01ab", ropts, x_bits=1, threshold=0.8, device_kernel="pallas")
    key = lambda hs: [
        (h.letter, h.x, h.y, h.w, h.h, np.float32(h.similarity).tobytes()) for h in hs
    ]
    os.environ["FOCR_NCC_WAVE"] = "3"  # force multiple waves + odd bucket sizes
    try:
        many = m.get_hits_many(pages)
    finally:
        del os.environ["FOCR_NCC_WAVE"]
    singles = [m.get_hits(p) for p in pages]
    assert any(len(h) > 0 for h in singles)
    assert [key(h) for h in many] == [key(h) for h in singles]


def test_pallas_banded_mask_matches_xla_candidates():
    """The banded kernel (_kernel_rows) must produce the same ε-superset
    mask semantics as the XLA path on a tall-ish page: candidates must
    contain every XLA candidate in scan order."""
    rng = np.random.default_rng(9)
    H, W, T, nh, nw = 200, 103, 6, 9, 13
    assert pallas_ncc.pallas_mode(H, W, nw, nh) == "rows"

    img = rng.integers(0, 40, (H, W), dtype=np.uint8)
    needles = rng.integers(0, 255, (T, nh, nw), dtype=np.uint8)
    for t, (x, y) in enumerate([(5, 9), (40, 30), (70, 50), (22, 61)]):
        img[y : y + nh, x : x + nw] = needles[t % T]
    s_n = needles.reshape(T, -1).astype(np.int64).sum(1)
    s2 = (needles.reshape(T, -1).astype(np.int64) ** 2).sum(1)
    thr = jnp.asarray(np.float32(0.8))
    lo, hi, hcnt, nzh = jax.device_get(
        pallas_ncc.ncc_candidates_pallas(
            jnp.asarray(img), jnp.asarray(needles), jnp.asarray(s_n),
            jnp.asarray(s2), thr, nw=nw, nh=nh, caph=512, interpret=True,
        )
    )
    idx, acc, sp, s2p, cnt = jax.device_get(
        ncc_ops.ncc_candidates(
            jnp.asarray(img), jnp.asarray(needles), jnp.asarray(s_n),
            jnp.asarray(s2), thr, nw=nw, nh=nh, cap=512,
        )
    )
    WW = pallas_ncc.word_stride(W, nw)
    W2 = W - nw
    assert nzh[0] <= len(lo)
    assert nzh[0] == hcnt.sum()
    found_any = 0
    for t in range(T):
        cand = _unpack(lo, hi, hcnt, nzh[0], WW, t)
        xla = [(1 + int(li) // W2, 1 + int(li) % W2) for li in idx[t] if li >= 0]
        found_any += len(xla)
        assert set(xla) <= set(cand), f"needle {t}: tiled kernel dropped candidates"
        both = [c for c in cand if c in set(xla)]
        assert both == xla, f"needle {t}: scan order differs"
        assert len(cand) >= cnt[t]
    assert found_any > 0


def test_pallas_banded_matcher_matches_oracle(mono_font_path):
    """Full matcher pipeline through the banded kernel on a fresh tall-ish
    page shape: bit-identical to the oracle."""
    from focr_tpu.fonts.ft import Face
    from focr_tpu.io.synth import synthesize_page
    from focr_tpu.models.ncc import NccMatcher

    face = Face(mono_font_path)
    ropts = RenderOptions(size=11.0)
    dopts = DecodeOptions(x_start=5, y_start=6, line_height=13, line_advance=15, width=110)
    H, W = 210, 131
    page = synthesize_page(face, ["AB01ab", "10BAba"], dopts, ropts, "AB01ab", (H, W))
    m = NccMatcher(face, "AB01ab", ropts, x_bits=1, threshold=0.8, device_kernel="pallas")
    for g in m.groups:
        assert pallas_ncc.pallas_mode(H, W, g.nw, g.nh) == "rows"
    hp = m.get_hits(page)
    ho = m.get_hits_oracle(page)
    assert len(hp) > 0
    key = lambda hs: [
        (h.letter, h.x, h.y, h.w, h.h, np.float32(h.similarity).tobytes()) for h in hs
    ]
    assert key(hp) == key(ho)


def test_pallas_very_tall_page_matches_oracle(mono_font_path):
    """Pages beyond the old ~4100-row ceiling (H·nw·65025 >= 2^31, where the
    retired i32-cumsum window_stats gate kicked in) now stream through the
    banded Pallas kernel — the MXU window_stats path has no height-dependent
    bound. Differential vs the oracle, with corner ink pinning the crop to
    the full page height so the tall path is genuinely exercised."""
    from focr_tpu.fonts.ft import Face
    from focr_tpu.io.synth import synthesize_page
    from focr_tpu.models.ncc import NccMatcher

    face = Face(mono_font_path)
    ropts = RenderOptions(size=13.0)
    dopts = DecodeOptions(x_start=4, y_start=8, line_height=12, line_advance=15, width=80)
    H, W = 4200, 90
    page = synthesize_page(face, ["AX+", "+XA"], dopts, ropts, "AX+", (H, W)).copy()
    page[1, 1] = 0
    page[H - 2, W - 2] = 0  # ink at both ends: the crop spans the full height
    m = NccMatcher(face, "AX+", ropts, x_bits=0, threshold=0.8, device_kernel="pallas")
    tall_gated = False
    for g in m.groups:
        assert pallas_ncc.pallas_mode(H, W, g.nw, g.nh) == "rows"
        tall_gated |= H * g.nw * 65025 >= 2**31
    assert tall_gated  # at least one group crosses the retired gate's bound
    hp = m.get_hits(page)
    ho = m.get_hits_oracle(page)
    assert len(hp) > 0
    key = lambda hs: [
        (h.letter, h.x, h.y, h.w, h.h, np.float32(h.similarity).tobytes()) for h in hs
    ]
    assert key(hp) == key(ho)


def test_ink_bbox_crop_parity(mono_font_path):
    """Pages with ink confined to a small interior region sweep only the
    ink-bbox crop on device (uploading ~an order of magnitude fewer bytes),
    and the remapped full-page hits stay bit-identical to the oracle."""
    from focr_tpu.fonts.ft import Face
    from focr_tpu.io.synth import synthesize_page
    from focr_tpu.models.ncc import NccMatcher
    from focr_tpu.models.types import DecodeOptions, RenderOptions

    face = Face(mono_font_path)
    ropts = RenderOptions(size=11.0)
    # text block sits deep inside a much larger page
    dopts = DecodeOptions(x_start=200, y_start=300, line_height=13,
                          line_advance=15, width=110)
    H, W = 640, 512
    page = synthesize_page(face, ["AB01ab", "10BAba"], dopts, ropts, "AB01ab", (H, W))
    m = NccMatcher(face, "AB01ab", ropts, x_bits=1, threshold=0.8,
                   device_kernel="pallas")

    # the dispatch must actually crop: the bucket records the crop rect
    wave = m._dispatch_wave([page])
    _, buckets, _, _ = wave
    (idxs, inv_all, plans, crop) = buckets[0]
    y0, x0, Hc, Wc = crop
    assert (Hc, Wc) != (H, W) and Hc < H // 2 and Wc < W // 2
    assert y0 > 0 and x0 > 0
    hp = [
        m._collect_page(d, False, False, None) for d in m._fetch_wave(wave)
    ][0]
    ho = m.get_hits_oracle(page)
    assert len(hp) > 0
    key = lambda hs: [
        (h.letter, h.x, h.y, h.w, h.h, np.float32(h.similarity).tobytes()) for h in hs
    ]
    assert key(hp) == key(ho)
    # edge-touching ink must disable the crop margins (x0 == y0 == 0) and
    # still match the oracle, covering the reference's own x=0/y=0 exclusion
    dopts2 = DecodeOptions(x_start=1, y_start=1, line_height=13,
                           line_advance=15, width=110)
    page2 = synthesize_page(face, ["AB01ab"], dopts2, ropts, "AB01ab", (128, 192))
    hp2 = m.get_hits(page2)
    ho2 = m.get_hits_oracle(page2)
    assert len(hp2) > 0 and key(hp2) == key(ho2)


def test_ink_bbox_crop_caph_redo_parity(mono_font_path, monkeypatch):
    """A candidate-cap overflow on a CROPPED sweep re-dispatches the same
    crop (positions must decode with the crop's row stride, then remap) —
    results bit-identical to the oracle."""
    import focr_tpu.models.ncc as ncc_mod
    from focr_tpu.fonts.ft import Face
    from focr_tpu.io.synth import synthesize_page
    from focr_tpu.models.ncc import NccMatcher
    from focr_tpu.models.types import DecodeOptions, RenderOptions

    monkeypatch.setattr(ncc_mod, "_CAPH_START", 2)  # overflow immediately
    face = Face(mono_font_path)
    ropts = RenderOptions(size=11.0)
    dopts = DecodeOptions(x_start=180, y_start=260, line_height=13,
                          line_advance=15, width=110)
    page = synthesize_page(face, ["ABABAB", "ababab"], dopts, ropts, "ABab",
                           (560, 448))
    m = NccMatcher(face, "ABab", ropts, threshold=0.5, device_kernel="pallas")
    _, buckets, _, _ = m._dispatch_wave([page])
    y0, x0, Hc, Wc = buckets[0][3]
    assert y0 > 0 and x0 > 0 and (Hc, Wc) != page.shape  # crop engaged
    hp = m.get_hits(page)
    ho = m.get_hits_oracle(page)
    assert m._caph, "cap never grew: the redo path was not exercised"
    key = lambda hs: [(h.letter, h.x, h.y, np.float32(h.similarity).tobytes()) for h in hs]
    assert len(hp) > 0 and key(hp) == key(ho)


def test_blank_pages_skip_device(mono_font_path):
    """An all-white page (or wave) produces zero hits without any device
    sweep — the bucket is marked empty at dispatch (Σp == 0 everywhere, so
    the reference also emits nothing)."""
    from focr_tpu.fonts.ft import Face
    from focr_tpu.models.ncc import NccMatcher
    from focr_tpu.models.types import RenderOptions

    face = Face(mono_font_path)
    m = NccMatcher(face, "AB", RenderOptions(size=11.0), device_kernel="pallas")
    blank = np.full((96, 128), 255, np.uint8)
    wave = m._dispatch_wave([blank, blank])
    _, buckets, _, _ = wave
    assert all(k == "empty" for _, k, _, _ in buckets[0][2])
    assert m.get_hits(blank) == []
    assert m.get_hits_many([blank, blank]) == [[], []]
    assert m.get_hits_oracle(blank) == []


def test_pallas_mode_selection():
    """Residency policy: the banded kernel streams any page height through
    VMEM (VERDICT r2 #4's 2500x2000 acceptance bar included); wide needles
    and ultra-wide pages still fall back to XLA."""
    assert pallas_ncc.pallas_mode(792, 662, 9, 13) == "rows"
    assert pallas_ncc.pallas_mode(2500, 2000, 9, 13) == "rows"
    assert pallas_ncc.pallas_supported(2500, 2000, 9, 13, 0.8)
    assert pallas_ncc.pallas_mode(2500, 2000, 17, 13) is None  # needle too wide
    assert pallas_ncc.pallas_mode(100, 100_000, 9, 13) is None  # gmat quadratic
    assert pallas_ncc.pallas_supported(4000, 2000, 8, 5, 0.8)  # tall: streams
    # no height ceiling: the MXU window_stats path never forms H-length
    # cumsums, so very tall pages stream through the banded kernel too
    assert pallas_ncc.pallas_mode(8000, 2000, 8, 5) == "rows"


def test_pallas_unsupported_configs():
    assert not pallas_ncc.pallas_supported(10, 100, 8, 5, 0.8)  # too few rows
    assert not pallas_ncc.pallas_supported(100, 100, 17, 5, 0.8)  # needle too wide
    assert not pallas_ncc.pallas_supported(100, 100, 8, 5, 0.0)  # thr - eps <= 0
    assert not pallas_ncc.pallas_supported(8000, 8000, 8, 5, 0.8)  # VMEM budget


def test_pallas_global_cap_overflow_falls_back(mono_font_path, monkeypatch):
    """When the global candidate cap truncates, suspect needles go through
    the exact host fallback — results still bit-identical to the oracle."""
    import focr_tpu.models.ncc as ncc_mod
    from focr_tpu.fonts.ft import Face
    from focr_tpu.io.synth import synthesize_page
    from focr_tpu.models.ncc import NccMatcher
    from focr_tpu.models.types import DecodeOptions, RenderOptions

    monkeypatch.setattr(ncc_mod, "_CAPH_START", 2)  # force overflow
    monkeypatch.setattr(ncc_mod, "_CAPH_MAX", 2)  # ...with no redo headroom
    fallbacks = []
    orig = ncc_mod._host_searcher

    def spy(page):
        fallbacks.append(1)
        return orig(page)

    monkeypatch.setattr(ncc_mod, "_host_searcher", spy)
    face = Face(mono_font_path)
    ropts = RenderOptions(size=11.0)
    dopts = DecodeOptions(x_start=5, y_start=6, line_height=13, line_advance=15, width=110)
    page = synthesize_page(face, ["ABABAB", "ababab"], dopts, ropts, "ABab", (64, 128))
    m = NccMatcher(face, "ABab", ropts, threshold=0.5, device_kernel="pallas")
    hp = m.get_hits(page)
    ho = m.get_hits_oracle(page)
    assert fallbacks, "global cap never overflowed: test exercised nothing"
    assert len(hp) > 0
    key = lambda hs: [(h.letter, h.x, h.y, np.float32(h.similarity).tobytes()) for h in hs]
    assert key(hp) == key(ho)


def test_pallas_caph_bump_redo(mono_font_path, monkeypatch):
    """A candidate-cap overflow below the ceiling re-dispatches once at a
    POWER-OF-TWO cap rung covering 1.125x the measured candidate count and
    remembers the bump — results identical to the oracle, and the matcher's
    next dispatch uses the larger cap directly (no further growth on the
    same page). Rungs must be content-independent (powers of two, or the
    ceiling): a content-sized cap mints a fresh compiled executable per
    corpus, a 10-25s tunnel compile landing mid-run."""
    import focr_tpu.models.ncc as ncc_mod
    from focr_tpu.fonts.ft import Face
    from focr_tpu.io.synth import synthesize_page
    from focr_tpu.models.ncc import NccMatcher
    from focr_tpu.models.types import DecodeOptions, RenderOptions

    monkeypatch.setattr(ncc_mod, "_CAPH_START", 2)  # overflows immediately
    face = Face(mono_font_path)
    ropts = RenderOptions(size=11.0)
    dopts = DecodeOptions(x_start=5, y_start=6, line_height=13, line_advance=15, width=110)
    page = synthesize_page(face, ["ABABAB", "ababab"], dopts, ropts, "ABab", (64, 128))
    m = NccMatcher(face, "ABab", ropts, threshold=0.5, device_kernel="pallas")
    hp = m.get_hits(page)
    ho = m.get_hits_oracle(page)
    key = lambda hs: [(h.letter, h.x, h.y, np.float32(h.similarity).tobytes()) for h in hs]
    assert key(hp) == key(ho)
    # bump remembered: grown to a power-of-two rung covering the measured need
    grown = dict(m._caph)
    assert grown and all(
        2 < c <= ncc_mod._CAPH_MAX
        and (c == ncc_mod._CAPH_MAX or (c & (c - 1)) == 0)
        for c in grown.values()
    )
    assert key(m.get_hits(page)) == key(ho)  # second pass: bigger cap directly
    assert m._caph == grown  # sized to need: the same page never re-grows


def test_tile_t_tight_32_aligned():
    """Needle tiling contract (ops/pallas_ncc.py::tile_t): equal 32-aligned
    tiles sized to the needle count, not pow2 rungs — the canonical dense
    group (74 letters x 4 subpixel offsets = 296 needles) must run as ONE
    320-tile on the canonical page (pow2 padding to 512 wasted 42% of every
    correlation dot), and fall back to safe 160-tiles (same Tp) on pages
    whose 320-band would overflow VMEM. pad_t must always be a whole
    number of tiles covering T."""
    for T in (1, 5, 31, 32, 74, 128, 129, 296, 300, 600, 1024):
        for args in ((), (792, 662, 9, 17), (2500, 2000, 9, 13)):
            tt = pallas_ncc.tile_t(T, *args)
            tp = pallas_ncc.pad_t(T, *args)
            assert tt % 32 == 0, (T, args, tt)
            assert tp % tt == 0 and tp >= T, (T, args, tt, tp)
            assert tp - T < tt, (T, args, tt, tp)  # fewest tiles
            if not args:
                assert tt <= 256  # shape-less callers stay in the safe cap
    # the canonical dense config: one tight tile, 37.5% less than pow2
    assert pallas_ncc.tile_t(296, 792, 662, 9, 17) == 320
    assert pallas_ncc.pad_t(296, 792, 662, 9, 17) == 320
    # wide page: a tile above 256 is legal ONLY with a verified VMEM fit
    # (the specific choice moves with the kernel's VMEM model — e.g. the
    # u16 half-word plane halved the gmat term and promoted this config
    # from 160-tiles to one 320-tile)
    tt = pallas_ncc.tile_t(296, 2500, 2000, 9, 13)
    assert pallas_ncc.pad_t(296, 2500, 2000, 9, 13) % tt == 0
    if tt > 256:
        assert pallas_ncc._vmem_rows(
            2500, 2000, 9, 13, trows=8, Tt=tt
        ) < pallas_ncc._VMEM_BUDGET
    # x-bits 0 (74 needles): tight 96 instead of 128
    assert pallas_ncc.tile_t(74) == 96
