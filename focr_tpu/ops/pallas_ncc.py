"""Pallas TPU kernel for the NCC sweep — the native-kernel tier.

This is the TPU counterpart of the reference's AVX2 kernel (src/ncc.cpp): one
fused pass over the page computing, for ALL needles of one size group, the
integer cross-correlation (as an MXU matmul over im2col row blocks), the
windowed patch statistics, the ε-guarded similarity threshold, and a
32-bit-packed candidate bitmask — all in VMEM. Compared with the XLA
formulation (ops/ncc.py), nothing dense ever reaches HBM except the packed
mask (~32× smaller than a similarity plane: ~5MB for a letter-size page and a
74-letter bank instead of ~300MB of conv output + top_k keys).

Semantics: the mask is an ε-superset of the reference's accept set over the
search domain y>=1, x>=1 (ncc.cpp:98, ncc.rs:279); the host replays the exact
f64 similarity per candidate (models/ncc.py), so end results are bit-identical
to the oracle. The threshold test is algebraic —

    num > (thr - ε) · sqrt(norm2_n · norm2_p)   with norm2_p > 0, Σp > 0

— equivalent to sim > thr - ε without a division (den > 0 on the kept set,
valid for thr - ε > 0; pallas_supported() gates on that).

The kernel streams the page through VMEM one 8-window-row band at a time
(page height never enters the VMEM budget); callers fall back to the XLA
path only for configurations the kernel cannot express (needles wider than
16 px, pages so wide the packing matrix overflows VMEM).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TROWS = 8  # window rows per grid step (sublane-aligned)


def tile_t(T: int) -> int:
    """Needles per grid step: the full 128-sublane MXU m-dim, doubled to 256
    for groups that need a second tile anyway — fewer grid steps means the
    shared shifted-slice matrix S is rebuilt less often."""
    return 128 if T <= 128 else 256


def pad_t(T: int) -> int:
    """Needle count padded to a whole number of tiles."""
    tt = tile_t(T)
    return ((T + tt - 1) // tt) * tt


def _kernel_rows(thr_ref, img_ref, ndmr_ref, sp_ref, s2p_ref, rtn_ref,
                 sn_n_ref, gmat_ref, bytes_ref, s_ref, *,
                 nw, nh, W1, Hs, n, Tt):
    """Kernel body; grid is (page, needle_tile, row_band) — one
    _TROWS-window-row band of one Tt-needle tile of one page per step. The
    image input is an overlapping row-band tile [1, 1, TR+nh-1, Wp]
    materialized in HBM by _candidates_impl (≈2.5× the f32 page — HBM is
    plentiful; VMEM is the constraint), so page height never enters the VMEM
    budget and arbitrarily tall pages stream through (SURVEY.md §7 stage 4 —
    the reference's per-row loop, ncc.cpp:98-100, as a banded grid).

    The correlation for ALL TR rows shares ONE shifted-slice matrix
    S[q·nw+dx, x] = img[y0+q, x+dx] (the (TR+nh-1)·nw distinct shifted row
    slices of the band — a per-row im2col would store TR·nh·nw slices, ~6×
    more VPU work, and per-step VPU work dominated the previous one-row
    kernel at ~7µs/step). Window row r then contracts against a staticly
    pre-shifted needle matrix ndmr[r], where ndmr[r, t, r·nw + k] =
    needle[t, k]: the (q, dx) slice meets needle entry (q-r, dx) exactly
    when the band layout says q = r + dy, so acc_r = ndmr[r] @ S reproduces
    the per-row im2col contraction term for term — same products, same
    nonnegative-partial-sum f32 accumulation (zero padding contributes
    nothing), so acc is the same exact integer as before.

    thr    [1, 1]               f32  (threshold - ε), SMEM
    img    [1, 1, TR+nh-1, Wp]  f32  row band: page rows [yt*TR, …+TR+nh-1)
    ndmr   [1, TR, Tt, Ks]      bf16 shifted needle tiles, Ks = (TR+nh-1)·nw
    sp     [1, 1, TR, W1]       f32  window Σp rows of this band (row 0 of
                                     the page zeroed => y=0 excluded)
    s2p    [1, 1, TR, W1]       f32
    rtn    [Tt, 1]              f32  √(needle norm²), +inf when norm² <= 0
                                     (folds the n2n>0 mask: +inf·finite
                                     den propagates to a false compare)
    sn_n   [Tt, 1]              f32  needle Σ / n
    gmat   [W1, W1/8]           bf16 bit-packing matrix:
                                     G[x, g] = 2^(x%8) · [x//8 == g]
    bytes  [1, TR, Tt, W1/8]    u8 out block at (b, yt, tile, 0) — mask
           bytes (byte g packs x in [8g, 8g+8))
    s      [Ks, W1]             bf16 scratch — the shared shifted slices

    Per band row r (unrolled python loop, r static): two MXU dots — the
    correlation (ndmr[r] [Tt,Ks] @ S [Ks,W1]) and the bit-packing
    (keep [Tt,W1] @ G; packing as a matmul sidesteps Mosaic's
    reshape/relayout restrictions — sums of distinct powers of two ≤ 255
    are exact in bf16×bf16→f32). The row-level masks (sp>0, norm2p>-8,
    x>=1, y<Hs) fold into a ±inf denominator term instead of a boolean
    chain: keep = num > thr_eps·den_lo - 48 with den_lo = rtn·q, where
    q = +inf on masked columns — thr_eps·inf - 48 = +inf and inf·0 = NaN
    both compare false against the finite num, so the accept set is
    IDENTICAL to the explicit-mask form (and the pass-case arithmetic is
    associated exactly as before: rtn·sqrt(...) then ·thr_eps then -48).
    """
    ndmr = ndmr_ref[:]  # [1, TR, Tt, Ks] bf16
    gmat = gmat_ref[:]
    rtn = rtn_ref[:, 0]  # [Tt]
    sn_n = sn_n_ref[:, 0]
    yt = pl.program_id(2)
    thr_eps = thr_ref[0, 0]
    inf = jnp.float32(jnp.inf)
    # search domain excludes x=0 (ncc.rs:279, ncc.cpp:98)
    col_ok = jax.lax.broadcasted_iota(jnp.int32, (1, W1), 1) >= 1

    # the band's distinct shifted slices, stored once and shared by all TR
    # rows: S[q*nw+dx, x] = img[y0+q, x+dx]. Built via per-slice STORES into
    # VMEM scratch — stores relayout the lane-offset slices to offset 0; a
    # sublane concat of them does not lower ("offset mismatch on non-concat
    # dimension").
    for q in range(_TROWS + nh - 1):
        row = img_ref[0, 0, pl.ds(q, 1), :].astype(jnp.bfloat16)  # [1, Wp]
        for dx in range(nw):
            s_ref[pl.ds(q * nw + dx, 1), :] = row[:, dx : dx + W1]
    smat = s_ref[:]  # [Ks, W1]

    for r in range(_TROWS):
        y = yt * _TROWS + r  # absolute window row (traced scalar)
        acc = jnp.dot(
            ndmr[0, r], smat, preferred_element_type=jnp.float32
        )  # [Tt, W1] — exact: nonneg integer partial sums < 2^24

        sp = sp_ref[0, 0, pl.ds(r, 1), :]  # [1, W1]
        s2p = s2p_ref[0, 0, pl.ds(r, 1), :]
        norm2p = s2p - sp * sp * jnp.float32(1.0 / n)
        num = acc - sn_n[:, None] * sp
        # certified LOWER-bound denominator: norm2p can round ABOVE its
        # exact value (|error| <= 8 here: magnitudes gated below 2^24), and
        # near zero variance the sqrt amplifies any overshoot unboundedly —
        # subtract the error bound BEFORE the sqrt so den_lo <= den_exact
        # always; combined with the additive num slack, a true match can
        # never be dropped. Extra candidates die in the exact f64 host
        # replay (norm2p_exact <= 0 => sim = inf/NaN there, filtered like
        # the reference ncc.rs:457-473).
        row_ok = (sp > 0) & (norm2p > jnp.float32(-8.0)) & col_ok & (y < Hs)
        q_lo = jnp.where(
            row_ok, jnp.sqrt(jnp.maximum(norm2p - jnp.float32(8.0), 0.0)), inf
        )
        den_lo = rtn[:, None] * q_lo
        keep = num > thr_eps * den_lo - jnp.float32(48.0)
        keepf = keep.astype(jnp.float32)
        packed = jnp.dot(
            keepf.astype(jnp.bfloat16), gmat, preferred_element_type=jnp.float32
        )  # [Tt, W1/8] — exact byte values 0..255
        bytes_ref[0, r, :, :] = packed.astype(jnp.int32).astype(jnp.uint8)


def _pad_to_b(a: jax.Array, rows: int, cols: int) -> jax.Array:
    """Pad the trailing two dims of [B, H, W] up to (rows, cols)."""
    return jnp.pad(a, ((0, 0), (0, rows - a.shape[1]), (0, cols - a.shape[2])))


def _candidates_impl(
    imgs: jax.Array,  # [B, H, W] inverted pages (u8/i32 values 0..255)
    needles: jax.Array,  # [T, nh, nw] u8
    s_n: jax.Array,  # [T] i64 needle sums
    s2_n: jax.Array,  # [T] i64 needle sum-of-squares
    threshold: jax.Array,  # f32 scalar
    nw: int,
    nh: int,
    capw: int,
    eps: float,
    interpret: bool,
):
    """Shared batched implementation; see ncc_candidates_pallas[_batch]."""
    from focr_tpu.ops.ncc import window_stats

    B, H, W = imgs.shape
    T = needles.shape[0]
    n = nw * nh
    Hs = H - nh + 1  # window rows; search domain is y in [1, Hs)
    W1 = word_stride(W, nw) * 32
    Hs8 = ((Hs + 7) // 8) * 8

    # images padded so every im2col slice [y0+dy, dx : dx+W1] is in bounds
    # (Hp >= H and Wp >= W always: Hs8 >= Hs and W1 >= W-nw+1)
    Hp = Hs8 + nh - 1
    Wp = W1 + nw - 1
    img_i = _pad_to_b(imgs.astype(jnp.float32), Hp, Wp)

    sp_full, s2p_full = jax.vmap(lambda im: window_stats(im, nw, nh))(
        imgs.astype(jnp.int32)
    )
    sp_f = _pad_to_b(sp_full, Hs8, W1).astype(jnp.float32)
    s2p_f = _pad_to_b(s2p_full, Hs8, W1).astype(jnp.float32)
    # zero row 0: excludes y=0 from the domain via the sp>0 test
    sp_f = sp_f.at[:, 0].set(0.0)

    ndm = needles.reshape(T, n).astype(jnp.float32)
    nf = jnp.float32(n)
    sn_n = (s_n.astype(jnp.float32) / nf).reshape(T, 1)
    # needle norm² with the EXACT sign: n·Σn² − (Σn)² in i64, then /n in f32.
    # A pure-f32 computation can flip a tiny positive variance (near-uniform
    # needle) to <= 0 and silently drop all its matches; the i64 integer is
    # exact and the f32 conversion preserves positivity.
    n2n_int = jnp.int64(n) * s2_n.astype(jnp.int64) - s_n.astype(jnp.int64) ** 2
    n2n = (n2n_int.astype(jnp.float32) / nf).reshape(T, 1)
    # √norm² with the zero-variance needles (incl. the Tp padding) pinned to
    # +inf — the kernel folds the n2n>0 mask into this denominator factor
    rtn = jnp.where(n2n > 0, jnp.sqrt(n2n), jnp.float32(jnp.inf))
    thr_arr = (threshold.astype(jnp.float32) - jnp.float32(eps)).reshape(1, 1)

    WW = W1 // 32
    WB = W1 // 8
    Tt = tile_t(T)
    Tp = pad_t(T)
    if Tp != T:  # pad with zero needles: rtn == +inf => no candidates
        ndm = jnp.pad(ndm, ((0, Tp - T), (0, 0)))
        sn_n = jnp.pad(sn_n, ((0, Tp - T), (0, 0)))
        rtn = jnp.pad(rtn, ((0, Tp - T), (0, 0)),
                      constant_values=np.float32(np.inf))

    # bit-packing matrix: G[x, g] = 2^(x % 8) iff x // 8 == g (powers of two
    # ≤ 128: exact in bf16)
    xs = np.arange(W1)
    gm = np.zeros((W1, WB), dtype=np.float32)
    gm[xs, xs // 8] = (1 << (xs % 8)).astype(np.float32)
    gmat = jnp.asarray(gm).astype(jnp.bfloat16)

    # staticly pre-shifted needle tiles: ndmr[i, r, t, r·nw + k] =
    # bank[i·Tt + t, k] (zero elsewhere) — window row r of a band contracts
    # needle entry (dy, dx) against band slice q = r + dy, and the shift
    # r·nw in the flattened (q, dx) index is exactly a left zero-pad
    band = _TROWS + nh - 1
    Ks = band * nw
    ndmr = jnp.stack(
        [jnp.pad(ndm, ((0, 0), (r * nw, Ks - n - r * nw))) for r in range(_TROWS)]
    )  # [TR, Tp, Ks]
    ndmr = (
        ndmr.reshape(_TROWS, Tp // Tt, Tt, Ks)
        .transpose(1, 0, 2, 3)
        .astype(jnp.bfloat16)  # integer values ≤ 255: exact
    )

    # row-banded residency: materialize overlapping image row bands in HBM
    # (≈2.5× the f32 page — HBM is plentiful; VMEM is the constraint) and
    # stream one band per grid step. sp/s2p tile cleanly (Hs8 is a multiple
    # of _TROWS).
    n_bands = Hs8 // _TROWS
    ridx = (
        np.arange(n_bands)[:, None] * _TROWS + np.arange(band)[None, :]
    )  # [n_bands, band] rows into img_i (Hp = Hs8 + nh - 1 >= max+1)
    img_t = img_i[:, ridx, :]  # [B, n_bands, band, Wp]
    sp_t = sp_f.reshape(B, n_bands, _TROWS, W1)
    s2p_t = s2p_f.reshape(B, n_bands, _TROWS, W1)
    kernel = functools.partial(
        _kernel_rows, nw=nw, nh=nh, W1=W1, Hs=Hs, n=n, Tt=Tt
    )
    grid = (B, Tp // Tt, n_bands)
    # trace the kernel with x64 OFF: under the package-global jax_enable_x64,
    # python-int literals in BlockSpec index maps / kernel body become i64
    # constants, and Mosaic cannot legalize i64 (func.return (i64, i64))
    with jax.enable_x64(False):
        mask_bytes = _call_rows(
            kernel, grid, B, Hs8, Tp, Tt, WB, W1, Ks, band, img_t.shape[-1],
            interpret, thr_arr, img_t, ndmr, sp_t, s2p_t, rtn, sn_n, gmat,
        )
    return _compact_rank(mask_bytes, B, T, Tp, Hs8, WW, capw)


_SUB = 32  # rank-compaction L0 granularity: words per sub-block
_NB = 64  # sub-blocks per L1 block (block = _SUB * _NB = 2048 words)


def _rows(mat: jax.Array, idx: jax.Array) -> jax.Array:
    """Batched row gather: mat [B, R, C], idx [B, K] -> [B, K, C]; lowers to
    one XLA gather with slice size (1, C) — the index array stays [B, K]
    (a take_along_axis broadcast would materialize [B, K, C] indices)."""
    return jax.vmap(lambda m, i: m[i])(mat, idx)


def _triu_cum(rows: jax.Array, tri: jax.Array) -> jax.Array:
    """Inclusive prefix sums over the minor axis as ONE small MXU matmul
    (cum[j] = Σ_{k<=j} rows[k] = rows @ upper-triangular ones). Exact: counts
    are integers <= _SUB * _NB = 2048 < 2^24, bf16 inputs (values <= 32 are
    exact) accumulate in f32. XLA's cumsum would instead run log(n)
    reduce-window passes over the gathered plane — measured ~10x slower."""
    return jnp.dot(
        rows.astype(jnp.bfloat16), tri, preferred_element_type=jnp.float32
    )


def _compact_rank(
    mask_bytes: jax.Array,  # [B, Hs8, Tp, WB] u8 — kernel output, y-major
    B: int, T: int, Tp: int, Hs8: int, WW: int, capw: int,
):
    """Exact first-capw nonzero-word compaction by hierarchical rank.

    Selects, per page, the first capw NONZERO 32-bit mask words in global
    (needle, scan) order — the reference's scan order (ncc.cpp:98-100 per
    needle; needles iterated offsets-outer, ncc.rs:587-655) — and gathers
    their packed bits, without ever materializing the dense i32 word plane.
    TPU-first design notes: stream compaction via top_k / sort / full-plane
    cumsum costs 150-400ms per 32-page dense wave (TopK cliffs above k~32,
    sorts are comparator networks, XLA cumsum is log-n reduce-window
    passes); this formulation uses only single-pass sums, one tiny
    searchsorted, two small row gathers, and two [64,64]-ish triangular
    matmuls — every pass either touches the 4x-smaller flag plane once or
    touches capw-sized data.

      L2  block totals (2048 words/block) -> cumsum over ~600 blocks,
          searchsorted locates each output slot's owning block
      L1  per-block sub-totals (64 x 32-word sub-blocks), gathered per slot,
          triangular-matmul prefix sums -> rank within block
      L0  the 32 word-flags of the owning sub-block, same trick -> word

    The selected word's VALUE is then four u8 gathers straight from the
    kernel's y-major byte plane (index arithmetic maps the t-major global
    word index to its byte row), so the bytes->words pack and the [B, T,
    Hs8, WB] transpose of the old scheme disappear entirely.

    Returns (idx [B, capw] u16|i32 LOCAL word index within its needle
    (u16 whenever a needle's word span Hs8*WW fits; 0 padded — validity is
    positional: entry j is real iff j < min(nz_words, capw)), vals [B, capw]
    i32, wcnt [B, T] i32 exact nonzero-word count per needle (so the host
    recovers each needle's span without a sentinel scan), nz_words [B] i32).
    The local-u16 + counts form (6 bytes/word) exists because the compacted
    buffer's device->host fetch is the dense-corpus pipeline's dominant
    off-chip cost — 25% less wire than global i32 indices, and the needle
    split comes along for free. Exact for every population; overflow
    (nz_words > capw) remains suffix-truncation, handled by the caller's
    capw redo.
    """
    # word-nonzero flags in t-major order: flag[b, t, y, w] = any of word's 4
    # bytes nonzero. One pass over the byte plane + a 4x-smaller transpose.
    mb = mask_bytes.reshape(B, Hs8, Tp, WW, 4)
    wf_y = mb.max(axis=4) != 0  # [B, Hs8, Tp, WW] bool
    wf = jnp.swapaxes(wf_y[:, :, :T], 1, 2)  # [B, T, Hs8, WW]
    wcnt = wf.sum(axis=(2, 3), dtype=jnp.int32)  # [B, T] exact words/needle
    M = T * Hs8 * WW
    BLK = _SUB * _NB
    Mp = ((M + BLK - 1) // BLK) * BLK
    wfr = wf.reshape(B, M)
    if Mp != M:  # zero flags in the pad zone: never selected
        wfr = jnp.pad(wfr, ((0, 0), (0, Mp - M)))
    nsub = Mp // _SUB
    nblk = Mp // BLK
    s1 = wfr.reshape(B, nsub, _SUB).sum(axis=2, dtype=jnp.int32)  # [B, nsub]
    s2 = s1.reshape(B, nblk, _NB).sum(axis=2)  # [B, nblk]

    c2 = jnp.cumsum(s2, axis=1)  # [B, nblk] — tiny
    nz_words = c2[:, -1]

    K = capw
    p = jnp.arange(K, dtype=jnp.int32)
    # owning block: first block whose inclusive total exceeds p, i.e.
    # #{j : c2[j] <= p} — a fused broadcast compare-count over the ~600-row
    # block table instead of jnp.searchsorted (XLA lowers the vmapped
    # binary search as a gather-per-probe while loop: measured 218ms per
    # 32-page dense wave vs ~20ms for the fused compare-reduce). A
    # super-block hierarchy was tried and reverted: per-slot row GATHERS,
    # not the compare-reduce, dominate the K-scaling cost on TPU, and the
    # extra level added one.
    blk = (c2[:, None, :] <= p[None, :, None]).sum(axis=2, dtype=jnp.int32)
    blk = jnp.minimum(blk, nblk - 1)
    # ONE gather from the exclusive-prefix table (c2 − s2 is elementwise on
    # the tiny block table) instead of two K-sized take_along_axis calls
    before2 = jnp.take_along_axis(c2 - s2, blk, axis=1)
    j2 = p[None] - before2  # rank within block, valid where p < nz_words

    tri_nb = jnp.asarray(np.triu(np.ones((_NB, _NB), np.float32)))
    tri_sub = jnp.asarray(np.triu(np.ones((_SUB, _SUB), np.float32)))

    rows1 = _rows(s1.reshape(B, nblk, _NB), blk)  # [B, K, _NB] i32
    cum1 = _triu_cum(rows1, tri_nb.astype(jnp.bfloat16))  # [B, K, _NB] f32
    j2f = j2.astype(jnp.float32)
    sub = (cum1 <= j2f[:, :, None]).sum(axis=2, dtype=jnp.int32)
    sub = jnp.minimum(sub, _NB - 1)
    # exclusive-prefix table (elementwise on the already-materialized cum1)
    # halves the per-slot take_along_axis gathers here too
    before1 = jnp.take_along_axis(
        cum1 - rows1.astype(jnp.float32), sub[:, :, None], axis=2
    )[:, :, 0]
    j1 = j2f - before1  # rank within sub-block

    sub_id = blk * _NB + sub  # [B, K] global sub-block index
    rows0 = _rows(wfr.reshape(B, nsub, _SUB), sub_id)  # [B, K, _SUB] bool
    cum0 = _triu_cum(rows0, tri_sub.astype(jnp.bfloat16))
    loc = (cum0 <= j1[:, :, None]).sum(axis=2, dtype=jnp.int32)
    loc = jnp.minimum(loc, _SUB - 1)
    g = sub_id * _SUB + loc  # [B, K] global word index, t-major

    # value fetch: map t-major g -> the y-major byte plane's word row
    hsww = Hs8 * WW
    t = g // hsww
    rem = g - t * hsww
    y = rem // WW
    w = rem - y * WW
    # pad-zone g (only where found == False) can map past T-1: clamp the row
    # so the discarded gather stays in bounds
    word_row = jnp.minimum((y * Tp + t) * WW + w, Hs8 * Tp * WW - 1)
    mrows = mask_bytes.reshape(B, Hs8 * Tp * WW, 4)
    b4 = _rows(mrows, word_row).astype(jnp.int32)  # [B, K, 4]
    vals = b4[..., 0] | (b4[..., 1] << 8) | (b4[..., 2] << 16) | (b4[..., 3] << 24)

    found = p[None] < jnp.minimum(nz_words, jnp.int32(K))[:, None]
    local = jnp.where(found, rem, 0)
    if hsww <= 2**16:  # local index fits u16: half the idx wire bytes
        local = local.astype(jnp.uint16)
    vals = jnp.where(found, vals, 0)
    return local, vals, wcnt, nz_words


@functools.partial(
    jax.jit, static_argnames=("nw", "nh", "capw", "eps", "interpret")
)
def ncc_candidates_pallas(
    img: jax.Array,  # [H, W] inverted page (u8/i32 values 0..255)
    needles: jax.Array,  # [T, nh, nw] u8
    s_n: jax.Array,  # [T] i64 needle sums
    s2_n: jax.Array,  # [T] i64 needle sum-of-squares
    threshold: jax.Array,  # f32 scalar
    *,
    nw: int,
    nh: int,
    capw: int,
    eps: float = 1e-3,
    interpret: bool = False,
):
    """Pallas-backed candidate search for one needle-size group, one page.

    Returns (word_idx, word_val, word_cnt, nz_words):
      word_idx [capw] u16|i32 — LOCAL word index within its needle (word w
               covers window columns x in [(w % WW)*32, …+32) of row
               y = w // WW, where WW = W1/32 and W1 is the padded
               window-column count = word_stride(W, nw) * 32). The first
               min(nz_words, capw) entries are the first capw nonzero words
               in global (needle, scan) order; entry ownership comes from
               word_cnt (needle t owns entries [Σ_{<t} wcnt, …+wcnt[t]),
               clipped to capw). u16 whenever a needle's word span Hs8*WW
               fits 16 bits; 0 padded past the valid prefix.
      word_val [capw] i32 — the packed bits of each selected word
      word_cnt [T] i32    — EXACT nonzero-word count per needle (cap-
               independent, so overflow truncation is detectable per needle)
      nz_words [1] i32    — total nonzero words (= word_cnt.sum()); overflow
               iff nz_words > capw, handled by the caller's capw redo. The
               compaction is exact first-capw (hierarchical rank, no lossy
               level), so suffix truncation is the ONLY loss mode.

    One global buffer instead of a [T, capw] plane cuts the device->host
    fetch ~T× (the per-needle padding is almost entirely empty), and the
    local-u16 index form another 25% — that fetch is the dominant per-page
    cost off-chip. The caller unpacks bits host-side (scan order: ascending
    word, ascending bit) and replays the exact f64 similarity per candidate.
    """
    widx, wval, wcnt, nzw = _candidates_impl(
        img[None], needles, s_n, s2_n, threshold, nw, nh, capw, eps, interpret
    )
    return widx[0], wval[0], wcnt[0], nzw


@functools.partial(
    jax.jit, static_argnames=("nw", "nh", "capw", "eps", "interpret")
)
def ncc_candidates_pallas_batch(
    imgs: jax.Array,  # [B, H, W] inverted pages (u8/i32 values 0..255)
    needles: jax.Array,  # [T, nh, nw] u8
    s_n: jax.Array,  # [T] i64
    s2_n: jax.Array,  # [T] i64
    threshold: jax.Array,  # f32 scalar
    *,
    nw: int,
    nh: int,
    capw: int,
    eps: float = 1e-3,
    interpret: bool = False,
):
    """Batched-page variant of ncc_candidates_pallas: one kernel dispatch
    sweeps a whole wave of same-shape pages (page axis = outermost grid dim)
    and the compacted word buffers come back as ONE [B, capw] pair, so a wave
    costs one dispatch + one fetch instead of B of each — the off-chip
    round-trip tax was the dense-corpus pipeline's long pole.

    Returns (word_idx [B, capw], word_val [B, capw], word_cnt [B, T],
    nz_words [B]); per-page semantics identical to ncc_candidates_pallas.
    """
    return _candidates_impl(
        imgs, needles, s_n, s2_n, threshold, nw, nh, capw, eps, interpret
    )


def _call_rows(kernel, grid, B, Hs8, Tp, Tt, WB, W1, Ks, band, Wp,
               interpret, *args):
    """pallas_call wrapper for the banded kernel: the image input is the
    pre-banded [B, n_bands, band, Wp] array (one overlapping row band per
    grid step); the mask-byte output is y-major [B, Hs8, Tp, WB]."""
    return pl.pallas_call(
        kernel,
        grid=grid,
        out_shape=jax.ShapeDtypeStruct((B, Hs8, Tp, WB), jnp.uint8),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, band, Wp), lambda b, i, yt: (b, yt, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _TROWS, Tt, Ks), lambda b, i, yt: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, _TROWS, W1), lambda b, i, yt: (b, yt, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, _TROWS, W1), lambda b, i, yt: (b, yt, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Tt, 1), lambda b, i, yt: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Tt, 1), lambda b, i, yt: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((W1, WB), lambda b, i, yt: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, _TROWS, Tt, WB), lambda b, i, yt: (b, yt, i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((Ks, W1), jnp.bfloat16)],
        interpret=interpret,
    )(*args)


def word_stride(W: int, nw: int) -> int:
    """Mask words per row (ceil of the window-column count / 32)."""
    return (W - nw + 1 + 31) // 32


def words_per_needle(H: int, W: int, nw: int, nh: int) -> int:
    """Global-index stride between needles in the compacted word buffer."""
    Hs8 = ((H - nh + 1 + 7) // 8) * 8
    return Hs8 * word_stride(W, nw)


def _vmem_rows(H: int, W: int, nw: int, nh: int) -> int:
    """VMEM bytes for the banded kernel (_kernel_rows): only one _TROWS-row
    band is resident (double-buffered), so the page height drops out
    entirely — tall pages stream through. Width still enters via the gmat
    packing matrix (quadratic in W1). Tt is taken at its 256 maximum (the
    needle count is not known here)."""
    W1 = word_stride(W, nw) * 32
    Wp = W1 + nw - 1
    band = _TROWS + nh - 1
    Ks = band * nw
    Tt = 256
    return (
        2 * 4 * band * Wp  # img band x2 (pipeline double buffering)
        + 2 * 2 * 4 * _TROWS * W1  # sp + s2p bands x2
        + 2 * W1 * (W1 // 8)  # gmat (bf16)
        + 2 * Ks * W1  # bf16 shifted-slice scratch
        + 2 * 2 * _TROWS * Tt * Ks  # shifted needle tiles x2 (bf16)
        + 2 * 4 * Tt * W1  # acc + num transients
        + 2 * _TROWS * Tt * (W1 // 8)  # bytes out block x2
    )


_VMEM_BUDGET = 10 * 2**20


def pallas_mode(H: int, W: int, nw: int, nh: int) -> str | None:
    """Whether the banded kernel handles this configuration: 'rows'
    (row-band streaming — page height never enters the VMEM budget), or
    None (XLA fallback — e.g. needles wider than 16 px, or pages so WIDE
    the packing matrix alone overflows VMEM)."""
    Hs = H - nh + 1
    if Hs < 8 or W - nw + 1 < 2 or nw > 16:
        return None
    if nh * nw * 65025 >= 2**24:
        return None  # acc/sp/s2p must be exact in f32 (no in-kernel nibble split)
    if H * nw * 65025 >= 2**31:
        return None  # window_stats would need i64 (f32 stats lose exactness)
    if _vmem_rows(H, W, nw, nh) < _VMEM_BUDGET:
        return "rows"
    return None


def pallas_supported(
    H: int, W: int, nw: int, nh: int, threshold: float, eps: float = 1e-3
) -> bool:
    """Whether the Pallas path handles this configuration (exact-integer
    bounds, VMEM budget in either residency mode, positive algebraic
    threshold); callers use the XLA path otherwise."""
    if np.float32(threshold) - np.float32(eps) <= 0:
        return False  # num > c*den needs c > 0 to be equivalent to sim > c
    return pallas_mode(H, W, nw, nh) is not None
