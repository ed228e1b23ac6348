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

_TROWS = 8  # minimum window rows per grid step (sublane-aligned); the
# actual band height is picked per config by _pick_trows — 32 or 16 when
# the VMEM budget allows (fewer grid steps amortize the per-step fixed
# cost, measured ~8µs/step), 8 otherwise (wide/tall needles whose
# doubled ndmr tiles would blow the budget keep Pallas coverage)


def _pick_trows(H: int, W: int, nw: int, nh: int, T: int | None = None) -> int:
    """Band height (window rows per grid step) for this config: the
    largest of {32, 16, 8} whose band fits the VMEM budget — per-grid-step
    fixed cost (~8µs: S rebuild, block swaps) is a measured ~0.2 ms/page
    at 49 steps, so fewer, taller bands win whenever the doubled ndmr/img
    blocks fit."""
    for tr in (32, 16):
        if _vmem_rows(H, W, nw, nh, trows=tr, T=T) < _VMEM_BUDGET:
            return tr
    return 8


_TT_MAX = 320  # per-tile needle cap above the unconditional 256: taken only
# when the config's tr=8 band provably fits VMEM (tile_t checks), so the
# canonical 296-needle group runs as ONE tile instead of two pow2 ones


def tile_t(
    T: int, H: int | None = None, W: int | None = None,
    nw: int | None = None, nh: int | None = None,
) -> int:
    """Needles per grid step: T split into the FEWEST equal 32-aligned
    tiles. 32-alignment is the u8 mask-byte out block's sublane
    granularity; beyond it the MXU m-dim costs scale with the actual tile
    height, so tight tiles beat pow2 ones — the canonical dense workload
    (74 letters x 4 subpixel offsets = 296 needles) padded to two pow2
    tiles (512) wasted 42% of every correlation dot and 42% of the mask
    plane on zero needles; one 320-needle tile wastes 7.5% and builds the
    shared shifted-slice matrix S once per band instead of twice. A tile
    above 256 (up to _TT_MAX) is taken only when the page shape is known
    and the tile's tr=8 band fits the VMEM budget; without a shape the
    split stays within the unconditionally-safe 256."""
    k = max(1, -(-T // _TT_MAX))
    while True:
        tt = -(-(-(-T // k)) // 32) * 32
        if tt <= 256:
            return tt
        if H is not None and (
            _vmem_rows(H, W, nw, nh, trows=8, Tt=tt) < _VMEM_BUDGET
        ):
            return tt
        k += 1


def pad_t(
    T: int, H: int | None = None, W: int | None = None,
    nw: int | None = None, nh: int | None = None,
) -> int:
    """Needle count padded to a whole number of tiles."""
    tt = tile_t(T, H, W, nw, nh)
    return ((T + tt - 1) // tt) * tt


def _kernel_rows(thr_ref, img_ref, ndmr_ref, sp_ref, s2p_ref, rtn_ref,
                 sn_n_ref, gmat_ref, bytes_ref, rcnt_ref, s_ref, *,
                 nw, nh, W1, Hs, n, Tt, tr):
    """Kernel body; grid is (page, needle_tile, row_band) — one
    tr-window-row band of one Tt-needle tile of one page per step. The
    image input is an overlapping row-band tile [1, 1, tr·cch, Wp] (the
    first band = tr+nh-1 rows are this band's window; the aligned-chunk
    tail is ignored) materialized in HBM by _candidates_impl (≈3× the f32
    page — HBM is plentiful; VMEM is the constraint), so page height never
    enters the VMEM
    budget and arbitrarily tall pages stream through (SURVEY.md §7 stage 4 —
    the reference's per-row loop, ncc.cpp:98-100, as a banded grid).

    The correlation for ALL TR rows shares ONE shifted-slice matrix, laid
    out dx-MAJOR: S[dx·band+q, x] = img[y0+q, x+dx] (the (TR+nh-1)·nw
    distinct shifted row slices of the band — a per-row im2col would store
    TR·nh·nw slices, ~6× more VPU work). dx-major matters: for a fixed dx
    the band's rows are CONTIGUOUS in S, so the build is nw block stores of
    [band, W1] (each one lane-rotation of the already-bf16 image block)
    instead of (TR+nh-1)·nw single-row stores — per-store issue cost made
    the q-major build ~12µs of a ~21µs grid step (measured; the dots
    themselves are ~7µs). Window row r then contracts against a staticly
    pre-shifted needle matrix ndmr[r], where
    ndmr[r, t, dx·band + (r+dy)] = needle[t, dy, dx]: slice (dx, q) meets
    needle entry (dy = q-r, dx) exactly when the band layout says q = r+dy,
    so acc_r = ndmr[r] @ S reproduces the per-row im2col contraction term
    for term — same products, nonnegative integer partial sums < 2²⁴ are
    exact in f32 under ANY summation order, so acc is the same exact
    integer as before.

    thr    [1, 1]               f32  (threshold - ε), SMEM
    img    [1, 1, tr·cch, Wp]   f32  row band: page rows [yt·tr, …+tr+nh-1)
                                     in its first tr+nh-1 rows
    ndmr   [1, TR, Tt, Ks]      bf16 shifted needle tiles, Ks = (TR+nh-1)·nw
    sp     [1, 1, TR, W1]       f32  window Σp rows of this band (row 0 of
                                     the page zeroed => y=0 excluded)
    s2p    [1, 1, TR, W1]       f32
    rtn    [Tt, 1]              f32  √(needle norm²), +inf when norm² <= 0
                                     (folds the n2n>0 mask: +inf·finite
                                     den propagates to a false compare)
    sn_n   [Tt, 1]              f32  needle Σ / n
    gmat   [W1, W1/16]          bf16 bit-packing matrix:
                                     G[x, g] = 2^(x%16) · [x//16 == g]
                                     (powers of two are exact in bf16 at
                                     any magnitude; sums accumulate f32)
    hw     [1, TR, Tt, W1/16]   u16 out block at (b, yt, tile, 0) — mask
           HALF-WORDS (halfword g packs x in [16g, 16g+16), bit b = x-16g).
           16-bit packing so the compaction consumes the plane with NO
           dtype bitcast: the former u8 plane's u8->u32 relayout was a
           full-plane repack measured at ~1 ms/page on dense waves
    rcnt   [1, 1, Tt, TR]       i32 out block at (b, yt, tile, 0) into the
           band-major count plane [B, n_bands, Tp, TR] — per-mask-row
           candidate counts (mask row (t, y=yt*TR+r) at [b, yt, t, r]).
           Emitted here because recomputing them downstream would re-read +
           popcount the whole mask plane (the compaction's single largest
           HBM pass). The count itself rides the pack matmul: gmat carries
           a trailing all-ones column, so packed[:, WB] = Σ keep — exact
           f32 integers <= W1 < 2^24, one extra MXU lane instead of a VPU
           reduce. (The caller transposes to the compaction's t-major
           order — a cheap [B, n_bands, Tp, TR] i32 pass in XLA; Mosaic's
           block-shape rules disallow writing t-major directly.)
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
    # rows, dx-major: S[dx*band+q, x] = img[y0+q, x+dx]. Built via nw BLOCK
    # stores into VMEM scratch (stores relayout the lane-offset slices to
    # offset 0; a sublane concat of slices does not lower — "offset mismatch
    # on non-concat dimension"). One bf16 cast of the whole band, then one
    # [band, W1] store per dx.
    band = tr + nh - 1
    # the img block is tr·cch >= band rows (aligned-chunk banding); only the
    # first band rows belong to this band's window
    imgb = img_ref[0, 0, :band, :].astype(jnp.bfloat16)  # [band, Wp]
    for dx in range(nw):
        s_ref[pl.ds(dx * band, band), :] = imgb[:, dx : dx + W1]
    smat = s_ref[:]  # [Ks, W1]

    for r in range(tr):
        y = yt * tr + r  # absolute window row (traced scalar)
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
        )  # [Tt, W1/16 + 1] — exact: halfwords 0..65535 (sums of distinct
        # powers of two, f32-accumulated), then the row count
        NHW = W1 // 16
        bytes_ref[0, r, :, :] = (
            packed[:, :NHW].astype(jnp.int32).astype(jnp.uint16)
        )
        rcnt_ref[0, 0, :, pl.ds(r, 1)] = packed[:, NHW:].astype(jnp.int32)


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
    caph: int,
    eps: float,
    interpret: bool,
    wire: str = "pos",
    capw: int = 0,
    kesc: int = 0,
):
    """Shared batched implementation; see ncc_candidates_pallas[_batch]."""
    B = imgs.shape[0]
    T = needles.shape[0]
    W1 = word_stride(imgs.shape[2], nw) * 32
    mask_bytes, rcnt_tm, Hs8, Tp = _sweep_impl(
        imgs, needles, s_n, s2_n, threshold, nw, nh, eps, interpret
    )
    WB = W1 // 8
    pos, hcnt, nzh = _compact_hits(mask_bytes, rcnt_tm, B, T, Tp, Hs8, WB, caph)
    if wire == "delta":
        d16, esc = _encode_delta(
            pos, hcnt, nzh, max(capw, 1), max(kesc, 1),
            plane_bits=Hs8 * WB * 8,
        )
        return d16, esc, hcnt, nzh
    return (*_pack_pos(pos, Hs8 * WB * 8), hcnt, nzh)


def _sweep_impl(
    imgs: jax.Array,  # [B, H, W] inverted pages (u8/i32 values 0..255)
    needles: jax.Array,  # [T, nh, nw] u8
    s_n: jax.Array,  # [T] i64 needle sums
    s2_n: jax.Array,  # [T] i64 needle sum-of-squares
    threshold: jax.Array,  # f32 scalar
    nw: int,
    nh: int,
    eps: float,
    interpret: bool,
):
    """The sweep stage: window stats + banded kernel dispatch, up to the raw
    mask plane. Returns (mask_hw [B, Hs8, Tp, W1/16] u16 half-word bitmask,
    rcnt_tm [B, Tp, Hs8] i32 t-major row counts, Hs8, Tp)."""
    from focr_tpu.ops.ncc import window_stats

    B, H, W = imgs.shape
    T = needles.shape[0]
    n = nw * nh
    Hs = H - nh + 1  # window rows; search domain is y in [1, Hs)
    W1 = word_stride(W, nw) * 32
    tr = _pick_trows(H, W, nw, nh, T)  # band height (16 when VMEM allows)
    Hs8 = ((Hs + tr - 1) // tr) * tr

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

    NHW = W1 // 16
    Tt = tile_t(T, H, W, nw, nh)
    Tp = pad_t(T, H, W, nw, nh)
    if Tp != T:  # pad with zero needles: rtn == +inf => no candidates
        ndm = jnp.pad(ndm, ((0, Tp - T), (0, 0)))
        sn_n = jnp.pad(sn_n, ((0, Tp - T), (0, 0)))
        rtn = jnp.pad(rtn, ((0, Tp - T), (0, 0)),
                      constant_values=np.float32(np.inf))

    # bit-packing matrix: G[x, g] = 2^(x % 16) iff x // 16 == g (powers of
    # two are exact in bf16 at any magnitude; the f32-accumulated sums of
    # distinct powers <= 65535 are exact), plus a trailing all-ones column
    # so the same matmul also yields each row's candidate COUNT
    # (see _kernel_rows). 16-bit packing halves the pack matmul's n-dim vs
    # bytes AND hands the compaction a plane it can consume with no dtype
    # bitcast (the u8->u32 relayout was a full-plane repack, ~1 ms/page).
    NHW = W1 // 16
    xs = np.arange(W1)
    gm = np.zeros((W1, NHW + 1), dtype=np.float32)
    gm[xs, xs // 16] = (1 << (xs % 16)).astype(np.float32)
    gm[:, NHW] = 1.0
    gmat = jnp.asarray(gm).astype(jnp.bfloat16)

    # staticly pre-shifted needle tiles, dx-major to match the kernel's
    # S layout: ndmr[i, r, t, dx·band + (r+dy)] = bank[i·Tt + t, dy, dx]
    # (zero elsewhere) — window row r of a band contracts needle entry
    # (dy, dx) against band slice q = r + dy; with q contiguous per dx the
    # shift r is a per-dx zero-pad along the q axis
    band = tr + nh - 1
    Ks = band * nw
    nd_dxh = ndm.reshape(Tp, nh, nw).transpose(0, 2, 1)  # [Tp, nw, nh]
    ndmr = jnp.stack(
        [
            jnp.pad(nd_dxh, ((0, 0), (0, 0), (r, band - nh - r))).reshape(Tp, Ks)
            for r in range(tr)
        ]
    )  # [tr, Tp, Ks]
    ndmr = (
        ndmr.reshape(tr, Tp // Tt, Tt, Ks)
        .transpose(1, 0, 2, 3)
        .astype(jnp.bfloat16)  # integer values ≤ 255: exact
    )

    # row-banded residency: materialize overlapping image row bands in HBM
    # (≈3× the f32 page — HBM is plentiful; VMEM is the constraint) and
    # stream one band per grid step. Bands are assembled from ALIGNED
    # 8-row chunks (slice + concat of a reshape — contiguous copies), not a
    # row gather: the [n_bands, band] advanced-index gather this replaces
    # lowered to ~31k single-row gathers and measured 0.7 ms/page, ~70× the
    # copy roofline. Band yt needs page rows [tr·yt, tr·yt+band), which
    # chunks yt..yt+cch-1 cover (cch·tr >= band); the kernel reads rows
    # [0, band) of its tr·cch-row block and ignores the tail. sp/s2p tile
    # cleanly (Hs8 is
    # a multiple of tr).
    n_bands = Hs8 // tr
    cch = -(-band // tr)  # chunks per band
    Hpad = (n_bands + cch - 1) * tr
    if Hpad > img_i.shape[1]:
        img_i = jnp.pad(img_i, ((0, 0), (0, Hpad - img_i.shape[1]), (0, 0)))
    blocks = img_i[:, :Hpad].reshape(B, n_bands + cch - 1, tr, -1)
    img_t = jnp.concatenate(
        [blocks[:, i : i + n_bands] for i in range(cch)], axis=2
    )  # [B, n_bands, tr·cch, Wp]
    sp_t = sp_f.reshape(B, n_bands, tr, W1)
    s2p_t = s2p_f.reshape(B, n_bands, tr, W1)
    kernel = functools.partial(
        _kernel_rows, nw=nw, nh=nh, W1=W1, Hs=Hs, n=n, Tt=Tt, tr=tr
    )
    grid = (B, Tp // Tt, n_bands)
    # trace the kernel with x64 OFF: under the package-global jax_enable_x64,
    # python-int literals in BlockSpec index maps / kernel body become i64
    # constants, and Mosaic cannot legalize i64 (func.return (i64, i64))
    with jax.enable_x64(False):
        mask_bytes, rcnt_bm = _call_rows(
            kernel, grid, B, Hs8, Tp, Tt, NHW, W1, Ks, cch * tr, tr,
            img_t.shape[-1],
            interpret, thr_arr, img_t, ndmr, sp_t, s2p_t, rtn, sn_n, gmat,
        )
    # band-major [B, n_bands, Tp, tr] -> t-major [B, Tp, Hs8] (scan order)
    rcnt_tm = rcnt_bm.transpose(0, 2, 1, 3).reshape(B, Tp, Hs8)
    return mask_bytes, rcnt_tm, Hs8, Tp


_RPB = 32  # rank-compaction block granularity: mask rows per block (the
# per-slot L1 gather/rank work is _RPB-proportional while the L2 block
# locate is nblk-INSENSITIVE since it became a scatter histogram + cumsum,
# so small blocks win; 32 keeps the gathered row at one 128-byte vreg)


def _rows(mat: jax.Array, idx: jax.Array) -> jax.Array:
    """Batched row gather: mat [B, R, C], idx [B, K] -> [B, K, C]; lowers to
    one XLA gather with slice size (1, C) — the index array stays [B, K]
    (a take_along_axis broadcast would materialize [B, K, C] indices)."""
    return jax.vmap(lambda m, i: m[i])(mat, idx)


def _triu_cum(rows: jax.Array, tri: jax.Array) -> jax.Array:
    """Inclusive prefix sums over the minor axis as ONE small MXU matmul
    (cum[j] = Σ_{k<=j} rows[k] = rows @ upper-triangular ones). Exact for
    integer inputs: bf16 operands are exact for values <= 256, and the f32
    HIGHEST-precision path (hi/lo bf16 split) is exact for any integer with
    <= 16 significant bits against a 0/1 matrix; sums stay < 2^24 and
    accumulate in f32. XLA's cumsum would instead run log(n) reduce-window
    passes over the gathered plane — measured ~10x slower."""
    if rows.dtype == jnp.bfloat16:
        return jnp.dot(rows, tri, preferred_element_type=jnp.float32)
    return jnp.dot(
        rows.astype(jnp.float32), tri.astype(jnp.float32),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def _compact_hits(
    mask_hw: jax.Array,  # [B, Hs8, Tp, W1/16] u16 — kernel output, y-major
    rcnt_tm: jax.Array,  # [B, Tp, Hs8] i32 — kernel row counts, t-major
    B: int, T: int, Tp: int, Hs8: int, WB: int, caph: int,
):
    """Exact first-caph candidate-BIT compaction by hierarchical rank.

    Selects, per page, the first caph SET BITS of the mask plane in global
    (needle, scan) order — the reference's scan order (ncc.cpp:98-100 per
    needle; needles iterated offsets-outer, ncc.rs:587-655) — and returns
    each as a needle-local linear position, without ever materializing a
    dense index plane. Per-HIT positions (4 bytes each) replace the previous
    per-WORD (u16 index + u32 bits = 6 byte) wire format: the dense corpus
    measures ~1.07 set bits per nonzero word, so this is ~1.6x less wire on
    the device->host fetch — the pipeline's dominant off-chip cost — and the
    host replay consumes positions directly instead of walking bit masks.
    TPU-first design notes: stream compaction via top_k / sort / full-plane
    cumsum costs 150-400ms per 32-page dense wave (TopK cliffs above k~32,
    sorts are comparator networks, XLA cumsum is log-n reduce-window
    passes). Per-slot gathers and scatters are the other trap: TPU has no
    hardware gather, so each costs ~50-80ns PER ROW/ELEMENT regardless of
    row width, with a further ~3x cliff when the source plane exceeds
    ~25k rows. This formulation keeps exactly TWO gathers — the L1
    count-row gather (from a tiny nblk-row table) and the L0 halfword-row
    gather (quadded to stay under the row-count cliff) — and ONE packed
    scatter-max, deriving every exclusive-prefix lookup ("hits before the
    owning X") without further random access: at block level from the
    packed scatter's running max, and within gathered rows as a masked
    max over the row's own prefix matmul (fuses into the compare pass
    that locates the owning lane). Everything else is single-pass
    popcount sums, fused compare-counts, and small triangular matmuls.

      L2  block totals (_RPB mask rows/block) -> cumsum over blocks, then
          ONE packed scatter-max + running max locates every output
          slot's owning block AND its exclusive prefix (see the in-line
          identity; jnp.searchsorted is far worse — an XLA
          gather-per-probe while loop measured at 218ms per 32-page wave)
      L1  per-block row counts (emitted t-major by the kernel, which has
          the keep mask in registers — recomputing them here would
          popcount-reduce the whole mask plane, the compaction's largest
          HBM pass), gathered per slot [K, _RPB]; triangular-matmul prefix
          sums -> owning mask row (t, y)
      L0  the owning row's 16-bit HALF-WORDS gathered straight from the
          kernel's y-major u16 plane (index arithmetic, no transpose, no
          dtype bitcast); per-halfword popcounts + the same matmul trick
          -> owning halfword, whose value rides a onehot multiply-reduce
          out of the same pass
      L-1 the owning halfword's 16 bits, unpacked in-register -> bit

    Returns (pos [B, caph] i32 — the needle-LOCAL linear bit position
    y*(WB*8) + x per slot, ascending per needle = scan order, 0 padded —
    validity is positional: entry j is real iff j < min(nz_hits, caph);
    hcnt [B, T] i32 exact candidate count per needle (cap-independent, so
    truncation is detectable per needle); nz_hits [B] i32 = hcnt.sum()).
    The caller picks the off-chip wire encoding (_pack_pos or
    _encode_delta). Exact for every population; overflow (nz_hits > caph)
    remains suffix-truncation, handled by the caller's caph redo.
    """
    rcnt = rcnt_tm[:, :T]  # [B, T, Hs8] i32, already t-major (scan order)
    hcnt = rcnt.sum(axis=2, dtype=jnp.int32)  # [B, T] exact hits/needle
    M = T * Hs8  # t-major mask-row count
    Mp = ((M + _RPB - 1) // _RPB) * _RPB
    rr = rcnt.reshape(B, M)
    if Mp != M:  # zero counts in the pad zone: never selected
        rr = jnp.pad(rr, ((0, 0), (0, Mp - M)))
    nblk = Mp // _RPB
    # block totals; dtype pinned — x64 sum/cumsum default-promote to i64,
    # which the scatter below would then unsafely cast
    s2 = rr.reshape(B, nblk, _RPB).sum(axis=2, dtype=jnp.int32)

    c2 = jnp.cumsum(s2, axis=1, dtype=jnp.int32)  # [B, nblk] — tiny
    nz_hits = c2[:, -1]

    K = caph
    p = jnp.arange(K, dtype=jnp.int32)
    bidx = jnp.arange(B, dtype=jnp.int32)[:, None]
    # owning block + its exclusive prefix, from ONE packed scatter-max
    # (TPU scatters pay ~50-80ns per element — the former histogram-add +
    # scatter-max pair measured ~14 ms per dense 16-page wave; this halves
    # it). Identity: with e2 the exclusive block prefix, block j owns slots
    # [e2[j], c2[j]), and the owner of slot p is max{j : e2[j] <= p} —
    # empty blocks before the owner share its e2 but have smaller j, and
    # every block after it has e2 >= c2[owner] > p. So scatter-max the
    # packed (e2[j]·nblk + j) into bin e2[j] and take a running max over
    # slots: the max is lexicographic (e2, then j), both components
    # nondecreasing along the run, and unpacking yields before2 = e2[owner]
    # and blk = owner in one pass. e2[0] == 0 seeds slot 0, so the zeros
    # init is exact (it decodes to block 0 with prefix 0).
    e2 = c2 - s2
    if K * nblk + nblk < 2**31:
        packed = jnp.minimum(e2, jnp.int32(K)) * jnp.int32(nblk) + jnp.arange(
            nblk, dtype=jnp.int32
        )
        pmax = jnp.zeros((B, K + 1), jnp.int32)
        pmax = pmax.at[bidx, jnp.minimum(e2, K)].max(packed)
        run = jax.lax.cummax(pmax[:, :K], axis=1)
        blk = run % jnp.int32(nblk)
        before2 = run // jnp.int32(nblk)
    else:  # packed key would overflow i32 (enormous planes): two scatters
        hist = jnp.zeros((B, K + 1), jnp.int32)
        hist = hist.at[bidx, jnp.minimum(c2, K)].add(jnp.int32(1))
        blk = jnp.minimum(
            jnp.cumsum(hist[:, :K], axis=1, dtype=jnp.int32), nblk - 1
        )
        bmax = jnp.zeros((B, K + 1), jnp.int32)
        bmax = bmax.at[bidx, jnp.minimum(e2, K)].max(e2)
        before2 = jax.lax.cummax(bmax[:, :K], axis=1)
    j2 = p[None] - before2  # rank within block (>= 0 for every slot)

    # L1: owning mask row within the block. Row totals <= WB*8 exceed bf16's
    # exact-integer range, so this level's prefix matmul runs f32/HIGHEST.
    tri_rpb = jnp.asarray(np.triu(np.ones((_RPB, _RPB), np.float32)))
    rows1 = _rows(rr.reshape(B, nblk, _RPB), blk)  # [B, K, _RPB] i32
    cum1 = _triu_cum(rows1, tri_rpb)  # [B, K, _RPB] f32
    j2f = j2.astype(jnp.float32)
    rin = (cum1 <= j2f[:, :, None]).sum(axis=2, dtype=jnp.int32)
    rin = jnp.minimum(rin, _RPB - 1)
    # rank before the owning row, as a masked max over the row's own
    # exclusive prefix (excl1 nondecreasing, excl1[0] == 0 <= j2: exact) —
    # fuses into the compare pass above instead of a per-slot take_along
    excl1 = cum1 - rows1.astype(jnp.float32)
    before1 = jnp.max(jnp.where(excl1 <= j2f[:, :, None], excl1, 0.0), axis=2)
    j1 = j2f - before1  # rank within mask row (f32 integer, < WB*8)

    grow = blk * _RPB + rin  # [B, K] global t-major mask-row index
    t = grow // Hs8
    y = grow - t * Hs8
    # L0: the owning row's 16-bit HALF-WORDS, consumed directly from the
    # kernel's u16 plane (halfword h covers x in [16h, 16h+16) with
    # ascending bit = ascending x — gmat packs 2^(x%16) at column x//16,
    # no byte-order reinterpretation anywhere; the former u8 plane's
    # u8->u32 bitcast was a full-plane relayout measured ~1 ms/page).
    # Row (t, y) lives at y-major row y*Tp + t — index arithmetic replaces
    # a 16MB/page transposed copy. The gather reads QUADDED rows — 4
    # y-major mask rows (adjacent needles at the same y) per gathered
    # row, a flat-order-preserving reshape — because TPU gather cost is
    # per-DESCRIPTOR and jumps ~3x once the source exceeds ~25k rows
    # (measured: K rows from a 176k-row plane 13 ms/wave, from the
    # quadded 44k-row plane 7 including the unpack); the owning quarter
    # is then selected by a onehot multiply-reduce, exact because exactly
    # one lane is set. Pad-zone rows (only where found == False) can map
    # past T-1: clamp so the discarded gather stays in bounds.
    NHW = (WB * 8) // 16  # halfwords per mask row
    words4 = mask_hw.reshape(B, (Hs8 * Tp) // 4, 4 * NHW)
    row_idx = jnp.minimum(y * Tp + t, Hs8 * Tp - 1)
    raw4 = _rows(words4, row_idx >> 2)  # [B, K, 4*NHW] u16
    oh4 = (
        (row_idx & 3)[:, :, None] == jnp.arange(4, dtype=jnp.int32)
    )  # [B, K, 4]
    raw = jnp.sum(
        raw4.reshape(B, K, 4, NHW) * oh4[..., None].astype(jnp.uint16),
        axis=2,
        dtype=jnp.uint16,
    )  # [B, K, NHW] u16 — one nonzero term per sum: exact
    pcr = jax.lax.population_count(raw).astype(jnp.int32)  # <= 16: bf16-exact
    tri_hw = jnp.asarray(np.triu(np.ones((NHW, NHW), np.float32)))
    cum0 = _triu_cum(pcr.astype(jnp.bfloat16), tri_hw.astype(jnp.bfloat16))
    j1e = j1[:, :, None]
    word = jnp.minimum(
        (cum0 <= j1e).sum(axis=2, dtype=jnp.int32), NHW - 1
    )
    excl0 = cum0 - pcr.astype(jnp.float32)
    sel0 = excl0 <= j1e
    before0 = jnp.max(jnp.where(sel0, excl0, 0.0), axis=2)
    jb = (j1 - before0).astype(jnp.int32)  # rank within halfword, < 16
    # the owning halfword's VALUE rides a onehot multiply-reduce out of
    # the same pass (for found slots cum0[-1] = row count > j1, so the
    # onehot has exactly one lane set; elsewhere v is garbage and pos is
    # masked)
    oh = (sel0 & (cum0 > j1e)).astype(jnp.int32)
    v = jnp.sum(raw.astype(jnp.int32) * oh, axis=2, dtype=jnp.int32)  # [B, K]

    # L-1: the jb-th set bit of the owning halfword — branchless binary
    # search by half-window popcounts (4 fused elementwise steps over
    # [B, K]). Replaces a bit expansion + triangular matmul + compare-sum:
    # that version materialized 32x the data and ran a tiny-N MXU dot per
    # slot; this one is pure VPU work XLA fuses into one pass. Exact for
    # found slots (jb < popcount(v) there); elsewhere bit is garbage and pos
    # is masked below, exactly as before.
    bit = jnp.zeros_like(jb)
    rem = jb
    vv = v
    for w in (8, 4, 2, 1):
        lowmask = jnp.int32((1 << w) - 1)
        clow = jax.lax.population_count(vv & lowmask)
        go_hi = rem >= clow
        rem = jnp.where(go_hi, rem - clow, rem)
        bit = bit + jnp.where(go_hi, jnp.int32(w), jnp.int32(0))
        vv = jnp.where(go_hi, vv >> jnp.int32(w), vv & lowmask)

    found = p[None] < jnp.minimum(nz_hits, jnp.int32(K))[:, None]
    pos = jnp.where(found, y * jnp.int32(WB * 8) + word * 16 + bit, 0)
    return pos, hcnt, nz_hits


def _pack_pos(pos: jax.Array, plane_bits: int) -> tuple[jax.Array, jax.Array]:
    """Split i32 positions into (lo u16, hi) wire arrays — the d2h result
    fetch is the dense-corpus pipeline's long pole (the tunnel's d2h
    direction runs ~10x slower than h2d), so candidates ship at 2.5-4
    bytes instead of 4. The format is static per config — unpack_pos
    infers it from shapes/dtypes, nothing travels on the wire:
      plane_bits <= 2^20: hi is a nibble (pos < 2^20), packed 2/byte
                          -> 2.5 B/candidate
      plane_bits <= 2^24: hi u8  -> 3 B/candidate
      else:               hi u16 -> 4 B/candidate (no worse than i32)
    """
    K = pos.shape[-1]
    lo = pos.astype(jnp.uint16)  # modular: exactly pos & 0xffff
    hiv = jnp.right_shift(pos, 16)
    if plane_bits <= (1 << 20) and K % 2 == 0:
        h8 = hiv.astype(jnp.uint8)  # values < 16
        hi = h8[..., 0::2] | (h8[..., 1::2] << 4)
    elif plane_bits <= (1 << 24):
        hi = hiv.astype(jnp.uint8)
    else:
        hi = hiv.astype(jnp.uint16)
    return lo, hi


def unpack_pos(lo: np.ndarray, hi: np.ndarray, nv: int) -> np.ndarray:
    """Host decode of one page's packed candidate positions (see _pack_pos):
    the first ``nv`` valid entries as i32 needle-local linear positions."""
    K = lo.shape[0]
    out = lo[:nv].astype(np.int32)
    if nv == 0:
        return out
    if hi.dtype == np.uint8 and hi.shape[0] * 2 == K:  # nibble-packed
        h = np.empty(nv, np.int32)
        pairs = hi[: (nv + 1) // 2].astype(np.int32)
        h[0::2] = pairs & 15
        h[1::2] = pairs[: nv // 2] >> 4
    else:
        h = hi[:nv].astype(np.int32)
    return out | (h << 16)




_ESC = 0xFFFF  # u16 escape marker: the real value rides the escape array


def _encode_delta(
    pos: jax.Array,  # [B, K] i32 from _compact_hits (scan order, 0 padded)
    hcnt: jax.Array,  # [B, T] i32 exact per-needle counts
    nz: jax.Array,  # [B] i32 total candidates
    capw: int,
    kesc: int,
    plane_bits: int = 1 << 24,  # position upper bound (f32-exactness gate
    # for the onehot escape extraction; default keeps the scatter path)
) -> tuple[jax.Array, jax.Array]:
    """Fixed-width u16 delta encode of the candidate positions, on device.

    Candidates are ascending within each needle span (the compaction's scan
    order), and hits cluster along text rows, so the consecutive-position
    delta fits u16 for ~100% of dense-corpus candidates (measured max delta
    ~81k only at span STARTS, which carry absolute positions) — 2 bytes per
    candidate against _pack_pos's flat 2.5, and crucially the buffer is
    sized by MEASURED candidate count (capw), not the caph slot rung, which
    a power-of-two cap can overshoot 2x. The d2h result fetch this feeds is
    the pipeline's dominant off-chip cost (10-15 MB/s windows, wall time
    linear in bytes).

    Deltas >= 0xFFFF (sparse corpora: a needle's next hit rows away; every
    span start on tall planes) store the 0xFFFF marker in the stream and
    their true value, in stream order, in a small u32 escape array.

    Why fixed-width instead of a varint: a nibble-varint encoder measured
    ~1.9 B/candidate on the wire but cost ~0.75-1.6 ms/page of device time
    (the [B, K, groups] expansion + variable-length scatter scale with the
    cap), eating the fetch savings whenever the pipeline is device-bound —
    and after rung padding its fetch size matched this scheme anyway. Here
    the encode is one subtract + compare + clamp over [B, K] plus a
    1-element-per-candidate scatter for the (typically zero) escapes.

    Format:
      value v  = absolute position at a span start (first candidate of each
                 needle with hcnt > 0), else delta from the previous
                 candidate in the global stream order
      d16[j]   = v if v < 0xFFFF else the 0xFFFF marker, j < min(nv, capw)
      esc      = [count, v_0, v_1, ...] u32, escape values in stream order

    Span boundaries do NOT travel: the decoder recomputes them from hcnt
    exactly as the encoder did (cumsum clipped to the valid prefix).

    Returns (d16 [B, min(capw, K)] u16, esc [B, 1+kesc] u32 with the EXACT
    escape count in slot 0). Overflow — nv > capw or count > kesc —
    truncates a suffix; both are detectable exactly (nz and esc[0] are
    cap-independent), and the caller redoes at grown rungs.
    """
    B, K = pos.shape
    bidx = jnp.arange(B, dtype=jnp.int32)[:, None]
    # span starts: exclusive cumsum of counts, clipped into the buffer
    cs = jnp.cumsum(hcnt, axis=1, dtype=jnp.int32)
    excl = cs - hcnt
    starts = jnp.zeros((B, K + 1), jnp.bool_)
    starts = starts.at[bidx, jnp.minimum(excl, jnp.int32(K))].set(True)
    starts = starts[:, :K]
    prev = jnp.pad(pos, ((0, 0), (1, 0)))[:, :K]
    d = jnp.where(starts, pos, pos - prev)  # >= 0 (ascending within spans)
    valid = jnp.arange(K, dtype=jnp.int32)[None] < jnp.minimum(
        nz, jnp.int32(K)
    )[:, None]
    d = jnp.where(valid, d, jnp.int32(0))
    d16 = jnp.minimum(d, jnp.int32(_ESC)).astype(jnp.uint16)[:, : min(capw, K)]
    is_esc = valid & (d >= jnp.int32(_ESC))
    rank = jnp.cumsum(is_esc.astype(jnp.int32), axis=1, dtype=jnp.int32)
    nesc = rank[:, -1]
    # escape r lands at slot r (stream order). Extraction is a onehot
    # CONTRACTION, not a scatter: a [B, K] scatter pays ~50-80ns per
    # element on TPU (measured ~9.5 ms per dense 16-page wave, almost
    # always to extract ZERO escapes), while the masked [B, kesc, K]
    # sum is a few fused passes. Exact in f32 despite the 2^24 mantissa:
    # each (b, r) row of the onehot has at MOST ONE nonzero (rank is
    # strictly increasing on escape lanes), so the "sum" is a single
    # product of exact-f32 ints — valid whenever d < 2^24, guarded below
    # (d < plane_bits; pages with >= 2^24 window positions keep the
    # scatter).
    if plane_bits < (1 << 24):
        r = jnp.arange(1, kesc + 1, dtype=jnp.int32)
        sel = is_esc[:, None, :] & (rank[:, None, :] == r[None, :, None])
        vals = jnp.sum(
            sel.astype(jnp.float32) * d.astype(jnp.float32)[:, None, :],
            axis=2,
        )  # [B, kesc] exact integers
        esc = jnp.concatenate(
            [nesc[:, None].astype(jnp.uint32), vals.astype(jnp.uint32)],
            axis=1,
        )
    else:
        idx = jnp.where(is_esc & (rank <= kesc), rank, jnp.int32(kesc + 1))
        esc = jnp.zeros((B, 1 + kesc), jnp.uint32)
        esc = esc.at[bidx, idx].set(d.astype(jnp.uint32), mode="drop")
        esc = esc.at[:, 0].set(nesc.astype(jnp.uint32))
    return d16, esc


def decode_delta(
    d16: np.ndarray, esc: np.ndarray, hcnt: np.ndarray, nv: int
) -> np.ndarray:
    """Host decode of one page's _encode_delta stream: the first ``nv``
    candidate positions as i32, vectorized NumPy. The caller must have
    resolved overflows (nv <= len(d16), esc[0] <= len(esc)-1) via the redo
    path first; truncation here fails loudly."""
    if nv == 0:
        return np.zeros(0, np.int32)
    if nv > d16.shape[0]:
        raise ValueError(f"delta stream truncated: {d16.shape[0]} < {nv}")
    vals = d16[:nv].astype(np.int64)
    mk = np.flatnonzero(vals == _ESC)
    nesc = int(esc[0])
    if nesc != len(mk):
        raise ValueError(f"escape count mismatch: {nesc} != {len(mk)}")
    if nesc:
        if nesc > esc.shape[0] - 1:
            raise ValueError(f"escapes truncated: {esc.shape[0] - 1} < {nesc}")
        vals[mk] = esc[1 : 1 + nesc].astype(np.int64)
    # segmented inclusive cumsum: span starts carry absolute positions
    g = np.cumsum(vals)
    gm1 = np.empty(nv, np.int64)
    gm1[0] = 0
    gm1[1:] = g[:-1]
    cs = np.cumsum(hcnt.astype(np.int64))
    sa = np.minimum(cs - hcnt, nv)
    se = np.minimum(cs, nv)
    base = np.repeat(gm1[np.minimum(sa, nv - 1)], se - sa)
    return (g - base).astype(np.int32)


@functools.partial(
    jax.jit,
    static_argnames=("nw", "nh", "caph", "eps", "interpret", "wire", "capw",
                     "kesc"),
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
    caph: int,
    eps: float = 1e-3,
    interpret: bool = False,
    wire: str = "pos",
    capw: int = 0,
    kesc: int = 0,
):
    """Pallas-backed candidate search for one needle-size group, one page.

    ``wire`` picks the off-chip result encoding: "pos" returns packed
    absolute positions (below); "delta" returns (d16 u16 [<=capw], esc u32
    [1+kesc], hcnt, nz_hits) — the fixed-width delta stream of
    _encode_delta (2 B/candidate, buffer sized by measured candidate count
    rather than the caph rung), decoded by decode_delta. ``capw``/``kesc``
    are the caller-tracked stream/escape capacities; min(nz, caph) > capw
    or esc[0] > kesc means a truncated suffix and the caller must redo at
    bigger rungs.

    Returns for wire="pos" (pos_lo, pos_hi, hcnt, nz_hits):
      pos_lo/pos_hi — PACKED needle-LOCAL linear candidate positions in scan
           order (see _pack_pos for the 2.5-4 B/candidate wire format;
           unpack_pos decodes): pos = y*W1 + x with W1 =
           word_stride(W, nw)*32 (the padded window-column count), covering
           window (x, y) of the owning needle. The first min(nz_hits, caph)
           entries are the first caph candidates in global (needle, scan)
           order; entry ownership comes from hcnt (needle t owns entries
           [Σ_{<t} hcnt, …+hcnt[t]), clipped to caph). 0 padded past the
           valid prefix.
      hcnt [T] i32    — EXACT candidate count per needle (cap-independent,
           so overflow truncation is detectable per needle)
      nz_hits [1] i32 — total candidates (= hcnt.sum()); overflow iff
           nz_hits > caph, handled by the caller's caph redo. The compaction
           is exact first-caph (hierarchical rank, no lossy level), so
           suffix truncation is the ONLY loss mode.

    One global per-hit buffer instead of a [T, cap] plane cuts the
    device->host fetch ~T× (the per-needle padding is almost entirely
    empty), and packed 2.5-byte positions beat the earlier 6-byte word
    encoding ~2.4× — that fetch is the dominant per-page cost off-chip. The
    caller replays the exact f64 similarity per candidate position.
    """
    a, b, hcnt, nzh = _candidates_impl(
        img[None], needles, s_n, s2_n, threshold, nw, nh, caph, eps, interpret,
        wire, capw, kesc,
    )
    return a[0], b[0], hcnt[0], nzh


@functools.partial(
    jax.jit,
    static_argnames=("nw", "nh", "caph", "eps", "interpret", "wire", "capw",
                     "kesc"),
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
    caph: int,
    eps: float = 1e-3,
    interpret: bool = False,
    wire: str = "pos",
    capw: int = 0,
    kesc: int = 0,
):
    """Batched-page variant of ncc_candidates_pallas: one kernel dispatch
    sweeps a whole wave of same-shape pages (page axis = outermost grid dim)
    and the compacted position buffers come back as ONE [B, caph] array, so a
    wave costs one dispatch + one fetch instead of B of each — the off-chip
    round-trip tax was the dense-corpus pipeline's long pole.

    Returns (pos_lo [B, ...], pos_hi [B, ...], hcnt [B, T], nz_hits [B])
    for wire="pos", (d16 [B, <=capw] u16, esc [B, 1+kesc] u32, hcnt,
    nz_hits) for wire="delta"; per-page semantics identical to
    ncc_candidates_pallas.
    """
    return _candidates_impl(
        imgs, needles, s_n, s2_n, threshold, nw, nh, caph, eps, interpret,
        wire, capw, kesc,
    )


def _call_rows(kernel, grid, B, Hs8, Tp, Tt, NHW, W1, Ks, brows, tr, Wp,
               interpret, *args):
    """pallas_call wrapper for the banded kernel: the image input is the
    pre-banded [B, n_bands, brows, Wp] array (one aligned-chunk row band of
    brows = tr·cch >= band rows per grid step; the kernel reads the first
    band rows); outputs are the y-major u16 half-word mask plane
    [B, Hs8, Tp, NHW] and the band-major per-mask-row candidate counts
    [B, n_bands, Tp, tr] i32."""
    return pl.pallas_call(
        kernel,
        grid=grid,
        out_shape=(
            jax.ShapeDtypeStruct((B, Hs8, Tp, NHW), jnp.uint16),
            jax.ShapeDtypeStruct((B, Hs8 // tr, Tp, tr), jnp.int32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, brows, Wp), lambda b, i, yt: (b, yt, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tr, Tt, Ks), lambda b, i, yt: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tr, W1), lambda b, i, yt: (b, yt, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tr, W1), lambda b, i, yt: (b, yt, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Tt, 1), lambda b, i, yt: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Tt, 1), lambda b, i, yt: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((W1, NHW + 1), lambda b, i, yt: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, tr, Tt, NHW), lambda b, i, yt: (b, yt, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Tt, tr), lambda b, i, yt: (b, yt, i, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[pltpu.VMEM((Ks, W1), jnp.bfloat16)],
        interpret=interpret,
    )(*args)


def word_stride(W: int, nw: int) -> int:
    """Mask words per row (ceil of the window-column count / 32)."""
    return (W - nw + 1 + 31) // 32


def mask_plane_rows(H: int, W: int, nw: int, nh: int, T: int | None = None) -> int:
    """Padded mask-plane row count (Hs rounded to the band height this
    config will run at) — for callers sizing device-memory budgets."""
    tr = _pick_trows(H, W, nw, nh, T)
    return ((H - nh + 1 + tr - 1) // tr) * tr


def _vmem_rows(
    H: int, W: int, nw: int, nh: int, trows: int = _TROWS,
    T: int | None = None, Tt: int | None = None,
) -> int:
    """VMEM bytes for the banded kernel (_kernel_rows) at band height
    trows: only one band is resident (double-buffered), so the page height
    drops out entirely — tall pages stream through. Width still enters via
    the gmat packing matrix (quadratic in W1). Tt (explicit, or derived
    from T + this config) is the per-step needle tile; without either, the
    256 bound — sound because tile_t only exceeds 256 when it has ITSELF
    verified this config's fit, so a T-less gate at 256 never admits a
    config whose real tile overflows."""
    W1 = word_stride(W, nw) * 32
    Wp = W1 + nw - 1
    band = trows + nh - 1
    brows = -(-band // trows) * trows  # aligned-chunk img block rows
    Ks = band * nw
    if Tt is None:
        Tt = 256 if T is None else tile_t(T, H, W, nw, nh)
    return (
        2 * 4 * brows * Wp  # img band x2 (pipeline double buffering)
        + 2 * 2 * 4 * trows * W1  # sp + s2p bands x2
        + 2 * W1 * (W1 // 16 + 1)  # gmat incl. count column (bf16)
        + 2 * Ks * W1  # bf16 shifted-slice scratch
        + 2 * 2 * trows * Tt * Ks  # shifted needle tiles x2 (bf16)
        + 2 * 4 * Tt * W1  # acc + num transients
        + 2 * trows * Tt * (W1 // 8)  # bytes out block x2
        + 2 * 4 * trows * Tt  # rcnt out block x2
    )


_VMEM_BUDGET = 10 * 2**20


def pallas_mode(
    H: int, W: int, nw: int, nh: int, T: int | None = None
) -> str | None:
    """Whether the banded kernel handles this configuration: 'rows'
    (row-band streaming — page height never enters the VMEM budget), or
    None (XLA fallback — e.g. needles wider than 16 px, or pages so WIDE
    the packing matrix alone overflows VMEM). ``T`` (the group's needle
    count) sharpens the VMEM estimate to the config's actual tile size."""
    Hs = H - nh + 1
    if Hs < 8 or W - nw + 1 < 2 or nw > 16:
        return None
    if nh * nw * 65025 >= 2**24:
        return None  # acc/sp/s2p must be exact in f32 (no in-kernel nibble split)
    # no page-height gate: under the n·65025 < 2²⁴ bound above, window_stats
    # takes its MXU path (banded-selector matmul + nh-term adds), which
    # never forms H-length cumsums — arbitrarily tall pages stay exact
    if _vmem_rows(H, W, nw, nh, trows=8, T=T) < _VMEM_BUDGET:
        return "rows"
    return None


def pallas_supported(
    H: int, W: int, nw: int, nh: int, threshold: float, eps: float = 1e-3,
    T: int | None = None,
) -> bool:
    """Whether the Pallas path handles this configuration (exact-integer
    bounds, VMEM budget in either residency mode, positive algebraic
    threshold); callers use the XLA path otherwise."""
    if np.float32(threshold) - np.float32(eps) <= 0:
        return False  # num > c*den needs c > 0 to be equivalent to sim > c
    return pallas_mode(H, W, nw, nh, T) is not None
