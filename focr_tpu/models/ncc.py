"""The ncc template matcher, TPU-native.

Replaces the reference's per-needle AVX2 sweep (Searcher + ncc.cpp, SURVEY.md
§3.2) with one device pass per needle-size group computing ALL letters ×
subpixel offsets simultaneously, then an exact host-side f64 replay of the
similarity decision per candidate (TPU has no f64; the candidate integers are
exact so the replay is bit-identical to ncc.cpp:206-247).

Per page:
  invert -> [per size group] conv-correlate bank + window stats + ε-thresholded
  candidate compaction (ops/ncc.py) -> host f64 accept/reject + MAX_MATCHES
  scan-order cap (ncc.cpp:222-229) -> hits in reference iteration order
  (offsets outer, letters inner — ncc.rs:587-655) -> process_hits
  (models/post.py).
"""

from __future__ import annotations

import functools
import os
import sys
import time
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from focr_tpu.fonts.bank import Needle, build_needles
from focr_tpu.fonts.ft import Face
from focr_tpu.models.types import MAX_MATCHES, BoxSize, MatchWithLetter, RenderOptions
from focr_tpu.ops import ncc as ncc_ops
from focr_tpu.ops import packimg
from focr_tpu.ops import pallas_ncc
from focr_tpu.utils.device import force as device_force


def ncc_ops_pallas_call(inv_j, grp, dev, caph: int, wire: str = "pos",
                        capw: int = 0, kesc: int = 0):
    """Invoke the Pallas bitmask kernel for one size group (interpret mode
    off-TPU so CPU CI exercises the same code path). ``dev`` is the group's
    cached device-resident (bank, s_n, s2_n, threshold) tuple."""
    interpret = jax.default_backend() != "tpu"
    bank_j, s_n_j, s2_n_j, thr_j = dev
    return pallas_ncc.ncc_candidates_pallas(
        inv_j,
        bank_j,
        s_n_j,
        s2_n_j,
        thr_j,
        nw=grp.nw,
        nh=grp.nh,
        caph=caph,
        interpret=interpret,
        wire=wire,
        capw=capw,
        kesc=kesc,
    )


def ncc_ops_pallas_call_batch(inv_j, grp, dev, caph: int, wire: str = "pos",
                              capw: int = 0, kesc: int = 0):
    """Batched-page variant: ONE kernel dispatch sweeps a [B, H, W] wave
    (page axis = outermost grid dim) and returns [B, ...] result buffers, so
    a wave costs one dispatch + one fetch per size group instead of B of
    each — off-chip the per-call round trip dominates (the reference instead
    fans pages out with rayon, ncc.rs:839-847)."""
    interpret = jax.default_backend() != "tpu"
    bank_j, s_n_j, s2_n_j, thr_j = dev
    return pallas_ncc.ncc_candidates_pallas_batch(
        inv_j,
        bank_j,
        s_n_j,
        s2_n_j,
        thr_j,
        nw=grp.nw,
        nh=grp.nh,
        caph=caph,
        interpret=interpret,
        wire=wire,
        capw=capw,
        kesc=kesc,
    )

_CAP = MAX_MATCHES + 1024  # per-needle candidate capacity (ε superset), XLA path
# GLOBAL candidate capacity for the Pallas path. Device time is only mildly
# caph-sensitive, but the result fetch is caph-sized and per-page: start
# small (typical corpora need a few hundred candidates), auto-bump a group
# on its first overflow (one exact device re-dispatch) to 1.25x measured
# need, and remember the bumped size for subsequent pages.
_CAPH_START = 4096  # 10KB fetch (2.5B/candidate: packed local position)
_CAPH_MAX = 49152  # 120KB fetch
# Start rungs for the delta wire (wire="delta"): the u16 stream holds one
# slot per MEASURED candidate (grown on overflow redo + remembered rung, on
# packimg.vals_rung quarter-pow2 rungs — the fetch is padding-sensitive, a
# pow2 snap can waste 45% of the wire, while compiled-shape count stays
# bounded at 4/octave), and the u32 escape array covers the rare deltas
# >= 0xFFFF (typically zero on dense text).
_CAPW_START = 4096
_KESC_START = 64

_EMPTY = (
    np.zeros(0, np.int64),
    np.zeros(0, np.int64),
    np.zeros(0, np.float32),
)


def _matches_to_arrays(ms) -> tuple:
    """Host-searcher Match objects -> (xs, ys, sims) arrays."""
    if not ms:
        return _EMPTY
    return (
        np.array([m.x for m in ms], dtype=np.int64),
        np.array([m.y for m in ms], dtype=np.int64),
        np.array([m.similarity for m in ms], dtype=np.float32),
    )


@dataclass(frozen=True)
class HitStruct:
    """Array-of-hits form of get_hits output (reference iteration order) —
    the allocation-free fast path for post-processing big corpora."""

    needle_id: np.ndarray  # i32 [N] index into matcher.needles
    x: np.ndarray  # i64 [N]
    y: np.ndarray  # i64 [N]
    sim: np.ndarray  # f32 [N]
    matcher: "NccMatcher"

    def __len__(self) -> int:  # pragma: no cover - trivial
        return len(self.x)

    def to_objects(self) -> list[MatchWithLetter]:
        # delegate the per-hit construction (the bit-parity surface: letter,
        # w/h, float coercion) to the single implementation
        out: list[MatchWithLetter] = []
        i = 0
        N = len(self.x)
        while i < N:  # hits are grouped by needle (reference iteration order)
            j = i
            nid = self.needle_id[i]
            while j < N and self.needle_id[j] == nid:
                j += 1
            out.extend(
                self.matcher._needle_objects(
                    int(nid), (self.x[i:j], self.y[i:j], self.sim[i:j])
                )
            )
            i = j
        return out


def _pack_hits_payload(structs: list["HitStruct"]) -> bytes:
    """Serialize per-page hit structs for the multi-host result allgather:
    per page — n i64, then nid i32[n], x i32[n], y i32[n], sim f32[n].
    Coordinates fit i32 for any real page (the reference caps them at u16,
    ncc.rs:66-72); f32 similarity bits travel verbatim, so the decode side
    reconstructs bit-identical hits."""
    parts: list[bytes] = []
    for s in structs:
        parts.append(np.int64(len(s.x)).tobytes())
        parts.append(np.ascontiguousarray(s.needle_id, np.int32).tobytes())
        parts.append(s.x.astype(np.int32).tobytes())
        parts.append(s.y.astype(np.int32).tobytes())
        parts.append(np.ascontiguousarray(s.sim, np.float32).tobytes())
    return b"".join(parts)


def _unpack_hits_payload(buf: bytes) -> list[tuple]:
    """Inverse of _pack_hits_payload: list of (nid, x, y, sim) per page."""
    out: list[tuple] = []
    off = 0
    while off < len(buf):
        n = int(np.frombuffer(buf, np.int64, 1, off)[0])
        off += 8
        arrs = []
        for dt in (np.int32, np.int32, np.int32, np.float32):
            arrs.append(np.frombuffer(buf, dt, n, off))
            off += 4 * n
        out.append(tuple(arrs))
    return out


def _wave_size() -> int | None:
    """Explicit FOCR_NCC_WAVE override, else None (callers auto-size)."""
    env = os.environ.get("FOCR_NCC_WAVE")
    return int(env) if env else None


@functools.lru_cache(maxsize=1)
def _hbm_budget() -> int:
    """Device memory budget for sizing dispatch waves: 45% of the default
    device's reported capacity (the mask plane the budget is checked against
    is the single largest wave allocation, but the banded image blocks,
    window stats and compaction transients together reach a comparable
    total — 45% of real HBM keeps their sum under capacity with margin).
    Falls back to the former hard-coded 4 GB when the backend reports no
    stats (CPU/interpret test runs)."""
    try:
        stats = jax.local_devices()[0].memory_stats() or {}
        lim = stats.get("bytes_limit") or stats.get("bytes_reservable_limit")
        if lim:
            return int(int(lim) * 0.45)
    except Exception:  # noqa: BLE001 - stats are best-effort on every backend
        pass
    return 4 << 30


def _ink_crop(inv: np.ndarray, H: int, W: int, groups) -> tuple | None:
    """Ink-bbox crop (y0, x0, Hc, Wc) for a stacked inverted wave [*, H, W].

    Hits require a window with Σp > 0, and every such window lies within the
    ink bounding box expanded by one needle size: windows at local x=1/y=1
    then map exactly to the leftmost/topmost possible inked full-page
    windows, and the excluded local x=0/y=0 columns are provably Σp == 0 —
    or the reference's own x=0/y=0 exclusion when the crop hits the page
    edge (ncc.cpp:98). This is a device candidate FILTER: per the bit-parity
    invariant, widening it is safe, narrowing it is a correctness bug — keep
    the wave and sharded paths on this single implementation. Dims round up
    to 64 to bound compiled shapes. Returns None for a blank (all-white)
    wave: zero candidates everywhere, skip the device entirely.
    """
    sweepable = [g for g in groups if g.nh < H and g.nw < W]
    if not sweepable:
        return (0, 0, H, W)
    rows_ink = inv.any(axis=(0, 2))
    if not rows_ink.any():
        return None
    cols_ink = inv.any(axis=(0, 1))
    nz_r = np.flatnonzero(rows_ink)
    nz_c = np.flatnonzero(cols_ink)
    nh_m = max(g.nh for g in sweepable)
    nw_m = max(g.nw for g in sweepable)
    y0 = max(0, int(nz_r[0]) - nh_m)
    x0 = max(0, int(nz_c[0]) - nw_m)
    y1 = min(H, int(nz_r[-1]) + 1 + nh_m)
    x1 = min(W, int(nz_c[-1]) + 1 + nw_m)
    Hc = min(H - y0, -(-(y1 - y0) // 64) * 64)
    Wc = min(W - x0, -(-(x1 - x0) // 64) * 64)
    return (y0, x0, Hc, Wc)


def _host_searcher(page: np.ndarray):
    """Fastest available exact host searcher: native C++ kernel, else oracle."""
    try:
        from focr_tpu.native.ncc_cpu import NativeSearcher

        return NativeSearcher(page)
    except Exception:  # noqa: BLE001 - toolchain missing: degrade gracefully
        from focr_tpu.oracle.ncc_oracle import Searcher

        return Searcher(page)


class _ReplayTables:
    """Lazy per-page exact-integer material for the NumPy-fallback f64
    replay (the native C replay computes window stats inline from the u8
    page and needs none of this). Each plane is built at most once per page
    and shared across size groups."""

    def __init__(self, inv: np.ndarray):
        self.inv_u8 = np.ascontiguousarray(inv)
        self._i32 = None
        self._sq = None

    def i32(self) -> np.ndarray:
        if self._i32 is None:
            # window sums over these fit i32: n*255^2 < 2^24 (kernel-gated)
            self._i32 = self.inv_u8.astype(np.int32)
        return self._i32

    def sq(self) -> np.ndarray:
        if self._sq is None:
            i = self.i32()
            self._sq = i * i
        return self._sq


@dataclass(frozen=True)
class _Group:
    nh: int
    nw: int
    needle_ids: list[int]  # indices into the needle list, original order
    bank: np.ndarray  # [T, nh, nw] u8
    s_n: np.ndarray  # [T] i64
    s2_n: np.ndarray  # [T] i64


def _group_needles(needles: list[Needle]) -> list[_Group]:
    groups: dict[tuple[int, int], list[int]] = {}
    for i, nd in enumerate(needles):
        groups.setdefault(nd.pixels.shape, []).append(i)
    out = []
    for (nh, nw), ids in groups.items():
        out.append(
            _Group(
                nh=nh,
                nw=nw,
                needle_ids=ids,
                bank=np.stack([needles[i].pixels for i in ids]),
                s_n=np.array([needles[i].s_n for i in ids], dtype=np.int64),
                s2_n=np.array([needles[i].s2_n for i in ids], dtype=np.int64),
            )
        )
    return out


def exact_similarities(
    acc: np.ndarray, sp: np.ndarray, s2p: np.ndarray, s_n: int, s2_n: int, n: int
) -> np.ndarray:
    """The reference's f64 similarity, computed from exact integers.

    Mirrors ncc.cpp:233-238 (and the precompute ncc.rs:306-312):
      rnorm_p = 1/sqrt(s2p - sp*sp/n)        [division by n]
      num     = acc - (s_n*s_p) * (1/n)      [multiplication by 1/n]
      sim     = num * (rnorm_n * rnorm_p)
    """
    nf = np.float64(n)
    n_recip = np.float64(1.0) / nf
    s_n64 = np.asarray(s_n, dtype=np.float64)  # scalar or per-candidate array
    s2_n64 = np.asarray(s2_n, dtype=np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        rnorm_n = np.float64(1.0) / np.sqrt(s2_n64 - s_n64 * s_n64 / nf)
        norm_p = s2p.astype(np.float64) - (sp.astype(np.float64) * sp.astype(np.float64)) / nf
        rnorm_p = np.float64(1.0) / np.sqrt(norm_p)
        num = acc.astype(np.float64) - (s_n64 * sp.astype(np.float64)) * n_recip
        return num * (rnorm_n * rnorm_p)


class NccMatcher:
    """One (font, size, alphabet, offsets, box policy) matching configuration."""

    def __init__(
        self,
        face: Face,
        alphabet: str,
        ropts: RenderOptions,
        box_size: BoxSize = BoxSize.ALPHABET,
        x_bits: int = 0,
        y_bits: int = 0,
        padding: tuple[int, int] = (0, 0),
        threshold: float = 0.8,
        device_kernel: str = "auto",
        wire: str | None = None,
    ):
        import focr_tpu

        focr_tpu.enable_compile_cache()
        self.face = face
        self.alphabet = alphabet
        self.ropts = ropts
        self.threshold = float(threshold)
        self.needles = build_needles(face, alphabet, ropts, box_size, x_bits, y_bits, padding)
        self.groups = _group_needles(self.needles)
        if device_kernel == "auto":
            # measured on v5e (distinct-input amortized, 74-needle letter
            # page): Pallas 0.09ms/sweep vs XLA conv 0.25ms — the fused
            # VMEM-resident kernel wins ~2.8x by never materializing the
            # dense similarity plane in HBM. XLA remains the fallback for
            # configs pallas_supported() rejects and for non-TPU backends
            # (interpret-mode Pallas is test-only).
            device_kernel = "pallas" if jax.default_backend() == "tpu" else "xla"
        assert device_kernel in ("pallas", "xla")
        self.device_kernel = device_kernel
        # Pallas result wire encoding: "delta" (default) ships delta +
        # nibble-varint candidate positions (~1.9 B/candidate dense vs the
        # flat 2.5 of "pos") — the d2h fetch is the pipeline's dominant
        # off-chip cost and, unlike h2d, the transport does NOT compress it
        # (measured: fetch wall time scales linearly with bytes at equal
        # slope for structured and random content). FOCR_NCC_WIRE overrides
        # for A/B runs.
        if wire is None:
            wire = os.environ.get("FOCR_NCC_WIRE", "delta")
        assert wire in ("delta", "pos")
        self.wire = wire
        self._caph: dict[tuple[int, int], int] = {}  # (nh, nw) -> current caph
        # (nh, nw) -> current delta-stream slot / escape rungs
        # (wire="delta"); grow on overflow redos exactly like _caph
        self._capw: dict[tuple[int, int], int] = {}
        self._kesc: dict[tuple[int, int], int] = {}
        # observability: fused Pallas sweeps dispatched (the multi-host smoke
        # asserts the kernel tier actually ran, not just that results match)
        self.n_pallas_waves = 0
        # device-resident per-group constants (bank, s_n, s2_n, threshold):
        # uploaded once PER DEVICE, reused for every page (re-uploading per
        # page costs a host->device round trip per group on the remote
        # transport). Keyed by device so the mesh-sharded scatter path can
        # pin a page's whole sweep to one chip.
        self._dev_groups: dict[object, list[tuple]] = {}
        # keyed by the Mesh VALUE (hash = devices + axis names), not id():
        # a GC'd mesh whose address a fresh, different mesh reuses must MISS
        # here, and two equal meshes sharing one compiled fn is correct.
        # Device keys are safe as-is: jax Device objects are client-owned
        # singletons alive for the process, never reallocated.
        self._sharded_fns: dict[tuple, object] = {}  # (mesh, group idx) -> fn
        self._fused_fns: dict[tuple, object] = {}  # fused wave-sweep jits
        self._last_depth = 2  # final pipeline depth of the last corpus run

    def _wave_for(self, pages: list[np.ndarray]) -> int:
        """Pages per batched dispatch wave. Small waves with the pipelined
        dispatch beat one big wave: the remote transport's d2h bandwidth
        swings 25-200 MB/s between windows, and in a slow window a single
        corpus-sized wave serializes upload -> compute -> fetch -> collect
        with zero overlap (measured 64-page corpus: wave 8-16 at 33-40
        pages/s vs wave 64 at 12-22 in the same windows). 8 beats 16 on the
        same corpus (measured grid, 3 interleaved reps: wave 8 at 63.5-79.8
        pages/s vs wave 16 at 44.4-73.7): halving the wave halves the
        pipeline's fill/drain cost — at 8 waves per 64-page corpus the
        non-overlapped first-upload + last-fetch ends shrink from ~2/4 of
        the run to ~2/8 — while per-wave RPC floors stay amortized. The
        memory bound still shrinks waves for tall pages (largest per-group
        mask plane under the device HBM budget — see _hbm_budget).
        FOCR_NCC_WAVE overrides."""
        env = _wave_size()
        if env is not None:
            return env
        if not pages:
            return 8
        # the memory bound is the max per-group mask plane over EVERY page
        # shape in the corpus, not pages[0]: _dispatch_wave buckets by shape
        # WITHIN a wave, so a small-pages-first corpus sized from its first
        # page would overshoot the budget on a later tall-page bucket
        per = 0
        for H, W in {p.shape for p in pages}:
            for g in self.groups:
                if g.nh >= H or g.nw >= W:
                    continue
                Hs8 = pallas_ncc.mask_plane_rows(
                    H, W, g.nw, g.nh, len(g.needle_ids)
                )
                Tp = pallas_ncc.pad_t(len(g.needle_ids), H, W, g.nw, g.nh)
                WB = pallas_ncc.word_stride(W, g.nw) * 8
                per = max(per, Hs8 * Tp * WB)
        if per == 0:
            return 8
        # the memory bound must dominate the throughput floor: a wave dips
        # below 8 pages (and below the dispatch's {1,2,4} padding steps)
        # whenever one group's mask plane alone approaches the HBM budget —
        # flooring at 8 here would materialize an 8x-per transient and OOM
        # on tall-page/large-bank configs
        fit = _hbm_budget() // per
        if fit >= 8:
            return 8
        # match the dispatch's {1, 2, 4} padding steps so the PADDED batch
        # stays within the bound too
        return 4 if fit >= 4 else 2 if fit >= 2 else 1

    def _fused_sweep(self, inv_j, specs: tuple, device) -> tuple:
        """ONE jitted executable sweeping every Pallas-able size group of a
        wave: the remote transport is latency-bound (an RPC round trip costs
        10-500ms window-dependent, while bandwidth sits at GB/s), so one
        execute call for all groups beats one per group. ``specs`` is a
        tuple of (group index, caph, capw, kesc); returns the per-group
        outs tuple."""
        key = (inv_j.shape, specs, device)
        fn = self._fused_fns.get(key)
        if fn is None:
            groups = self.groups
            devg = self._device_groups(device)
            interpret = jax.default_backend() != "tpu"
            wire = self.wire

            def f(inv):
                outs = []
                for gi, caph, capw, kesc in specs:
                    grp = groups[gi]
                    bank_j, s_n_j, s2_n_j, thr_j = devg[gi]
                    outs.append(
                        pallas_ncc.ncc_candidates_pallas_batch(
                            inv, bank_j, s_n_j, s2_n_j, thr_j,
                            nw=grp.nw, nh=grp.nh, caph=caph,
                            interpret=interpret, wire=wire, capw=capw,
                            kesc=kesc,
                        )
                    )
                return tuple(outs)

            fn = jax.jit(f)
            self._fused_fns[key] = fn
        self.n_pallas_waves += 1
        return fn(inv_j)

    def _device_groups(self, device=None) -> list[tuple]:
        groups = self._dev_groups.get(device)
        if groups is None:
            put = (lambda a: jnp.asarray(a)) if device is None else (
                lambda a: jax.device_put(a, device)
            )
            thr_j = put(np.float32(self.threshold))
            groups = [
                (put(g.bank), put(g.s_n), put(g.s2_n), thr_j)
                for g in self.groups
            ]
            self._dev_groups[device] = groups
        return groups

    def get_hits(
        self,
        page: np.ndarray,
        verbose: bool = False,
        raw: bool = False,
        out=None,
        sync: bool = False,
    ) -> list[MatchWithLetter]:
        """Device search + exact host recheck; hits in reference order
        (get_hits, ncc.rs:544-721).

        ``sync``: serialize per-group dispatch with a forcing device fence
        (utils.device.force) so the
        verbose elapsed/ns-per-pixel lines are true wall-clock measurements
        (the reference measures each search, ncc.rs:657-666; the pipelined
        default can only estimate — async device work has no observable
        per-group span). Slower: defeats dispatch pipelining by design."""
        meas: dict | None = {} if sync else None
        d = self._fetch_wave(self._dispatch_wave([page], measure=meas))[0]
        return self._collect_page(d, verbose, raw, out, meas=meas)

    def get_hits_many(
        self, pages: list[np.ndarray], verbose: bool = False, struct: bool = False,
        post=None,
    ):
        """Multi-page pipeline: device sweeps dispatch in waves of pages with
        one wave prefetched ahead of the host replay, so uploads/compute
        overlap collection and dispatch depth stays bounded (unbounded
        dispatch has tripped device FailedPrecondition on long corpora).
        Each wave's results fetch in ONE device_get transfer (the reference's
        rayon fan-out, ncc.rs:839-847, re-expressed as device-queue
        pipelining).

        ``post``: optional per-page callable applied to each page's hits
        inside the pipeline's worker pool (the reference computes
        process_hits inside the same rayon task as get_hits, ncc.rs:842-845);
        the returned list then holds post(hits) per page. Fusing it here
        overlaps post-processing with the next wave's transfer."""
        import concurrent.futures as cf

        wave = self._wave_for(pages)
        out: list = []
        # three pipeline stages on three threads: a DISPATCH worker does the
        # invert/crop + synchronous upload + enqueue (the upload blocks on the
        # link for ~190ms/wave — CPU-idle wait that must not serialize with
        # the replay), a FETCH worker blocks on each wave's device_get, and
        # the main thread replays (page-parallel — the exact-f64 replay is
        # C++/NumPy releasing the GIL). Steady-state wall per wave is then
        # max(upload, device, fetch, replay) instead of upload + replay.
        # verbose stays serial: its per-search stderr lines must interleave in
        # reference order.
        with (
            cf.ThreadPoolExecutor(max_workers=1) as dpool,
            cf.ThreadPoolExecutor(max_workers=1) as pool,
            cf.ThreadPoolExecutor(max_workers=4) as cpool,
        ):
            def collect_one(d, verb):
                hits = self._collect_page(d, verb, False, None, struct)
                return post(hits) if post is not None else hits

            def collect_wave(fetched) -> list:
                if verbose:
                    return [collect_one(d, verbose) for d in fetched]
                return list(cpool.map(lambda d: collect_one(d, False), fetched))

            from collections import deque

            # up to `depth` waves in flight beyond the one being collected:
            # the upload of wave k+2 streams while wave k's results drain
            # d2h, so the half-duplex-ish tunnel link never idles during
            # collect. Bounded depth on purpose: unbounded dispatch has
            # tripped device FailedPrecondition on long corpora. ADAPTIVE
            # (unless FOCR_NCC_DEPTH pins it): the remote transport
            # occasionally stalls a single transfer for seconds (measured:
            # the same wave shape 4.7 vs 71.6 pages/s at depth 2 vs 4 in the
            # same minute, and one-off 10-70s fetches) — when a wave's fetch
            # takes 3x the running median, later waves should keep
            # uploading/sweeping behind it, so the pipeline deepens for the
            # rest of the run. Depth changes no compiled shape, making this
            # the one transport-adaptive knob that is compile-hazard-free.
            # depth 3 default: at 8-page waves the per-wave latency share
            # doubles vs the old 16-page waves, and depth 2 measured 35
            # pages/s where depth 3 ran 63-80 on the same corpus (the
            # adaptive bump below only reacts to 3x-median STALLS, not to
            # uniform latency, so the start value must already cover the
            # steady state)
            env_depth = os.environ.get("FOCR_NCC_DEPTH")
            state = {
                "depth": int(env_depth) if env_depth else 3,
                "fixed": bool(env_depth),
                "hist": [],
            }

            def fetch_timed(f):
                disp = f.result()
                t0 = time.perf_counter()
                fetched = self._fetch_wave(disp)
                dt = time.perf_counter() - t0
                h = state["hist"]
                if not state["fixed"] and len(h) >= 2:
                    med = sorted(h)[len(h) // 2]
                    if dt > max(0.5, 3.0 * med) and state["depth"] < 4:
                        state["depth"] += 1
                h.append(dt)
                return fetched

            pending: deque[cf.Future] = deque()
            for s in range(0, len(pages), wave):
                dfut = dpool.submit(self._dispatch_wave, pages[s : s + wave])
                pending.append(pool.submit(fetch_timed, dfut))
                if len(pending) > state["depth"]:
                    out.extend(collect_wave(pending.popleft().result()))
            while pending:
                out.extend(collect_wave(pending.popleft().result()))
            self._last_depth = state["depth"]  # observability + tests
        return out

    def get_hits_many_sharded(
        self, pages: list[np.ndarray], mesh, verbose: bool = False,
        struct: bool = False, post=None,
    ):
        """Multi-chip corpus search: pages batch over the mesh's devices
        (data-parallel, SURVEY.md §2.5/§5.8), one sharded sweep per
        needle-size group; the host replay is unchanged. Bit-identical to
        get_hits_many. Pages must share one shape (caller buckets)."""
        from focr_tpu.parallel.decode import make_sharded_ncc_fn

        if not pages:
            return []
        if self.device_kernel == "pallas" and jax.process_count() > 1:
            if not verbose:
                # each process Pallas-scatters its OWN addressable chips over
                # its shard of the corpus, then the replayed hit arrays are
                # allgathered so every process returns the full ordered
                # result — the kernel tier keeps its measured ~2.8x edge
                # under multi-host instead of falling back to the XLA path
                return self._get_hits_many_multiproc(pages, mesh, struct, post)
            # verbose diagnostics print per-search lines during collect; a
            # process only collects its own shard, so the reference-ordered
            # stderr stream needs the replicated-results XLA path below
            print(
                "focr_tpu: multi-host --verbose run: using the sharded XLA "
                "ncc path (per-search diagnostics need every page's replay "
                "on every process)",
                file=sys.stderr,
            )
        elif self.device_kernel == "pallas":
            return self._scatter_waves(
                pages, list(mesh.devices.flat), verbose, struct, post
            )
        from focr_tpu.parallel.mesh import fetch_global, pages_sharding, put_global

        t_dispatch = time.perf_counter()
        H, W = pages[0].shape
        assert all(p.shape == (H, W) for p in pages), "bucket pages by shape first"
        inv = np.empty((len(pages), H, W), np.uint8)
        for k, p in enumerate(pages):
            if p.dtype != np.uint8:
                p = p.astype(np.uint8)
            np.subtract(255, p, out=inv[k])
        B = len(pages)
        # ink-bbox crop (shared _ink_crop derivation — deterministic from
        # the corpus content, so every process computes the identical crop
        # and the global shard shapes agree)
        crop = _ink_crop(inv, H, W, self.groups)
        sweepable = any(g.nh < H and g.nw < W for g in self.groups)
        if crop is None or not sweepable:
            empty_plan = [(g, "empty", None) for g in self.groups]
            return [
                post(h) if post is not None else h
                for b in range(B)
                for h in [self._collect_page(
                    (pages[b], inv[b], empty_plan, t_dispatch, None, (0, 0, H, W)),
                    verbose, False, None, struct,
                )]
            ]
        y0, x0, Hc, Wc = crop
        inv_c = np.ascontiguousarray(inv[:, y0 : y0 + Hc, x0 : x0 + Wc])
        pad = (-B) % mesh.size
        if pad:
            # pad with zeros = inverted WHITE pages (pad_batch's 255 fill is
            # for un-inverted pages; 255 here would be solid ink and burn a
            # full sweep per filler page)
            inv_p = np.concatenate(
                [inv_c, np.zeros((pad, Hc, Wc), dtype=np.uint8)], axis=0
            )
        else:
            inv_p = inv_c
        inv_j = put_global(inv_p, pages_sharding(mesh))

        group_outs: list[tuple[_Group, str, object]] = []
        for gi, grp in enumerate(self.groups):
            if grp.nh >= H or grp.nw >= W or grp.nh >= Hc or grp.nw >= Wc:
                group_outs.append((grp, "empty", None))
                continue
            # memoized per (mesh, group): a fresh @jax.jit closure per call
            # would retrace/recompile on every corpus invocation
            fn = self._sharded_fns.get((mesh, gi))
            if fn is None:
                fn = make_sharded_ncc_fn(
                    mesh, grp.bank, grp.s_n, grp.s2_n, self.threshold, cap=_CAP
                )
                self._sharded_fns[(mesh, gi)] = fn
            group_outs.append((grp, "xla", fn(inv_j)))

        fetched = fetch_global(
            [o for _, k, o in group_outs if o is not None]
        )  # one transfer wave for the whole corpus (multi-host: §5.8 gather)
        it = iter(fetched)
        per_group = [(g, k, next(it) if o is not None else None) for g, k, o in group_outs]

        results = []
        for b in range(B):
            plan = [
                (g, k, None if o is None else tuple(np.asarray(a[b]) for a in o))
                for g, k, o in per_group
            ]
            hits = self._collect_page(
                (pages[b], inv[b], plan, t_dispatch, None, crop),
                verbose, False, None, struct,
            )
            results.append(post(hits) if post is not None else hits)
        return results

    def _scatter_waves(
        self, pages: list[np.ndarray], devices: list, verbose: bool,
        struct: bool, post,
    ) -> list:
        """Host-side Pallas scatter over ``devices``: each device gets a
        round-robin SUB-BATCH of every wave (pages d, d+D, d+2D, ... for
        device d) and sweeps it with the batched Pallas kernel — the same
        data parallelism as the shard_map XLA path, but every chip runs the
        fused single-chip kernel (the 2.8x-faster tier) over its whole
        sub-batch in one dispatch. Each wave fetches in ONE device_get
        transfer across all devices. Results are bit-identical to every
        other engine tier (same candidate superset + exact host replay)."""
        import concurrent.futures as cf

        D = len(devices)
        wave = self._wave_for(pages) * D
        out: list = []
        pending = None

        def collect(d):
            hits = self._collect_page(d, verbose, False, None, struct)
            return post(hits) if post is not None else hits

        def fetch_scatter(disp):
            # restore corpus page order from the round-robin deal
            sub_waves, n_sub = disp
            per_dev = self._fetch_waves([w for _, w in sub_waves])
            merged: list = [None] * n_sub
            for (d, _), fetched in zip(sub_waves, per_dev):
                for k, tup in enumerate(fetched):
                    merged[d + k * D] = tup
            return merged

        # page-parallel collect like get_hits_many: the exact-f64 replay
        # + fused post would otherwise serialize the whole wave on the
        # main thread while every chip idles (verbose stays serial for
        # reference-ordered stderr). Dispatch (invert/crop + blocking
        # uploads to every chip) runs on its own worker thread for the
        # same reason as get_hits_many: the upload wait must overlap the
        # replay, not serialize with it.
        with (
            cf.ThreadPoolExecutor(max_workers=1) as dpool,
            cf.ThreadPoolExecutor(max_workers=4) as cpool,
        ):
            def dispatch_scatter(sub):
                return (
                    [
                        (d, self._dispatch_wave(sub[d::D], device=devices[d]))
                        for d in range(D)
                        if sub[d::D]
                    ],
                    len(sub),
                )

            def collect_wave(dfut) -> list:
                fetched = fetch_scatter(dfut.result())
                if verbose:
                    return [collect(d) for d in fetched]
                return list(cpool.map(collect, fetched))

            for s in range(0, len(pages), wave):
                dfut = dpool.submit(dispatch_scatter, pages[s : s + wave])
                if pending is not None:
                    out.extend(collect_wave(pending))
                pending = dfut
            if pending is not None:
                out.extend(collect_wave(pending))
        return out

    def _get_hits_many_multiproc(
        self, pages: list[np.ndarray], mesh, struct: bool, post
    ) -> list:
        """Pallas tier under multi-host (SURVEY.md §5.8): each process
        Pallas-scatters its OWN addressable mesh chips over a strided shard
        of the corpus (pages[rank::P] for owner rank), replays its shard's
        hits exactly on the host, then the per-page hit ARRAYS — not device
        buffers — are allgathered over DCN so every process reconstructs the
        identical full ordered result list. Exchanging replayed arrays keeps
        the exact-f64 decision work done once per page while the collective
        stays a fixed-shape byte buffer (jax.experimental.multihost_utils).

        Bit parity: each page is produced by exactly ONE process via the
        same scatter machinery as the single-process path; the wire carries
        i32 coords and raw f32 similarity bits, both lossless."""
        from jax.experimental import multihost_utils

        pid = jax.process_index()
        # processes owning mesh chips sweep; others only join the collectives
        owners = sorted({d.process_index for d in mesh.devices.flat})
        mine_dev = [d for d in mesh.devices.flat if d.process_index == pid]
        if pid in owners:
            rank, nown = owners.index(pid), len(owners)
            mine = pages[rank::nown]
            structs = (
                self._scatter_waves(mine, mine_dev, False, True, None)
                if mine
                else []
            )
        else:
            structs = []
        payload = _pack_hits_payload(structs)

        lens = np.asarray(
            multihost_utils.process_allgather(np.int64(len(payload)))
        ).reshape(-1)
        buf = np.zeros(int(lens.max()) if len(lens) else 0, np.uint8)
        buf[: len(payload)] = np.frombuffer(payload, np.uint8)
        all_bufs = np.asarray(multihost_utils.process_allgather(buf))

        # parse each owner's payload once, then deal pages back out in
        # global order (page g belongs to owner rank g % nown)
        per_proc: dict[int, list] = {
            p: _unpack_hits_payload(all_bufs[p, : int(lens[p])].tobytes())
            for p in owners
        }
        out = []
        for g in range(len(pages)):
            nid, xs, ys, sims = per_proc[owners[g % len(owners)]][g // len(owners)]
            hits = (
                HitStruct(
                    needle_id=nid,
                    x=xs.astype(np.int64),
                    y=ys.astype(np.int64),
                    sim=sims,
                    matcher=self,
                )
                if struct
                else [
                    MatchWithLetter(
                        self.needles[i].letter, int(x), int(y),
                        self.needles[i].pixels.shape[1],
                        self.needles[i].pixels.shape[0], float(s),
                    )
                    for i, x, y, s in zip(
                        nid.tolist(), xs.tolist(), ys.tolist(), sims.tolist()
                    )
                ]
            )
            out.append(post(hits) if post is not None else hits)
        return out

    def _upload_wave(self, inv_up: np.ndarray, put):
        """Ship one inverted wave [B, Hc, Wc] to the device. FOCR_NCC_PACK=1
        opts into the bit-packed form (ops/packimg.py: mask bits + nonzero
        values, exactly reconstructed on device — parity-neutral by
        construction, ~0.44x of raw bytes on dense text). Raw is the DEFAULT
        on purpose: the axon transport measures the packed upload at the
        SAME wall time as raw (198 vs 199 ms median per 8.4 MB wave — the
        link evidently compresses or content-chunks low-entropy uploads
        transparently) while the on-device decode adds ~50 ms/wave, and a
        co-located host's h2d is never upload-bound. The packed path exists
        for transports that bill true wire bytes."""
        if os.environ.get("FOCR_NCC_PACK") != "1":
            return put(inv_up)
        mask, vals = packimg.pack_wave(inv_up)
        pad = packimg.vals_rung(vals.size) - vals.size
        if pad:
            vals = np.pad(vals, (0, pad))
        return packimg.unpack_wave(put(mask), put(vals), W=inv_up.shape[2])

    def _dispatch_wave(self, batch: list[np.ndarray], device=None, measure=None):
        """Phase 1 for a WHOLE wave of pages: one stacked u8 upload per page
        shape and ONE fused device execute for every Pallas-able size group
        (_fused_sweep), so a wave of B pages costs ~2 device calls instead
        of B × groups — the per-call round trip is the dominant off-chip
        cost (the reference amortizes differently: rayon threads,
        ncc.rs:839-847).

        ``device`` pins the wave's sweeps to one chip (the mesh scatter
        path); None uses the default device. ``measure``: optional dict —
        when given, each group's dispatch is serialized with a forcing
        device fence and measure[(nh, nw)] accumulates its true
        wall-clock seconds (the --verbose-sync mode; kills pipelining and
        dispatch fusion by design). Returns an opaque wave object for
        _fetch_wave(s).

        The page axis pads to the next of {1, 2, 4, 8, 16, 24, ...} with
        inverted-white zero pages (Σp == 0 ⇒ zero candidates), bounding both
        the compiled-batch-size count and the padded upload waste."""
        t0 = time.perf_counter()
        by_shape: dict[tuple[int, int], list[int]] = {}
        for i, p in enumerate(batch):
            by_shape.setdefault(p.shape, []).append(i)
        buckets = []
        for (H, W), idxs in by_shape.items():
            B = len(idxs)
            # pad the page axis to {1, 2, 4} then multiples of 8: bounded
            # compiled-shape variants without the 8x upload/sweep tax on
            # single-page calls (get_hits / --verbose-sync measure 1 page)
            Bp = B if B in (1, 2) else 4 if B <= 4 else -(-B // 8) * 8
            # one-pass u8 invert straight into the padded upload buffer
            # (255 - x never underflows for u8 x; an i32 detour would cost
            # two extra 4x-sized passes over the wave — measured at up to
            # ~0.5s per 16MB wave on this host)
            inv_pad = np.zeros((Bp, H, W), np.uint8)
            for k, i in enumerate(idxs):
                p = batch[i]
                if p.dtype != np.uint8:  # tolerate wider dtypes (0..255 values)
                    p = p.astype(np.uint8)
                np.subtract(255, p, out=inv_pad[k])
            inv_all = inv_pad[:B]
            # ink-bbox crop (_ink_crop): only crop bytes cross the link and
            # only the crop is swept; candidates map back to full-page
            # coordinates at collect time and the exact replay runs on the
            # FULL page, so bit parity is untouched.
            crop = _ink_crop(inv_pad, H, W, self.groups)
            sweep_any = any(g.nh < H and g.nw < W for g in self.groups)
            if crop is None or not sweep_any:
                plans = [(grp, "empty", None, None) for grp in self.groups]
                buckets.append((idxs, inv_all, plans, (0, 0, H, W)))
                continue
            y0, x0, Hc, Wc = crop
            inv_up = (
                inv_pad
                if (Hc, Wc) == (H, W)
                else np.ascontiguousarray(inv_pad[:, y0 : y0 + Hc, x0 : x0 + Wc])
            )
            put = (
                jnp.asarray
                if device is None
                else (lambda a: jax.device_put(a, device))
            )
            inv_j = self._upload_wave(inv_up, put)
            if measure is not None:
                # exclude the upload from the first group's measured span
                # (force, not block_until_ready: the remote backend can ack
                # enqueues early, which would fold the upload into the span)
                device_force(inv_j)
            plans: list[tuple | None] = [None] * len(self.groups)
            fspecs: list[tuple] = []  # (gi, caph, capw, kesc) to fuse
            for gi, (grp, dev) in enumerate(
                zip(self.groups, self._device_groups(device))
            ):
                if grp.nh >= H or grp.nw >= W or grp.nh >= Hc or grp.nw >= Wc:
                    # past the page (reference semantics) or past the crop
                    # (a window overlapping ink cannot fit: Hc >= 2·nh + ink)
                    plans[gi] = (grp, "empty", None, None)
                    continue
                tg = time.perf_counter()
                if self.device_kernel == "pallas" and pallas_ncc.pallas_supported(
                    Hc, Wc, grp.nw, grp.nh, self.threshold,
                    T=len(grp.needle_ids),
                ):
                    key = (grp.nh, grp.nw)
                    caph = self._caph.get(key, _CAPH_START)
                    capw = self._capw.get(key, _CAPW_START)
                    kesc = self._kesc.get(key, _KESC_START)
                    if measure is None:
                        fspecs.append((gi, caph, capw, kesc))
                        continue
                    # sync mode: per-group dispatch so the span is per-group
                    outs = ncc_ops_pallas_call_batch(
                        inv_j, grp, dev, caph=caph, wire=self.wire,
                        capw=capw, kesc=kesc,
                    )
                    plans[gi] = (grp, "pallas", outs, caph)
                else:
                    bank_j, s_n_j, s2_n_j, thr_j = dev
                    # XLA fallback stays per page (device-side slices of the
                    # one stacked upload; no extra host->device transfers)
                    outs = [
                        ncc_ops.ncc_candidates(
                            inv_j[k],
                            bank_j,
                            s_n_j,
                            s2_n_j,
                            thr_j,
                            nw=grp.nw,
                            nh=grp.nh,
                            cap=_CAP,
                        )
                        for k in range(B)
                    ]
                    plans[gi] = (grp, "xla", outs, None)
                if measure is not None:
                    # fence by FULL fetch, not device_force: a pure transfer
                    # of existing buffers involves no host-side jit compile,
                    # so no one-time trace/compile of the fence reduction can
                    # land inside the measured span (the pipeline re-fetches
                    # these buffers later; double-fetch is part of sync
                    # mode's documented cost)
                    jax.block_until_ready(outs)
                    jax.device_get(outs)
                    key = (grp.nh, grp.nw)
                    measure[key] = measure.get(key, 0.0) + time.perf_counter() - tg
            if fspecs:
                fused = self._fused_sweep(inv_j, tuple(fspecs), device)
                for (gi, caph, _, _), outs in zip(fspecs, fused):
                    plans[gi] = (self.groups[gi], "pallas", outs, caph)
            buckets.append((idxs, inv_all, plans, crop))
        return batch, buckets, t0, device

    def _fetch_waves(self, waves: list) -> list[list]:
        """Phase 2 transfer: fetch EVERY wave's device outputs in ONE
        jax.device_get (it issues async copy_to_host for all leaves before
        blocking, so the whole fetch costs one transfer round trip — per-call
        latency, not bandwidth, dominates off-chip), then split the batched
        [B, ...] buffers into per-page plan tuples for _collect_page."""
        leaves: list = []
        for _, buckets, _, _ in waves:
            for _, _, plans, _ in buckets:
                for _, kind, outs, _ in plans:
                    if kind == "pallas":
                        leaves.append(outs)
                    elif kind == "xla":
                        leaves.extend(outs)
        fetched = jax.device_get(leaves)
        it = iter(fetched)
        out: list[list] = []
        for batch, buckets, t0, device in waves:
            per_page: list = [None] * len(batch)
            for idxs, inv_all, plans, crop in buckets:
                page_plans: list[list] = [[] for _ in idxs]
                for grp, kind, _, meta in plans:
                    if kind == "empty":
                        for pp in page_plans:
                            pp.append((grp, "empty", None))
                    elif kind == "pallas":
                        # (lo, hi, ...) for wire="pos"; (d16, esc, ...) for
                        # wire="delta" — per-page slicing is identical
                        a, b, hcnt, nzh = next(it)
                        for k, pp in enumerate(page_plans):
                            pp.append(
                                (grp, "pallas",
                                 (a[k], b[k], hcnt[k], nzh[k : k + 1], meta))
                            )
                    else:
                        for pp in page_plans:
                            pp.append((grp, "xla", next(it)))
                for k, i in enumerate(idxs):
                    per_page[i] = (
                        batch[i], inv_all[k], page_plans[k], t0, device, crop
                    )
            out.append(per_page)
        return out

    def _fetch_wave(self, wave) -> list:
        """Single-wave variant of _fetch_waves."""
        return self._fetch_waves([wave])[0]

    def _collect_page(
        self, dispatched, verbose: bool, raw: bool, out, struct: bool = False,
        meas: dict | None = None,
    ):
        """Phase 2: fetch one page's device results, replay exact f64.

        ``meas``: per-group measured wall seconds from a sync dispatch
        (--verbose-sync); None = pipelined default, where per-group time is
        unobservable and the page span is attributed by search share."""
        page, inv, plan, t_dispatch, device, crop = dispatched
        H, W = page.shape
        cy0, cx0, Hc, Wc = crop  # device sweep ran on this ink-bbox crop
        thr_f32 = np.float32(self.threshold)
        thr_f64 = np.float64(thr_f32)

        # verbose timing spans dispatch -> now (device work + transfer are
        # async, so per-group wall time is unobservable; attribute the page
        # span to groups by their share of searches)
        page_elapsed = time.perf_counter() - t_dispatch
        total_searches = max(sum(len(g.needle_ids) for g in self.groups), 1)
        time_label = (
            "measured wall time, split evenly"
            if meas is not None
            else "estimated: page span attributed evenly"
        )

        # per needle: (xs i64[], ys i64[], sims f32[]) — arrays, not objects;
        # MatchWithLetter objects are built only at the API boundary (a dense
        # page has ~26k hits: building objects per hit dominates host time)
        per_needle: dict[int, tuple] = {}
        needle_s: dict[int, float] = {}  # attributed per-search seconds
        t00 = t_dispatch  # the reference's "overall" span starts at get_hits
        oracle_searcher = None
        tables = None  # (inv_i32, inv_i32², inv_u8) pixel planes for replay
        for grp, kind, outs in plan:
            n = grp.nh * grp.nw
            if kind == "empty":
                for i in grp.needle_ids:
                    per_needle[i] = _EMPTY
                    needle_s[i] = 0.0
                continue
            if meas is not None:
                elapsed = meas.get((grp.nh, grp.nw), 0.0)
            else:
                elapsed = page_elapsed * len(grp.needle_ids) / total_searches
            for i in grp.needle_ids:
                needle_s[i] = elapsed / max(len(grp.needle_ids), 1)
            if kind == "pallas":
                if tables is None:
                    tables = _ReplayTables(inv)
                oracle_searcher = self._pallas_group(
                    grp, outs, tables, thr_f64, per_needle,
                    page, oracle_searcher, verbose, H, W, elapsed, device,
                    time_label, crop,
                )
                continue
            idx, acc, sp, s2p, counts = (np.asarray(o) for o in outs)
            W2 = Wc - grp.nw  # the sweep ran on the crop; remap below
            cap_eff = idx.shape[1]
            for ti, i in enumerate(grp.needle_ids):
                nd = self.needles[i]
                if counts[ti] > cap_eff:
                    if grp.nw > 16:
                        # host kernels cap at 16-px needles (the reference
                        # panics there, ncc.rs:392); re-run this needle's
                        # sweep on DEVICE with a cap sized to its count
                        per_needle[i] = self._redo_wide(grp, ti, nd, inv, int(counts[ti]))
                        continue
                    # candidate overflow (pathological): exact host fallback
                    # (native C++ kernel when the toolchain is available,
                    # NumPy oracle otherwise — both bit-identical)
                    if oracle_searcher is None:
                        oracle_searcher = _host_searcher(page)
                    ms = oracle_searcher.search(nd.pixels, self.threshold)
                    per_needle[i] = _matches_to_arrays(ms)
                    continue
                k = int(counts[ti])
                cand = slice(0, min(k, cap_eff))
                sim = exact_similarities(
                    acc[ti, cand], sp[ti, cand], s2p[ti, cand],
                    int(grp.s_n[ti]), int(grp.s2_n[ti]), n,
                )
                keep = (sim != np.inf) & (sim > thr_f64)
                lins = idx[ti, cand][keep].astype(np.int64)
                sims = sim[keep]
                if len(lins) >= MAX_MATCHES:
                    print(f"WARN got >= {MAX_MATCHES} matches", file=sys.stderr)
                lins_t = lins[:MAX_MATCHES]
                per_needle[i] = (
                    cx0 + 1 + lins_t % W2,
                    cy0 + 1 + lins_t // W2,
                    sims[:MAX_MATCHES].astype(np.float32),
                )
            if verbose:
                per_search_ms = elapsed * 1000.0 / max(len(grp.needle_ids), 1)
                ns_per_px = elapsed * 1e9 / (W * H) / max(len(grp.needle_ids), 1)
                print(
                    f"[group {grp.nw}x{grp.nh}] {len(grp.needle_ids)} searches "
                    f"~{per_search_ms:.2f}ms each ({time_label}; "
                    f"{ns_per_px:.2f} ns/pixel)",
                    file=sys.stderr,
                )

        # assemble in reference iteration order (offsets outer, letters inner)
        parts: list[tuple[int, tuple]] = []
        n_hits = 0
        for i, nd in enumerate(self.needles):
            arrs = per_needle.get(i, _EMPTY)
            if verbose:
                # per-search line in the reference's format (ncc.rs:657-666);
                # device work is async so the elapsed fields carry the page
                # span attributed evenly across searches (the group summary
                # above flags the estimate)
                s = needle_s.get(i, 0.0)
                print(
                    f"`{nd.letter}` [{_f32_debug(nd.offset[0])}, {_f32_debug(nd.offset[1])}] "
                    f"needle size {nd.pixels.shape[1]}x{nd.pixels.shape[0]} hits {len(arrs[0])} "
                    f"elapsed {int(s * 1000)}ms ({s * 1e9 / (W * H):.2f} ns/pixel)",
                    file=sys.stderr,
                )
            if raw and out is not None:
                self._print_raw(nd, self._needle_objects(i, arrs), out)
            parts.append((i, arrs))
            n_hits += len(arrs[0])
        if verbose:
            print(f"overall {(time.perf_counter() - t00) * 1000.0:.4f}ms", file=sys.stderr)
            print(f"hits: {n_hits}", file=sys.stderr)
            _print_count_table(
                (self.needles[i].letter, len(arrs[0])) for i, arrs in parts
            )
        if struct:
            return self._make_struct(parts)
        all_hits: list[MatchWithLetter] = []
        for i, arrs in parts:
            all_hits.extend(self._needle_objects(i, arrs))
        return all_hits

    def _needle_objects(self, i: int, arrs: tuple) -> list[MatchWithLetter]:
        nd = self.needles[i]
        nh, nw = nd.pixels.shape
        return [
            MatchWithLetter(nd.letter, int(x), int(y), nw, nh, float(s))
            for x, y, s in zip(*arrs)
        ]

    def _make_struct(self, parts: list[tuple[int, tuple]]) -> "HitStruct":
        sizes = [len(arrs[0]) for _, arrs in parts]
        total = sum(sizes)
        nid = np.repeat(
            np.array([i for i, _ in parts], dtype=np.int32),
            np.array(sizes, dtype=np.int64),
        )
        if total:
            xs = np.concatenate([arrs[0] for _, arrs in parts]).astype(np.int64)
            ys = np.concatenate([arrs[1] for _, arrs in parts]).astype(np.int64)
            sims = np.concatenate([arrs[2] for _, arrs in parts]).astype(np.float32)
        else:
            xs = np.zeros(0, np.int64)
            ys = np.zeros(0, np.int64)
            sims = np.zeros(0, np.float32)
        return HitStruct(needle_id=nid, x=xs, y=ys, sim=sims, matcher=self)

    def _redo_wide(self, grp, ti, nd, inv, count) -> tuple:
        """Re-dispatch ONE needle's sweep with a count-sized cap (exact device
        path; used when candidates overflowed and no host kernel supports the
        needle width). Returns the (xs, ys, sims) array triple. Rounding the
        cap to a power of two bounds recompiles."""
        cap = 1 << max(int(np.ceil(np.log2(count + 1))), 11)
        thr_f64 = np.float64(np.float32(self.threshold))
        idx, acc, sp, s2p, counts = (
            np.asarray(o)
            for o in ncc_ops.ncc_candidates(
                jnp.asarray(inv),
                jnp.asarray(nd.pixels[None]),
                jnp.asarray(grp.s_n[ti : ti + 1]),
                jnp.asarray(grp.s2_n[ti : ti + 1]),
                jnp.asarray(np.float32(self.threshold)),
                nw=grp.nw,
                nh=grp.nh,
                cap=cap,
            )
        )
        assert counts[0] <= cap  # count was measured by the first pass
        n = grp.nh * grp.nw
        cand = slice(0, int(counts[0]))
        sim = exact_similarities(
            acc[0, cand], sp[0, cand], s2p[0, cand],
            int(grp.s_n[ti]), int(grp.s2_n[ti]), n,
        )
        keep = (sim != np.inf) & (sim > thr_f64)
        W2 = inv.shape[1] - grp.nw
        lins = idx[0, cand][keep].astype(np.int64)
        sims = sim[keep]
        if len(lins) >= MAX_MATCHES:
            print(f"WARN got >= {MAX_MATCHES} matches", file=sys.stderr)
        lins_t = lins[:MAX_MATCHES]
        return (
            1 + lins_t % W2,
            1 + lins_t // W2,
            sims[:MAX_MATCHES].astype(np.float32),
        )


    def _pallas_group(
        self, grp, outs, tables, thr_f64, per_needle,
        page, oracle_searcher, verbose, H, W, elapsed, device=None,
        time_label: str = "estimated: page span attributed evenly",
        crop=None,
    ):
        """One dispatched size group: fetch the Pallas positions + host replay.

        ``crop`` = (y0, x0, Hc, Wc): the sweep ran on this ink-bbox slice of
        the page; positions decode crop-locally and remap to full-page
        coordinates before the replay (which always runs on the full page)."""
        n = grp.nh * grp.nw
        cy0, cx0, Hc, Wc = crop if crop is not None else (0, 0, H, W)
        a_a, b_a, hcnt, nzh, meta = outs
        a_a, b_a, hcnt, nzh = (
            np.asarray(o) for o in (a_a, b_a, hcnt, nzh)
        )
        caph_used = meta if meta is not None else a_a.shape[0]
        delta = self.wire == "delta"
        inv_u8 = tables.inv_u8
        # delta-wire stream overflows: the u16 buffer is sized by measured
        # candidates (capw) and the escape array by measured escapes (kesc)
        # — both counts are exact even when truncated (like nzh), so a redo
        # at remembered bigger rungs is always sufficient, the same
        # discipline as _caph
        wire_overflow = delta and (
            min(int(nzh[0]), caph_used) > a_a.shape[0]
            or int(b_a[0]) > b_a.shape[0] - 1
        )
        if wire_overflow or (
            int(nzh[0]) > caph_used and caph_used < _CAPH_MAX
        ):
            # global candidate-cap overflow (suffix truncation — the rank
            # compaction is exact first-caph, so this is the only loss mode):
            # grow this group's caph to the next quarter-pow2 rung
            # (packimg.vals_rung) above 1.125x the MEASURED candidate count
            # (nzh is exact), with a 1.5x growth floor so adversarially
            # creeping density cannot cascade redos, capped at _CAPH_MAX —
            # then re-dispatch THIS page once (an exact device redo beats
            # per-needle host fallbacks). A denser later page re-grows the
            # same way. Rungs are deliberately coarse, NOT a tight
            # 1024-granular fit: a tight fit makes the compiled cap a
            # function of corpus content (and of the page-parallel
            # collect's benign growth races), so every new corpus minted a
            # fresh fused-sweep executable — a 10-25s tunnel compile
            # landing MID-RUN (measured: a 16-page wave collapsing from 64
            # to 4.7 pages/s). At most 4 rungs per octave hit the
            # persistent compile cache across runs/processes; rungs matter
            # beyond the fetch (which the delta wire already decouples from
            # caph) because the compaction's per-slot rank work scales with
            # caph — a pow2 snap was measured to cost ~0.4-0.8 ms/page of
            # pure slack at dense-corpus caps.
            if int(nzh[0]) > caph_used:
                need = max(
                    int(nzh[0]) + (int(nzh[0]) >> 3),
                    caph_used + caph_used // 2,
                )
                caph_new = min(_CAPH_MAX, packimg.vals_rung(need))
                # benign race under page-parallel collect: concurrent
                # overflows each redo exactly and last-write-wins on the
                # cached cap; a later page that needs more simply regrows
                self._caph[(grp.nh, grp.nw)] = caph_new
            else:
                caph_new = caph_used  # wire-rung overflow only
            capw_new = kesc_new = 0
            if delta:
                key = (grp.nh, grp.nw)
                # one u16 slot per kept candidate, 12.5% headroom, snapped
                # to a quarter-pow2 rung (packimg.vals_rung) and remembered
                # — future waves of this corpus dispatch at a rung that fits
                want = min(int(nzh[0]), caph_new)
                # clamp to caph: the stream can never hold more candidates
                capw_new = min(
                    packimg.vals_rung(want + (want >> 3)), caph_new
                )
                # escapes: exact count among the kept prefix, scaled by the
                # cap growth when the count also overflowed
                kept = max(min(int(nzh[0]), caph_used), 1)
                nesc = -(-int(b_a[0]) * want // kept)
                kesc_new = max(
                    _KESC_START, packimg.vals_rung(nesc + (nesc >> 3))
                ) if nesc else _KESC_START
                self._capw[key] = capw_new = max(
                    self._capw.get(key, _CAPW_START), capw_new
                )
                self._kesc[key] = kesc_new = max(
                    self._kesc.get(key, _KESC_START), kesc_new
                )
            # the redo stays on the page's dispatch device: in the mesh
            # scatter path a default-device redo would re-upload every
            # group's constants to chip 0 and contend with its sweeps
            dev = next(
                d for g, d in zip(self.groups, self._device_groups(device)) if g is grp
            )
            inv_crop = np.ascontiguousarray(
                inv_u8[cy0 : cy0 + Hc, cx0 : cx0 + Wc]
            )  # redo sweeps the same crop so positions decode identically
            inv_dev = (
                jnp.asarray(inv_crop) if device is None
                else jax.device_put(inv_crop, device)
            )
            redo = ncc_ops_pallas_call(
                inv_dev, grp, dev, caph=caph_new, wire=self.wire,
                capw=capw_new, kesc=kesc_new,
            )
            a_a, b_a, hcnt, nzh = (
                np.atleast_1d(np.asarray(o)) for o in jax.device_get(redo)
            )
            caph_used = caph_new
            if delta and int(b_a[0]) > b_a.shape[0] - 1:
                # the scaled escape estimate undershot (possible only when
                # the count ALSO overflowed and the tail escapes more than
                # the kept prefix): one terminal redo at the exact count
                kesc_new = packimg.vals_rung(int(b_a[0]) + 8)
                self._kesc[(grp.nh, grp.nw)] = max(
                    self._kesc.get((grp.nh, grp.nw), _KESC_START), kesc_new
                )
                redo = ncc_ops_pallas_call(
                    inv_dev, grp, dev, caph=caph_new, wire=self.wire,
                    capw=capw_new, kesc=kesc_new,
                )
                a_a, b_a, hcnt, nzh = (
                    np.atleast_1d(np.asarray(o))
                    for o in jax.device_get(redo)
                )
        W1 = pallas_ncc.word_stride(W, grp.nw) * 32  # full-page pos = y*W1 + x

        T = len(grp.needle_ids)
        caph = caph_used
        nv = min(int(nzh[0]), caph)  # valid prefix (0-padded past it)
        if delta:
            pos_v = pallas_ncc.decode_delta(a_a, b_a, hcnt, nv)
        else:
            pos_v = pallas_ncc.unpack_pos(a_a, b_a, nv)  # i32 [nv], crop-local
        if (Hc, Wc) != (H, W):
            # remap crop-local positions to full-page linear positions: the
            # replay (native or NumPy) decodes with the full-page row length
            W1c = pallas_ncc.word_stride(Wc, grp.nw) * 32
            ysv, xsv = np.divmod(pos_v, np.int32(W1c))
            pos_v = (ysv + np.int32(cy0)) * np.int32(W1) + (xsv + np.int32(cx0))
        # per-needle candidate spans from the exact counts (hcnt is
        # cap-independent, so truncation is detectable per needle)
        ends_all = np.cumsum(hcnt.astype(np.int64))
        starts_all = ends_all - hcnt
        # global-cap overflow: candidates past the caph-th were dropped;
        # exactly the needles whose spans extend past caph are suspect
        if int(nzh[0]) > caph:
            first_suspect = int(np.searchsorted(ends_all, caph, side="right"))
        else:
            first_suspect = T
        ws = np.minimum(starts_all, nv)
        we = np.minimum(ends_all, nv)
        native = None
        if nv and first_suspect > 0:
            from focr_tpu.native import ncc_cpu

            if ncc_cpu.available():  # toolchain gate; real bugs must raise
                native = ncc_cpu.replay_group(
                    inv_u8, pos_v,
                    ws[:first_suspect], we[:first_suspect],
                    grp.bank, grp.s_n, grp.s2_n,
                    float(thr_f64), W1, MAX_MATCHES,
                )

        if native is None:
            # NumPy replay: candidate positions arrive in (needle, scan)
            # order already — no bit unpacking
            wins = np.lib.stride_tricks.sliding_window_view(
                tables.i32(), (grp.nh, grp.nw)
            )
            wins_sq = np.lib.stride_tricks.sliding_window_view(
                tables.sq(), (grp.nh, grp.nw)
            )
            lin = pos_v.astype(np.int64)
            nid_c = np.searchsorted(ends_all, np.arange(nv), side="right")
            ys = lin // W1
            xs = lin % W1
            if len(ys):
                bank32 = grp.bank.astype(np.int32)
                sim = np.empty(len(ys), np.float64)
                # chunked: the [chunk, nh, nw] i32 gathers are the peak host
                # allocation (a dense page at caph=49152 carries that many
                # candidates; unchunked that is GB-scale transient memory)
                CH = 65536
                for c0 in range(0, len(ys), CH):
                    sl = slice(c0, min(c0 + CH, len(ys)))
                    w_cand = wins[ys[sl], xs[sl]]
                    acc = (w_cand * bank32[nid_c[sl]]).sum(axis=(1, 2), dtype=np.int32)
                    sp = w_cand.sum(axis=(1, 2), dtype=np.int32)
                    s2p = wins_sq[ys[sl], xs[sl]].sum(axis=(1, 2), dtype=np.int32)
                    sim[sl] = exact_similarities(
                        acc, sp, s2p, grp.s_n[nid_c[sl]], grp.s2_n[nid_c[sl]], n
                    )
            else:
                sim = np.zeros(0, np.float64)
            cs = np.minimum(starts_all, nv)
            ce = np.minimum(ends_all, nv)
        else:
            out_x, out_y, out_sim, n_counts, n_warn = native

        for ti, i in enumerate(grp.needle_ids):
            nd = self.needles[i]
            if ti >= first_suspect:
                # truncated by the global candidate cap (pathological
                # density): exact host fallback for this needle only
                if oracle_searcher is None:
                    oracle_searcher = _host_searcher(page)
                per_needle[i] = _matches_to_arrays(
                    oracle_searcher.search(nd.pixels, self.threshold)
                )
                continue
            if native is not None:
                if n_warn[ti]:
                    print(f"WARN got >= {MAX_MATCHES} matches", file=sys.stderr)
                off = int(ws[ti])
                k = int(n_counts[ti])
                # i32 views, not i64 copies: _make_struct widens ONCE after
                # concatenation; ~600 per-needle astype calls/page were real
                per_needle[i] = (
                    out_x[off : off + k],
                    out_y[off : off + k],
                    out_sim[off : off + k],
                )
                continue
            s = slice(int(cs[ti]), int(ce[ti]))
            keep = (sim[s] != np.inf) & (sim[s] > thr_f64)
            if keep.sum() >= MAX_MATCHES:
                print(f"WARN got >= {MAX_MATCHES} matches", file=sys.stderr)
            per_needle[i] = (
                xs[s][keep][:MAX_MATCHES].astype(np.int64),
                ys[s][keep][:MAX_MATCHES].astype(np.int64),
                sim[s][keep][:MAX_MATCHES].astype(np.float32),
            )
        if verbose:
            per_search_ms = elapsed * 1000.0 / max(len(grp.needle_ids), 1)
            ns_per_px = elapsed * 1e9 / (W * H) / max(len(grp.needle_ids), 1)
            print(
                f"[pallas group {grp.nw}x{grp.nh}] {len(grp.needle_ids)} searches "
                f"~{per_search_ms:.2f}ms each ({time_label}; "
                f"{ns_per_px:.2f} ns/pixel)",
                file=sys.stderr,
            )
        return oracle_searcher

    def get_hits_native(
        self, page: np.ndarray, verbose: bool = False, raw: bool = False, out=None
    ) -> list[MatchWithLetter]:
        """All-host execution tier: the C++ kernel sweeps each size group's
        whole needle bank OpenMP-parallel (the native analogue of the
        reference's default C path + rayon fan-out). Same results as the
        device and oracle paths."""
        from focr_tpu.native.ncc_cpu import NativeSearcher

        searcher = NativeSearcher(page)
        H, W = page.shape
        per_needle: dict[int, list[MatchWithLetter]] = {}
        needle_s: dict[int, float] = {}  # measured group time, split evenly
        t00 = time.perf_counter()
        for grp in self.groups:
            if grp.nh >= H or grp.nw >= W:
                for i in grp.needle_ids:
                    per_needle[i] = []
                continue
            t0 = time.perf_counter()
            results = searcher.search_many(grp.bank, self.threshold)
            elapsed = time.perf_counter() - t0
            for ti, i in enumerate(grp.needle_ids):
                nd = self.needles[i]
                needle_s[i] = elapsed / max(len(grp.needle_ids), 1)
                per_needle[i] = [
                    MatchWithLetter(nd.letter, m.x, m.y, m.w, m.h, m.similarity)
                    for m in results[ti]
                ]
            if verbose:
                per_search_ms = elapsed * 1000.0 / max(len(grp.needle_ids), 1)
                ns_per_px = elapsed * 1e9 / (W * H) / max(len(grp.needle_ids), 1)
                print(
                    f"[native group {grp.nw}x{grp.nh}] {len(grp.needle_ids)} searches "
                    f"~{per_search_ms:.2f}ms each (group-measured average; "
                    f"{ns_per_px:.2f} ns/pixel)",
                    file=sys.stderr,
                )
        all_hits: list[MatchWithLetter] = []
        for i, nd in enumerate(self.needles):
            hits = per_needle.get(i, [])
            if verbose:
                s = needle_s.get(i, 0.0)
                print(
                    f"`{nd.letter}` [{_f32_debug(nd.offset[0])}, {_f32_debug(nd.offset[1])}] "
                    f"needle size {nd.pixels.shape[1]}x{nd.pixels.shape[0]} hits {len(hits)} "
                    f"elapsed {int(s * 1000)}ms ({s * 1e9 / (W * H):.2f} ns/pixel)",
                    file=sys.stderr,
                )
            if raw and out is not None:
                self._print_raw(nd, hits, out)
            all_hits.extend(hits)
        if verbose:
            print(f"overall {(time.perf_counter() - t00) * 1000.0:.4f}ms", file=sys.stderr)
            print(f"hits: {len(all_hits)}", file=sys.stderr)
            _print_char_counts(all_hits)
        return all_hits

    def get_hits_oracle(
        self, page: np.ndarray, verbose: bool = False, raw: bool = False, out=None
    ) -> list[MatchWithLetter]:
        """Host-only differential-oracle path (the reference's --rust flag,
        ncc.rs:532-533, 651-655): NumPy Searcher per needle, same results.
        Used by tests and the CLI's --rust to cross-check the device path."""
        from focr_tpu.oracle.ncc_oracle import Searcher

        t00 = time.perf_counter()
        searcher = Searcher(page)
        all_hits: list[MatchWithLetter] = []
        for nd in self.needles:
            nh, nw = nd.pixels.shape
            H, W = page.shape
            if nh >= H or nw >= W:
                hits: list[MatchWithLetter] = []
            else:
                t0 = time.perf_counter()
                ms = searcher.search(nd.pixels, self.threshold)
                elapsed = time.perf_counter() - t0
                hits = [
                    MatchWithLetter(nd.letter, m.x, m.y, m.w, m.h, m.similarity) for m in ms
                ]
                if verbose:
                    print(
                        f"`{nd.letter}` [{_f32_debug(nd.offset[0])}, {_f32_debug(nd.offset[1])}] "
                        f"needle size {nw}x{nh} hits {len(hits)} elapsed "
                        f"{int(elapsed * 1000)}ms ({elapsed * 1e9 / (W * H):.2f} ns/pixel)",
                        file=sys.stderr,
                    )
            if raw and out is not None:
                self._print_raw(nd, hits, out)
            all_hits.extend(hits)
        if verbose:
            print(f"overall {(time.perf_counter() - t00) * 1000.0:.4f}ms", file=sys.stderr)
            print(f"hits: {len(all_hits)}", file=sys.stderr)
            _print_char_counts(all_hits)
        return all_hits

    def _print_raw(self, nd: Needle, hits: list[MatchWithLetter], out) -> None:
        """The 11-field --raw CSV per hit (ncc.rs:683-698)."""
        m = self.face.metrics
        to_px = np.float32(1.0) / np.float32(m.units_per_em) * np.float32(self.ropts.size)
        gid = self.face.glyph_for_char(nd.letter)
        tb = self.face.typographic_bounds(gid).scale(float(to_px))
        bearing_x = np.float32(tb.x0)
        for h in hits:
            cx, cy = h.center
            print(
                f"{ord(nd.letter)},{_f32(cx)},{_f32(cy)},{h.x},{h.y},{h.w},{h.h},"
                f"{_f32(bearing_x)},{_f32(nd.corrected_offset[1])},"
                f"{_f32(nd.offset[0])},{_f32(nd.offset[1])}",
                file=out,
            )


def _print_char_counts(all_hits: list[MatchWithLetter]) -> None:
    """Per-char hit totals from hit objects (ncc.rs:709-718)."""
    _print_count_table((h.letter, 1) for h in all_hits)


def _print_count_table(letter_counts) -> None:
    """Per-char totals, sorted by (count, char), zeros skipped
    (ncc.rs:709-718)."""
    counts: dict[str, int] = {}
    for letter, k in letter_counts:
        if k:
            counts[letter] = counts.get(letter, 0) + k
    for letter, count in sorted(counts.items(), key=lambda kv: (kv[1], kv[0])):
        print(f"`{letter}` {count}", file=sys.stderr)


def _f32(v) -> str:
    """Rust `{}` Display for f32: shortest round-trip, no trailing .0."""
    return np.format_float_positional(np.float32(v), unique=True, trim="-")


def _f32_debug(v) -> str:
    """Rust `{:?}` Debug for f32: shortest round-trip, keeps one decimal."""
    return np.format_float_positional(np.float32(v), unique=True, trim="0")
