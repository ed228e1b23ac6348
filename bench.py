"""Benchmark harness: focr decode + ncc match throughput on the reference's
canonical workload shapes (README.md:16,56: size-13 monospace text; focr grid
x=45 y=39 w=608 line-height=12 line-advance=15; ncc --x-bits 2 dense pages).

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline", "extra"};
vs_baseline is against the driver-set north star of 50 focr pages/sec on one
TPU v5e chip (BASELINE.json — the reference itself publishes no numbers,
SURVEY.md §6). "extra" carries the ncc dense-corpus pages/sec and the focr
rep-latency spread (best/p50/p05) so a slow-transport window is
distinguishable from a perf regression.

Measures the full pipeline: device kernels + host assembly/replay,
steady-state (compile excluded via warmup), decoded output verified against
the synthesized ground truth every run.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

NORTH_STAR_PAGES_PER_SEC = 50.0
FONT = "/usr/share/fonts/truetype/dejavu/DejaVuSansMono.ttf"
SANS_FONT = "/usr/share/fonts/truetype/dejavu/DejaVuSans.ttf"
ALPHABET = "> =ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789+/"
# v5e per-chip peak: 197 TFLOP/s bf16 (the SSD matmul runs bf16/f32 on the
# MXU) — the MFU denominator for the device-forward metric
V5E_BF16_PEAK_FLOPS = 197e12


def _force(outs) -> None:
    """Execution fence for device-only timing: block_until_ready PLUS a
    data-dependent scalar fetch (see focr_tpu.utils.device — the remote
    backend can ack enqueues before execution, which made unfenced device
    metrics read ~100-1000x fast)."""
    from focr_tpu.utils.device import force

    force(outs)


def _spread(times: list[float], n_pages: int) -> dict:
    """Per-rep pages/s spread: best plus p50/p05 (5th-percentile) views."""
    pps = sorted(n_pages / t for t in times)
    q = lambda f: pps[min(int(f * (len(pps) - 1) + 0.5), len(pps) - 1)]
    return {
        "best": round(pps[-1], 2),
        "p50": round(q(0.5), 2),
        "p05": round(q(0.05), 2),
        "reps": len(pps),
    }


def bench_focr(face, reps: int) -> tuple[float, dict]:
    from focr_tpu.models.focr import GridDecoder, decode_stream
    from focr_tpu.models.types import DecodeOptions, RenderOptions
    from focr_tpu.io.synth import synthesize_page, random_text_lines

    n_pages = int(os.environ.get("BENCH_PAGES", "64"))
    # one wave covering the corpus: the tunnel transport is latency-bound
    # (10-500ms per RPC), so per-rep round trips dominate over pipelining
    batch = int(os.environ.get("BENCH_BATCH", "64"))

    ropts = RenderOptions(size=13.0)
    dopts = DecodeOptions(x_start=45, y_start=39, line_height=12, line_advance=15, width=608)
    shape = (792, 662)  # letter-size at 72dpi + grid margin

    # base64-attachment-style ground truth: 48 dense lines per page
    rng = np.random.default_rng(42)
    text_alpha = ALPHABET.replace(" ", "A").replace(">", "B")
    truths = [random_text_lines(rng, text_alpha, 48, 77) for _ in range(n_pages)]
    pages = np.stack(
        [synthesize_page(face, t, dopts, ropts, ALPHABET, shape) for t in truths]
    )

    dec = GridDecoder(face, ALPHABET, dopts, ropts, shape)

    def run_all(src):
        out = []
        for _, decoded in decode_stream(dec, src, batch):
            out.extend(decoded)
        return out

    decoded = run_all(pages)  # warmup: compile every shape bucket
    for t, lines in zip(truths, decoded):
        got = [ln.text.rstrip() for ln in lines]
        want = [ln.rstrip() for ln in t]
        assert got[: len(want)] == want, "focr decode parity failure in bench corpus"

    # Each rep decodes a DISTINCT live buffer with a rep-specific page order:
    # re-uploading the SAME host buffer hits a slow path in the device
    # transport (measured 288ms vs 21ms for 32 pages), a freed-and-realloc'd
    # copy can land on the same address, and identical content can hit an
    # unrealistically FAST transport dedup path — distinct live permutations
    # defeat all three while keeping the work identical to a real corpus run.
    # best-of-N because the remote transport's latency varies several-fold
    # between runs; the spread (p50/p05) is reported so a slow window is
    # visible in the record.
    perm_rng = np.random.default_rng(1234)
    srcs = [
        np.ascontiguousarray(pages[perm_rng.permutation(n_pages)])
        for _ in range(reps)
    ]
    times = []
    for src in srcs:
        t0 = time.perf_counter()
        run_all(src)
        times.append(time.perf_counter() - t0)

    best = min(times)
    glyphs = n_pages * 48 * len(decoded[0][0].text)
    print(
        f"# focr {n_pages / best:.1f} pages/s | {glyphs / best / 1e6:.2f} Mglyph/s | "
        f"spread {_spread(times, n_pages)}",
        file=sys.stderr,
    )
    dev_pps, dev_mfu = bench_focr_device(dec, pages[:batch], max(reps, 4))
    return n_pages / best, _spread(times, n_pages), dev_pps, dev_mfu


def bench_focr_device(dec, pages: np.ndarray, reps: int) -> tuple[float, float]:
    """Device-only focr forward throughput + MFU estimate.

    Isolates the SSD matmul pipeline from the transport: every rep's strip
    buffer is pre-uploaded (distinct content — the transport dedups repeats),
    then all forwards are enqueued and fenced ONCE (per-call timing through
    the tunnel would be ~100x off, see .claude/skills/verify). MFU counts
    only the metric contraction (windows x templates MACs), the dominant
    term, against the v5e bf16 peak.

    The page axis is replicated 2x per call (permuted copies — more would
    push the per-rep strip buffer past the ~32MB single-transfer collapse):
    the forward itself is sub-ms, so at small B the region is dominated by
    the ~1 ms per-call host enqueue and the ~30 ms fence RTT. This metric is
    a LOWER bound on device rate with those floors amortized as far as
    upload time permits, not a pure-chip number (no co-located host exists
    to measure one)."""
    import jax
    import jax.numpy as jnp

    from focr_tpu.models.focr import crop_strips

    pages = np.concatenate(
        [pages, pages[np.random.default_rng(31).permutation(len(pages))]]
    )
    B = pages.shape[0]
    sizes = [B * len(g.ys) * g.crop_h * dec.crop_w for g, _ in dec.groups]

    def flat_for(src: np.ndarray) -> np.ndarray:
        flat = np.empty(sum(sizes), dtype=np.uint8)
        off = 0
        for (grp, _), sz in zip(dec.groups, sizes):
            view = flat[off : off + sz].reshape(B, len(grp.ys), grp.crop_h, dec.crop_w)
            crop_strips(src, grp.ys, grp.crop_h, dec.x0, dec.crop_w, out=view)
            off += sz
        return flat

    perm_rng = np.random.default_rng(5150)
    flats_j = [
        jnp.asarray(flat_for(pages[perm_rng.permutation(B)])) for _ in range(reps)
    ]
    _force(flats_j)  # uploads must land before the timed region
    out = dec._combined_fn(flats_j[0], B=B)  # compile
    _force(out)
    # pre-compile the fence for the measured leaf signature (the fence jits
    # one reduction per signature; an unwarmed signature would put that
    # compile inside the timed region)
    _force([out for _ in flats_j])
    t0 = time.perf_counter()
    outs = [dec._combined_fn(f, B=B) for f in flats_j]
    _force(outs)
    dt = time.perf_counter() - t0
    pps = reps * B / dt

    # metric-contraction FLOPs per page: for each row group, R rows x C cells
    # x G glyphs x (h x win) window MACs (2 flops each)
    flops_page = sum(
        len(grp.ys) * bank.templates.shape[0] * bank.templates.shape[1]
        * bank.templates.shape[2] * bank.templates.shape[3] * 2
        for (grp, _), bank in zip(dec.groups, dec.banks)
    )
    mfu = pps * flops_page / V5E_BF16_PEAK_FLOPS
    print(
        f"# focr device-only {pps:.0f} pages/s | {flops_page / 1e6:.0f} MFLOP/page "
        f"| MFU {mfu * 100:.2f}%",
        file=sys.stderr,
    )
    return pps, mfu


def bench_prop(reps: int) -> tuple[float, dict, list, list]:
    """Proportional-font decode throughput (the lax.scan sequential device
    path, models/focr_prop.py) on the canonical grid with DejaVu Sans.
    Returns (best pages/s, spread, per-rep seconds, per-rep refetch counts)
    — the per-rep records make a slow rep attributable from the JSON alone:
    a stalled rep with refetches=0 was a transport stall, one with
    refetches>0 paid the decode_lines full-buffer under-guess miss.

    Parity anchor: the device decode of page 0 must be TEXT-IDENTICAL to the
    host oracle's decode (engine-vs-engine, the only valid comparison —
    greedy proportional decode legitimately derails on ambiguous glyphs
    ('l'/'k') and fills trailing white with spurious glyphs on EVERY engine
    including the reference's semantics, so decoded-vs-truth would assert
    reference bugs away)."""
    from focr_tpu.fonts.ft import Face
    from focr_tpu.models.focr import decode_pages
    from focr_tpu.models.types import DecodeOptions, RenderOptions
    from focr_tpu.io.synth import synthesize_page, random_text_lines
    from focr_tpu.oracle import focr_oracle

    n_pages = int(os.environ.get("BENCH_PROP_PAGES", "16"))
    face = Face(SANS_FONT)
    ropts = RenderOptions(size=13.0)
    dopts = DecodeOptions(x_start=45, y_start=39, line_height=12, line_advance=15, width=608)
    shape = (792, 662)
    alpha = ALPHABET.replace(" ", "A").replace(">", "B")

    rng = np.random.default_rng(21)
    truths = [random_text_lines(rng, alpha, 48, 60) for _ in range(n_pages)]
    pages = [synthesize_page(face, t, dopts, ropts, alpha, shape) for t in truths]

    def run_all(src):
        return decode_pages(src, face, alpha, dopts, ropts, batch_size=16)

    decoded = run_all(pages)  # warmup + compile
    oracle_lines = focr_oracle.decode_image(pages[0], face, alpha, dopts, ropts)
    assert [ln.text for ln in decoded[0]] == [ln.text for ln in oracle_lines], (
        "prop decode parity failure vs host oracle"
    )

    perm_rng = np.random.default_rng(343)
    srcs = [
        [pages[i].copy() for i in perm_rng.permutation(n_pages)] for _ in range(reps)
    ]
    from focr_tpu.models import focr_prop

    times = []
    refetches = []
    for src in srcs:
        r0 = focr_prop.refetch_total
        t0 = time.perf_counter()
        run_all(src)
        times.append(time.perf_counter() - t0)
        refetches.append(focr_prop.refetch_total - r0)
    best = min(times)
    spread = _spread(times, n_pages)
    print(
        f"# prop {n_pages / best:.1f} pages/s | spread {spread} | "
        f"refetches {sum(refetches)}",
        file=sys.stderr,
    )
    return n_pages / best, spread, times, refetches


def bench_ncc(face, reps: int) -> tuple[float, tuple[float, float] | None]:
    """Dense-page ncc corpus (x-bits 2, the README.md:56 workload shape):
    74-letter default alphabet, 4 subpixel offsets, ~tens of thousands of
    raw hits per page; full pipeline = device sweep + exact host replay +
    post-processing into text lines. Returns (pages/sec, (full, sweep)
    device ms/page or None off-TPU — see bench_ncc_device)."""
    from focr_tpu.models.ncc import NccMatcher
    from focr_tpu.models.post import line_matches_truth, process_hits_text
    from focr_tpu.models.types import DecodeOptions, NCC_DEFAULT_ALPHABET, RenderOptions
    from focr_tpu.io.synth import synthesize_page, random_text_lines

    # 64 pages = multiple dispatch waves, so the measured region includes the
    # pipeline's steady state (upload/compute/fetch/replay overlapped) rather
    # than one unoverlapped wave — a real corpus run's shape (ncc.rs:839-847
    # fans a whole directory out the same way)
    n_pages = int(os.environ.get("BENCH_NCC_PAGES", "64"))
    ropts = RenderOptions(size=13.0)
    dopts = DecodeOptions(x_start=45, y_start=39, line_height=12, line_advance=15, width=608)
    shape = (792, 662)

    rng = np.random.default_rng(7)
    truths = [random_text_lines(rng, NCC_DEFAULT_ALPHABET, 48, 77) for _ in range(n_pages)]
    pages = [synthesize_page(face, t, dopts, ropts, NCC_DEFAULT_ALPHABET, shape) for t in truths]

    matcher = NccMatcher(face, NCC_DEFAULT_ALPHABET, ropts, x_bits=2)

    def run_all(src):
        # post fused into the pipeline workers, like the CLI text path
        return matcher.get_hits_many(
            src, struct=True, post=lambda hs: process_hits_text(hs, 0.95, 5)
        )

    decoded = run_all(pages)  # warmup
    for t, got in zip(truths, decoded):
        missing = [
            ln for ln in t if not any(line_matches_truth(g, ln) for g in got)
        ]
        assert not missing, f"ncc decode parity failure: {missing[:2]}"

    perm_rng = np.random.default_rng(99)
    srcs = [
        [pages[i].copy() for i in perm_rng.permutation(n_pages)]
        for _ in range(reps)
    ]
    times = []
    for src in srcs:
        t0 = time.perf_counter()
        run_all(src)
        times.append(time.perf_counter() - t0)
    best = min(times)
    print(
        f"# ncc {n_pages / best:.1f} pages/s | {best / n_pages * 1e3:.1f} ms/page | "
        f"spread {_spread(times, n_pages)}",
        file=sys.stderr,
    )
    dev = bench_ncc_device(matcher, pages[:16], max(reps, 4))
    return n_pages / best, dev


def bench_ncc_device(
    matcher, pages: list, reps: int
) -> tuple[float, float] | None:
    """Device-only ncc sweep+compaction ms/page (isolates the kernel from
    the transport so regressions are attributable from the JSON alone, like
    focr's device metric): pre-upload distinct full-page wave buffers, then
    enqueue every rep's fused group sweeps and block ONCE without fetching.
    Full-page sweeps (no ink-bbox crop), so this upper-bounds the pipeline's
    per-page device cost at the matcher's grown candidate caps. Also times
    the SWEEP stage alone (mask plane + row counts, checksum-fenced) so the
    sweep/compaction split is on the driver record every round — compact =
    full - sweep. Returns (full_ms_page, sweep_ms_page); None when the
    matcher is not on the Pallas kernel (off-TPU that would time interpret
    mode — meaningless and near-unbounded)."""
    import jax
    import jax.numpy as jnp

    from focr_tpu.models.ncc import (
        _CAPH_START, _CAPW_START, _KESC_START, ncc_ops_pallas_call_batch,
    )
    from focr_tpu.ops import pallas_ncc

    if matcher.device_kernel != "pallas":
        return None
    H, W = pages[0].shape
    inv = np.stack([(255 - p.astype(np.int32)).astype(np.uint8) for p in pages])
    bufs = [jnp.asarray(np.ascontiguousarray(inv ^ np.uint8(r + 1))) for r in range(reps)]
    _force(bufs)  # uploads must land before the timed region
    calls = []
    for grp, dev in zip(matcher.groups, matcher._device_groups(None)):
        if grp.nh >= H or grp.nw >= W:
            continue
        if not pallas_ncc.pallas_supported(
            H, W, grp.nw, grp.nh, matcher.threshold, T=len(grp.needle_ids)
        ):
            continue
        key = (grp.nh, grp.nw)
        calls.append((
            grp, dev, matcher._caph.get(key, _CAPH_START),
            matcher._capw.get(key, _CAPW_START),
            matcher._kesc.get(key, _KESC_START),
        ))
    if not calls:  # nothing Pallas-able: a 0.0 reading would be misleading
        return None

    def sweep(b):
        # all groups of one wave, exactly the production dispatch set
        # (models/ncc.py::_fused_sweep fuses these into one executable)
        return [
            ncc_ops_pallas_call_batch(
                b, grp, dev, caph=c, wire=matcher.wire, capw=cw, kesc=ke
            )
            for grp, dev, c, cw, ke in calls
        ]

    def sweep_stage(b, needles, s_n, s2_n, thr, nw, nh):
        # the sweep alone (window stats + banded kernel), reduced to
        # checksums so the fence forces execution without fetching planes
        mask_bytes, rcnt_tm, _, _ = pallas_ncc._sweep_impl(
            b, needles, s_n, s2_n, thr, nw, nh, 1e-3, False
        )
        return jnp.sum(mask_bytes.astype(jnp.int32)), jnp.sum(rcnt_tm)

    def sweep_only(b):
        return [
            sweep_stage(b, dev[0], dev[1], dev[2], dev[3], grp.nw, grp.nh)
            for grp, dev, _, _, _ in calls
        ]

    def timed(fn):
        # CHAIN every rep inside ONE jitted call: a separate execute RPC
        # through the remote transport costs ~8-10 ms regardless of payload
        # (measured: one elementwise add on [16, 24576] times the same as
        # 16 chained ones), which at 16 pages/rep would inflate a "device"
        # floor by ~0.5-1 ms/page. One call per timing run amortizes the
        # RPC to noise — this is the number a co-located host would see.
        @jax.jit
        def chained(bs):
            return [fn(b) for b in bs]

        bt = tuple(bufs)
        outs = chained(bt)
        _force(outs)  # compile
        # pre-compile the fence for the measured leaf signature (see
        # bench_focr_device)
        _force([outs, outs])
        t0 = time.perf_counter()
        outs = [chained(bt) for _ in range(2)]
        _force(outs)
        return (time.perf_counter() - t0) / (2 * reps * len(pages)) * 1e3

    dev_ms = timed(sweep)
    sweep_ms = timed(sweep_only)
    print(
        f"# ncc device sweep+compact {dev_ms:.2f} ms/page "
        f"(sweep {sweep_ms:.2f} + compact {dev_ms - sweep_ms:.2f})",
        file=sys.stderr,
    )
    return dev_ms, sweep_ms


def _retry_once(label, fn):
    """One retry per bench section: the remote transport can drop a single
    RPC mid-run (FailedPrecondition after a tunnel hiccup); losing the whole
    round's record to one transient beats nothing, a retry beats both."""
    try:
        return fn()
    except Exception as e:  # noqa: BLE001 - deliberate: retry ANY transient once
        print(f"# {label} failed ({type(e).__name__}: {e}); retrying once",
              file=sys.stderr)
        time.sleep(5)
        return fn()


def main() -> None:
    import jax

    from focr_tpu.fonts.ft import Face

    # 11 reps: _spread's p05 is the MINIMUM draw at 7 reps but the
    # second-worst at 11+, so the recorded p05 stops being a single
    # worst-RPC artifact; the extra draws cost ~10s against the transport's
    # several-fold window swing
    reps = int(os.environ.get("BENCH_REPS", "11"))
    face = Face(FONT)

    focr_pps, focr_spread, dev_pps, dev_mfu = _retry_once(
        "focr", lambda: bench_focr(face, reps)
    )
    extra = {
        "focr_spread_pages_per_sec": focr_spread,
        "focr_device_pages_per_sec": round(dev_pps, 1),
        "focr_device_mfu_pct": round(dev_mfu * 100, 3),
    }
    if os.environ.get("BENCH_NCC", "1") != "0":
        try:
            # full rep count: the d2h direction (ncc's bottleneck) swings
            # several-fold WITHIN a window, so more best-of draws directly
            # de-noise this metric (spread still records the distribution)
            ncc_pps, ncc_dev = _retry_once(
                "ncc", lambda: bench_ncc(face, reps)
            )
            extra["ncc_dense_pages_per_sec"] = round(ncc_pps, 2)
            if ncc_dev is not None:
                dev_ms, sweep_ms = ncc_dev
                extra["ncc_device_ms_per_page"] = round(dev_ms, 3)
                extra["ncc_sweep_ms_page"] = round(sweep_ms, 3)
                extra["ncc_compact_ms_page"] = round(dev_ms - sweep_ms, 3)
        except Exception as e:  # noqa: BLE001 - keep the focr record alive
            print(f"# ncc bench failed twice: {e}", file=sys.stderr)
    if os.environ.get("BENCH_PROP", "1") != "0":
        try:
            # full rep count (r4 ran reps-2=9, where _spread's p05 is the
            # MINIMUM draw — the recorded tail was a single worst-RPC
            # artifact by construction; 11 reps makes p05 the second-worst,
            # matching the focr/ncc treatment)
            prop_pps, prop_spread, prop_times, prop_ref = _retry_once(
                "prop", lambda: bench_prop(reps)
            )
            extra["prop_pages_per_sec"] = round(prop_pps, 2)
            extra["prop_spread_pages_per_sec"] = prop_spread
            extra["prop_rep_seconds"] = [round(t, 3) for t in prop_times]
            extra["prop_refetches"] = prop_ref
        except Exception as e:  # noqa: BLE001
            print(f"# prop bench failed twice: {e}", file=sys.stderr)

    print(
        f"# backend={jax.default_backend()} devices={jax.device_count()}",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": "focr_decode_throughput",
                "value": round(focr_pps, 2),
                "unit": "pages/sec",
                "vs_baseline": round(focr_pps / NORTH_STAR_PAGES_PER_SEC, 3),
                "extra": extra,
            }
        )
    )


if __name__ == "__main__":
    main()
