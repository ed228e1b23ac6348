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
ALPHABET = "> =ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789+/"


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
    batch = int(os.environ.get("BENCH_BATCH", "32"))

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
    return n_pages / best, _spread(times, n_pages)


def bench_ncc(face, reps: int) -> float:
    """Dense-page ncc corpus (x-bits 2, the README.md:56 workload shape):
    74-letter default alphabet, 4 subpixel offsets, ~tens of thousands of
    raw hits per page; full pipeline = device sweep + exact host replay +
    post-processing into text lines."""
    from focr_tpu.models.ncc import NccMatcher
    from focr_tpu.models.post import line_matches_truth, process_hits_text
    from focr_tpu.models.types import DecodeOptions, NCC_DEFAULT_ALPHABET, RenderOptions
    from focr_tpu.io.synth import synthesize_page, random_text_lines

    n_pages = int(os.environ.get("BENCH_NCC_PAGES", "16"))
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
    return n_pages / best


def main() -> None:
    import jax

    from focr_tpu.fonts.ft import Face

    reps = int(os.environ.get("BENCH_REPS", "7"))
    face = Face(FONT)

    focr_pps, focr_spread = bench_focr(face, reps)
    extra = {"focr_spread_pages_per_sec": focr_spread}
    if os.environ.get("BENCH_NCC", "1") != "0":
        ncc_pps = bench_ncc(face, max(reps - 2, 3))
        extra["ncc_dense_pages_per_sec"] = round(ncc_pps, 2)

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
