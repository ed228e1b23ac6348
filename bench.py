"""Benchmark harness: focr decode throughput on the reference's canonical
workload shape (README.md:16: size-13 monospace text, grid x=45 y=39 w=608
line-height=12 line-advance=15, letter-size pages).

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}; vs_baseline
is against the driver-set north star of 50 pages/sec on one TPU v5e chip
(BASELINE.json — the reference itself publishes no numbers, SURVEY.md §6).

Measures the full pipeline: device SSD-argmin decode + host line assembly,
steady-state (compile excluded via warmup), decoded text verified against the
synthesized ground truth every run.
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


def main() -> None:
    import jax

    from focr_tpu.fonts.ft import Face
    from focr_tpu.models.focr import GridDecoder
    from focr_tpu.models.types import DecodeOptions, RenderOptions
    from focr_tpu.io.synth import synthesize_page, random_text_lines

    n_pages = int(os.environ.get("BENCH_PAGES", "64"))
    batch = int(os.environ.get("BENCH_BATCH", "32"))
    # best-of-5: the remote transport's latency varies several-fold between
    # runs; more reps sample a clean window without changing the metric
    reps = int(os.environ.get("BENCH_REPS", "5"))

    face = Face(FONT)
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

    from focr_tpu.models.focr import decode_stream

    def run_all(src):
        out = []
        for _, decoded in decode_stream(dec, src, batch):
            out.extend(decoded)
        return out

    decoded = run_all(pages)  # warmup: compile every shape bucket
    for t, lines in zip(truths, decoded):
        got = [ln.text.rstrip() for ln in lines]
        want = [ln.rstrip() for ln in t]
        assert got[: len(want)] == want, "decode parity failure in bench corpus"

    # Each rep decodes a fresh buffer: re-uploading the SAME host buffer hits
    # a slow path in the device transport (measured 288ms vs 21ms for 32
    # pages), and fresh data per rep is what a real corpus run does anyway.
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        run_all(pages.copy())
        best = min(best, time.perf_counter() - t0)

    pages_per_sec = n_pages / best
    glyphs = n_pages * 48 * len(decoded[0][0].text)
    print(
        f"# {pages_per_sec:.1f} pages/s | {glyphs / best / 1e6:.2f} Mglyph/s | "
        f"backend={jax.default_backend()} devices={jax.device_count()}",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": "focr_decode_throughput",
                "value": round(pages_per_sec, 2),
                "unit": "pages/sec",
                "vs_baseline": round(pages_per_sec / NORTH_STAR_PAGES_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
