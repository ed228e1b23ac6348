"""Device-cost breakdown for the ncc Pallas path: sweep kernel vs compaction
vs wire encode, measured on the real backend with the production shapes
(full letter-size pages, canonical dense corpus, both size groups).

Timings use the forcing fence (utils/device.force) with every rep's inputs
pre-uploaded, all reps enqueued and fenced ONCE — see .claude/skills/verify
for why naive per-call timing through the tunnel is ~100x wrong.

Variants per group:
  sweep    pallas_call only (mask plane + row counts; fenced via checksums)
  full     production ncc_ops_pallas_call_batch at the matcher's grown caps
  tinycap  same at caph=1024 (isolates cap-proportional compaction work)

Diagnostics to stderr; one JSON summary line to stdout.
"""

from __future__ import annotations

import functools
import json
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp

from focr_tpu.fonts.ft import Face
from focr_tpu.models.ncc import (
    NccMatcher, ncc_ops_pallas_call_batch, _CAPH_START, _CAPW_START,
    _KESC_START,
)
from focr_tpu.models.types import NCC_DEFAULT_ALPHABET, DecodeOptions, RenderOptions
from focr_tpu.io.synth import synthesize_page, random_text_lines
from focr_tpu.ops import pallas_ncc
from focr_tpu.utils.device import force

FONT = "/usr/share/fonts/truetype/dejavu/DejaVuSansMono.ttf"


@functools.partial(jax.jit, static_argnames=("nw", "nh"))
def _sweep_only(imgs, needles, s_n, s2_n, threshold, *, nw, nh):
    """The sweep stage alone (window stats + kernel dispatch), reduced to
    checksums so the fence forces execution without fetching the plane."""
    mask_bytes, rcnt_tm, _, _ = pallas_ncc._sweep_impl(
        imgs, needles, s_n, s2_n, threshold, nw, nh, 1e-3, False
    )
    return jnp.sum(mask_bytes.astype(jnp.int32)), jnp.sum(rcnt_tm)


def _time(fn, bufs, reps):
    """Chain every rep inside ONE jitted call: each separate execute RPC
    through the remote transport costs ~8-10 ms regardless of payload, which
    would inflate a 16-page rep's reading by ~0.5 ms/page; one call per run
    amortizes it to noise (the co-located number)."""
    @jax.jit
    def chained(bs):
        return [fn(b) for b in bs]

    bt = tuple(bufs)
    outs = chained(bt)
    force(outs)
    force([outs, outs])
    t0 = time.perf_counter()
    outs = [chained(bt) for _ in range(2)]
    force(outs)
    return (time.perf_counter() - t0) / 2


def main() -> None:
    n_pages = 16
    reps = 6
    face = Face(FONT)
    ropts = RenderOptions(size=13.0)
    dopts = DecodeOptions(x_start=45, y_start=39, line_height=12,
                          line_advance=15, width=608)
    shape = (792, 662)
    rng = np.random.default_rng(7)
    truths = [random_text_lines(rng, NCC_DEFAULT_ALPHABET, 48, 77)
              for _ in range(n_pages)]
    pages = [synthesize_page(face, t, dopts, ropts, NCC_DEFAULT_ALPHABET, shape)
             for t in truths]
    matcher = NccMatcher(face, NCC_DEFAULT_ALPHABET, ropts, x_bits=2)
    # warm the matcher's caps to their grown values (one production run)
    matcher.get_hits_many(pages)

    H, W = shape
    inv = np.stack([(255 - p.astype(np.int32)).astype(np.uint8) for p in pages])
    bufs = [jnp.asarray(np.ascontiguousarray(inv ^ np.uint8(r + 1)))
            for r in range(reps)]
    force(bufs)

    out = {"n_pages": n_pages, "reps": reps, "groups": []}
    for grp, dev in zip(matcher.groups, matcher._device_groups(None)):
        if not pallas_ncc.pallas_supported(H, W, grp.nw, grp.nh,
                                           matcher.threshold,
                                           T=len(grp.needle_ids)):
            continue
        key = (grp.nh, grp.nw)
        caph = matcher._caph.get(key, _CAPH_START)
        capw = matcher._capw.get(key, _CAPW_START)
        kesc = matcher._kesc.get(key, _KESC_START)
        nd, sn, s2n, thr = dev

        rec = {"nh": grp.nh, "nw": grp.nw, "T": grp.bank.shape[0],
               "caph": caph, "capw": capw}
        t_sweep = _time(
            lambda b: _sweep_only(b, nd, sn, s2n, thr, nw=grp.nw, nh=grp.nh),
            bufs, reps)
        t_full = _time(
            lambda b: ncc_ops_pallas_call_batch(
                b, grp, dev, caph=caph, wire=matcher.wire, capw=capw,
                kesc=kesc),
            bufs, reps)
        t_tiny = _time(
            lambda b: ncc_ops_pallas_call_batch(
                b, grp, dev, caph=1024, wire=matcher.wire, capw=1024,
                kesc=kesc),
            bufs, reps)
        denom = reps * n_pages / 1e3
        rec["sweep_ms_page"] = round(t_sweep / denom, 3)
        rec["full_ms_page"] = round(t_full / denom, 3)
        rec["tinycap_ms_page"] = round(t_tiny / denom, 3)
        rec["compact_ms_page"] = round((t_full - t_sweep) / denom, 3)
        out["groups"].append(rec)
        print(f"# {rec}", file=sys.stderr)

    out["total_full_ms_page"] = round(
        sum(g["full_ms_page"] for g in out["groups"]), 3)

    # the production dispatch fuses EVERY group into one executable
    # (models/ncc.py::_fused_sweep), which lets XLA overlap one group's
    # MXU-bound sweep with another's gather-bound compaction — time that
    # too, or the per-group sum above overstates the pipeline's real floor
    specs = []
    for grp, dev in zip(matcher.groups, matcher._device_groups(None)):
        if not pallas_ncc.pallas_supported(H, W, grp.nw, grp.nh,
                                           matcher.threshold,
                                           T=len(grp.needle_ids)):
            continue
        key = (grp.nh, grp.nw)
        specs.append((
            grp, dev, matcher._caph.get(key, _CAPH_START),
            matcher._capw.get(key, _CAPW_START),
            matcher._kesc.get(key, _KESC_START),
        ))

    @jax.jit
    def fused(b):
        return [
            ncc_ops_pallas_call_batch(
                b, grp, dev, caph=c, wire=matcher.wire, capw=cw, kesc=ke
            )
            for grp, dev, c, cw, ke in specs
        ]

    t_fused = _time(fused, bufs, reps)
    out["fused_ms_page"] = round(t_fused / (reps * n_pages / 1e3), 3)
    print(f"# fused all-groups: {out['fused_ms_page']} ms/page", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
