"""Real-backend bit-parity spot check (not collected by pytest).

The CI suite runs the Pallas kernel in INTERPRET mode (CPU); this script
replays a handful of randomized differential configs — mirroring
tests/test_fuzz_parity.py::test_fuzz_ncc_device_vs_oracle — on the DEFAULT
backend (the real TPU when available), so actual Mosaic lowering of the
kernel (layouts, relayouts, MXU paths) is held to the same hit-for-hit
standard as interpret mode. Small pages keep the tunnel load modest.

Usage: python tools/tpu_parity_spot.py [n_configs=10]
Exit 1 on any mismatch (a bit-parity bug by definition).
"""

import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from focr_tpu.fonts.ft import Face
from focr_tpu.models.types import BoxSize, DecodeOptions, RenderOptions

FONT = "/usr/share/fonts/truetype/dejavu/DejaVuSansMono.ttf"


def main() -> int:
    import jax

    from focr_tpu.io.synth import random_text_lines, synthesize_page
    from focr_tpu.models.ncc import NccMatcher

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    print(f"backend={jax.default_backend()}", file=sys.stderr)
    face = Face(FONT)
    bad = 0
    for seed in range(n):
        rng = np.random.default_rng(9000 + seed)
        ropts = RenderOptions(size=float(rng.choice([9.0, 11.0, 13.0])))
        dopts = DecodeOptions(
            x_start=int(rng.integers(0, 8)),
            y_start=int(rng.integers(0, 8)),
            line_height=int(rng.integers(10, 16)),
            line_advance=int(rng.integers(14, 19)),
            width=int(rng.integers(60, 120)),
        )
        alphabet = "".join(rng.choice(list("ABXab01+/=:"), size=5, replace=False))
        shape = (int(rng.integers(48, 90)), int(rng.integers(90, 150)))
        lines = random_text_lines(rng, alphabet, int(rng.integers(1, 4)), 6)
        page = synthesize_page(face, lines, dopts, ropts, alphabet, shape).copy()
        mask = rng.random(page.shape) < 0.02
        page[mask] = rng.integers(0, 256, int(mask.sum()), dtype=np.uint8)
        wire = "delta" if seed % 2 == 0 else "pos"
        m = NccMatcher(
            face, alphabet, ropts,
            box_size=BoxSize(rng.choice(["font", "alphabet", "char"])),
            x_bits=int(rng.integers(0, 3)), y_bits=int(rng.integers(0, 2)),
            threshold=float(rng.uniform(0.3, 0.9)),
            wire=wire,
        )
        mode = f"single/{wire}"
        if seed % 3 == 1:
            # exercise the grown-cap redo on the REAL backend: a tiny start
            # cap forces overflow -> power-of-two rung growth -> exact redo
            m._caph = {
                (g.nh, g.nw): 2 if g.nw % 2 == 0 else 4 for g in m.groups
            }
            if wire == "delta":
                # ... and the delta wire's stream/escape redo ladders with
                # it: a 2-slot u16 stream rung (_capw) guarantees the
                # wire-overflow redo in models/ncc.py::_collect_page fires
                # under real Mosaic lowering; a 1-slot escape rung (_kesc)
                # exercises the terminal escape redo whenever the page's
                # deltas escape at all
                m._capw = {(g.nh, g.nw): 2 for g in m.groups}
                m._kesc = {(g.nh, g.nw): 1 for g in m.groups}
            mode = f"cap-redo/{wire}"
        if seed % 3 == 2:
            mode = f"wave/{wire}"
            # multi-page wave path: batched dispatch + ink crop + fused sweep
            # + struct collect (the production corpus pipeline)
            pages = [page, np.ascontiguousarray(page[::-1, ::-1]).copy(), page.copy()]
            structs = m.get_hits_many(pages, struct=True)
            hd = [s.to_objects() for s in structs]
            ho = [m.get_hits_oracle(p) for p in pages]
        else:
            hd = m.get_hits(page)
            ho = m.get_hits_oracle(page)
        key = lambda hs: [
            (h.letter, h.x, h.y, h.w, h.h, np.float32(h.similarity).tobytes())
            for h in hs
        ]
        if mode.startswith("wave"):
            ok = [key(a) for a in hd] == [key(b) for b in ho]
            nh = sum(len(a) for a in hd)
        else:
            ok = key(hd) == key(ho)
            nh = len(hd)
        bad += not ok
        note = ""
        if mode == "cap-redo/delta":
            # prove the forced rungs actually drove the redo ladder: any
            # group with >2 candidates must have grown its stream rung
            grown = sum(1 for v in m._capw.values() if v > 2)
            note = f" (capw grew in {grown}/{len(m._capw)} groups)"
            if not grown and nh > 2:
                bad += 1
                note += " REDO-LADDER-NOT-EXERCISED"
        print(f"config {seed} [{mode}]: {nh} hits "
              f"{'OK' if ok else 'MISMATCH'}{note}",
              file=sys.stderr)
    print(f"{'PASS' if not bad else 'FAIL'}: {n - bad}/{n} configs bit-identical",
          file=sys.stderr)
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
