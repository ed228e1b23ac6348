"""The focr grid decoder, TPU-native.

Replaces the reference's per-page sequential decode
(decode_image/decode_line/score_glyph, main.rs:87-239) with one batched,
jitted kernel per page-shape bucket:

  pages [B, H, W] u8
    -> invert (255 - x)                        (main.rs:150)
    -> gather line strips at the static row grid
    -> gather per-cell windows
    -> exact-integer SSD argmin over the template bank (ops/ssd.py)
    -> ids [B, R, C] i32 + all-white row mask  (main.rs:208-211)

Host-side assembly applies the row-loop semantics (white skip, bottom stop)
and maps glyph ids back to characters. Monospace fonts take this fast path
(the cursor grid is static, SURVEY.md §2.5); proportional fonts fall back to
the sequential oracle decode, batched across nothing but still correct.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from focr_tpu.fonts.bank import GridBank, build_grid_bank, is_monospace
from focr_tpu.fonts.ft import Face
from focr_tpu.models.types import DecodedLine, DecodeOptions, RenderOptions
from focr_tpu.ops import ssd
from focr_tpu.oracle import focr_oracle


@dataclass(frozen=True)
class _RowGroup:
    crop_h: int
    ys: tuple[int, ...]  # page-space y of each row in this group, ascending


def _row_groups(dopts: DecodeOptions, H: int) -> list[_RowGroup]:
    """Rows of the scan grid grouped by crop height (partial bottom rows get
    their own group). Mirrors the crop clamp of image::crop_imm
    (main.rs:199-207)."""
    groups: dict[int, list[int]] = {}
    i = 0
    while True:
        y = dopts.y_start + i * dopts.line_advance
        i += 1
        ch = min(dopts.line_height, H - min(y, H))
        if ch <= 0:
            break
        groups.setdefault(ch, []).append(y)
    return [_RowGroup(crop_h=ch, ys=tuple(ys)) for ch, ys in sorted(groups.items(), reverse=True)]


def _make_group_fn(bank: GridBank, ys: tuple[int, ...], x0: int):
    """Build the jitted [B,H,W] -> (ids [B,R,C], white [B,R]) function."""
    tmpl = jnp.asarray(bank.templates)  # [C,G,h,win]
    tsq = jnp.asarray(bank.tsq)  # [C,G]
    win_w = bank.win_w
    crop_w, crop_h = bank.crop_w, bank.crop_h
    row_off = np.asarray(ys, dtype=np.int32)[:, None] + np.arange(crop_h, dtype=np.int32)
    winidx = bank.wx0[:, None] + np.arange(win_w, dtype=np.int32)[None, :]  # [C,win]
    row_off_j = jnp.asarray(row_off)
    winidx_j = jnp.asarray(winidx)

    @jax.jit
    def fn(pages: jax.Array):
        inv = 255 - pages.astype(jnp.int32)  # [B,H,W]
        strips = inv[:, row_off_j, x0 : x0 + crop_w]  # [B,R,h,crop_w]
        white = jnp.max(strips, axis=(2, 3)) == 0  # all-255 crop ⇔ inverted all-zero
        padded = jnp.pad(strips, ((0, 0), (0, 0), (0, 0), (0, win_w)))
        wins = padded[:, :, :, winidx_j]  # [B,R,h,C,win]
        wins = jnp.transpose(wins, (0, 1, 3, 2, 4))  # [B,R,C,h,win]
        metric = ssd.ssd_metric(wins, tmpl, tsq)
        ids = ssd.argmin_glyph(metric)
        return ids, white

    return fn


class GridDecoder:
    """Batched focr decoder for one (page shape, grid, font) configuration."""

    def __init__(
        self,
        face: Face,
        alphabet: str,
        dopts: DecodeOptions,
        ropts: RenderOptions,
        page_shape: tuple[int, int],
    ):
        self.face = face
        self.alphabet = alphabet
        self.dopts = dopts
        self.ropts = ropts
        self.page_shape = page_shape
        H, W = page_shape
        self.x0 = min(dopts.x_start, W)
        self.crop_w = max(min(dopts.width, W - self.x0), 0)
        self.monospace = is_monospace(face, alphabet, ropts) if alphabet else True
        self.groups: list[tuple[_RowGroup, object]] = []
        if self.crop_w > 0 and self.monospace:
            for grp in _row_groups(dopts, H):
                bank = build_grid_bank(face, alphabet, ropts, self.crop_w, grp.crop_h)
                self.groups.append((grp, _make_group_fn(bank, grp.ys, self.x0)))
                self._bank0 = bank

    def decode_batch(self, pages: np.ndarray) -> list[list[DecodedLine]]:
        """pages [B, H, W] u8 -> per-page decoded lines in row order."""
        assert pages.shape[1:] == self.page_shape
        B = pages.shape[0]
        if self.crop_w == 0:
            # zero-width crop: the all-white skip fires on every row
            # (empty-iterator all() == true), so no lines are ever emitted.
            return [[] for _ in range(B)]
        if not self.monospace:
            return [
                focr_oracle.decode_image(p, self.face, self.alphabet, self.dopts, self.ropts)
                for p in pages
            ]
        pages_j = jnp.asarray(pages)
        per_row: dict[int, tuple[np.ndarray, np.ndarray]] = {}  # y -> (ids [B,C], white [B])
        for grp, fn in self.groups:
            ids, white = jax.device_get(fn(pages_j))
            for ri, y in enumerate(grp.ys):
                per_row[y] = (ids[:, ri], white[:, ri])
        out: list[list[DecodedLine]] = []
        chars = np.array(list(self.alphabet))
        for b in range(B):
            lines: list[DecodedLine] = []
            for y in sorted(per_row):
                ids_b, white_b = per_row[y]
                if white_b[b]:
                    continue
                lines.append(DecodedLine(text="".join(chars[ids_b[b]]), y=y))
            out.append(lines)
        return out


@functools.lru_cache(maxsize=32)
def _decoder_cache_key(*args):  # pragma: no cover - trivial
    return args


def decode_pages(
    pages: list[np.ndarray],
    face: Face,
    alphabet: str,
    dopts: DecodeOptions,
    ropts: RenderOptions,
    batch_size: int = 16,
) -> list[list[DecodedLine]]:
    """Decode a heterogeneous page list: bucket by shape, batch, reassemble.

    Replaces the rayon page fan-out (main.rs:442-471); page order is restored
    exactly as the reference's sort-by-index does (main.rs:468)."""
    from focr_tpu.io.images import bucket_pages

    results: list[list[DecodedLine] | None] = [None] * len(pages)
    for bucket in bucket_pages(pages):
        dec = GridDecoder(face, alphabet, dopts, ropts, bucket.shape)
        arr = bucket.pages
        for s in range(0, arr.shape[0], batch_size):
            chunk = arr[s : s + batch_size]
            decoded = dec.decode_batch(chunk)
            for j, lines in enumerate(decoded):
                results[bucket.indices[s + j]] = lines
    return results  # type: ignore[return-value]
