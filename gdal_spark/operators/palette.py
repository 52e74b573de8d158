"""``gdal raster rgb-to-palette`` — median-cut palette computation +
distributed remap.

Reference: apps/gdalalg_raster_rgb_to_palette.cpp driving
GDALComputeMedianCutPCT (alg/gdalmediancut.cpp, the libtiff
tiffmedian lineage).  Faithful rules re-derived from that code:

- histogram in 5-bit-per-channel space (nCLevels=32);
- boxes shrink to fit, the splittable box with the LARGEST total
  splits along its LONGEST axis (red wins ties, then green) at the
  first index whose cumulative count reaches total/2 (bumped off the
  box edge, gdalmediancut.cpp:1056-1066);
- palette entry = box center scaled back: ((min+max) << 3) / 2.

Distributed shape: the histogram is ONE per-tile kernel + ONE
groupBy over at most 32768 color codes — the driver only ever sees
the bounded histogram, never pixels; the median cut itself is a
driver-side loop over ≤256 boxes.  The remap broadcasts a
32768-entry code→index LUT (nearest palette entry per 5-bit cell,
computed once) and maps tiles in a second kernel.  Error-diffusion
dithering (GDALDitherRGB2PCT) is declared out: Floyd–Steinberg is a
strict scanline recurrence with no deterministic distributed
analog; the remap is nearest-color.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    LongType, StructField, StructType,
)

from gdal_spark.operators.tiling import TILE_SCHEMA, decode_tile

_HIST_SCHEMA = StructType([
    StructField("code", LongType()),      # r5<<10 | g5<<5 | b5
    StructField("n", LongType()),
])


def rgb_histogram(tiles: DataFrame, bands=(1, 2, 3)) -> DataFrame:
    """5-bit RGB histogram rows (code, n) — ≤32768 rows total."""
    br, bg, bb = bands

    def kernel(key, pdf: pd.DataFrame) -> pd.DataFrame:
        ts = int(pdf["tile_size"].iloc[0])
        chans = {}
        for _, r in pdf.iterrows():
            chans[int(r["band"])] = decode_tile(
                r["data"], r["dtype"], ts)
        if not all(b in chans for b in (br, bg, bb)):
            raise ValueError(
                f"tile {key} is missing one of bands {bands}")
        code = ((chans[br].astype(np.int64) >> 3) << 10) \
            | ((chans[bg].astype(np.int64) >> 3) << 5) \
            | (chans[bb].astype(np.int64) >> 3)
        vals, cnts = np.unique(code.ravel(), return_counts=True)
        return pd.DataFrame({"code": vals, "n": cnts})

    return (tiles.groupBy("tile_x", "tile_y")
            .applyInPandas(kernel, _HIST_SCHEMA)
            .groupBy("code")
            .agg(F.sum("n").alias("n")))


def median_cut_palette(hist: np.ndarray, counts: np.ndarray,
                       n_colors: int = 256) -> np.ndarray:
    """GDALComputeMedianCutPCT box loop over a (k,) array of 5-bit
    codes + counts -> (m, 3) uint8 palette."""
    r = (hist >> 10) & 31
    g = (hist >> 5) & 31
    b = hist & 31

    def shrink(sel):
        return [int(r[sel].min()), int(r[sel].max()),
                int(g[sel].min()), int(g[sel].max()),
                int(b[sel].min()), int(b[sel].max())]

    all_sel = np.ones(len(hist), dtype=bool)
    boxes = [(shrink(all_sel), all_sel, int(counts.sum()))]
    while len(boxes) < n_colors:
        # largest-total splittable box
        best = None
        for idx, (bx, sel, total) in enumerate(boxes):
            if (bx[1] > bx[0] or bx[3] > bx[2] or bx[5] > bx[4]) \
                    and (best is None or total > boxes[best][2]):
                best = idx
        if best is None:
            break
        bx, sel, total = boxes[best]
        dr, dg, db = bx[1] - bx[0], bx[3] - bx[2], bx[5] - bx[4]
        if dr >= dg and dr >= db:
            axis, lo, hi = r, bx[0], bx[1]
        elif dg >= db:
            axis, lo, hi = g, bx[2], bx[3]
        else:
            axis, lo, hi = b, bx[4], bx[5]
        # axis histogram inside the box; split at cumulative >=
        # total/2, never at the box edge
        hvals = np.zeros(hi - lo + 1, dtype=np.int64)
        np.add.at(hvals, axis[sel] - lo, counts[sel])
        cum = np.cumsum(hvals)
        i = lo + int(np.searchsorted(cum, total // 2))
        if i == lo:
            i += 1
        left = sel & (axis < i)
        right = sel & (axis >= i)
        boxes[best] = (shrink(right), right,
                       int(counts[right].sum()))
        boxes.append((shrink(left), left,
                      int(counts[left].sum())))
    pal = np.array(
        [[((bx[0] + bx[1]) << 3) // 2,
          ((bx[2] + bx[3]) << 3) // 2,
          ((bx[4] + bx[5]) << 3) // 2]
         for bx, _sel, _t in boxes], dtype=np.uint8)
    return pal


def rgb_to_palette(tiles: DataFrame, n_colors: int = 256,
                   bands=(1, 2, 3)
                   ) -> tuple[DataFrame, np.ndarray]:
    """-> (single-band palette-index tile frame, (m,3) palette)."""
    hist_pdf = rgb_histogram(tiles, bands).toPandas()
    if len(hist_pdf) == 0:
        return tiles.limit(0), np.zeros((0, 3), dtype=np.uint8)
    pal = median_cut_palette(
        hist_pdf["code"].to_numpy(np.int64),
        hist_pdf["n"].to_numpy(np.int64), n_colors)

    # 32768-entry 5-bit-cell -> nearest palette index LUT
    r5, g5, b5 = np.meshgrid(np.arange(32), np.arange(32),
                             np.arange(32), indexing="ij")
    # cell representative follows the ENTRY law ((min+max)<<3)/2
    # with min=max=c5, i.e. c5*8 — a singleton-box entry is then at
    # distance 0 from its own cell (a +4 center would tie between
    # adjacent entries and misassign exact colors)
    cell = np.stack([r5 * 8, g5 * 8, b5 * 8],
                    axis=-1).reshape(-1, 1, 3).astype(np.int64)
    d2 = ((cell - pal[None, :, :].astype(np.int64)) ** 2).sum(-1)
    lut = np.argmin(d2, axis=1).astype(np.int32)

    br, bg, bb = bands

    def remap(key, pdf: pd.DataFrame) -> pd.DataFrame:
        ts = int(pdf["tile_size"].iloc[0])
        chans = {}
        for _, rr in pdf.iterrows():
            chans[int(rr["band"])] = decode_tile(
                rr["data"], rr["dtype"], ts)
        code = ((chans[br].astype(np.int64) >> 3) << 10) \
            | ((chans[bg].astype(np.int64) >> 3) << 5) \
            | (chans[bb].astype(np.int64) >> 3)
        idx = lut[code].astype(np.uint8 if len(pal) <= 256
                               else np.uint16)
        return pd.DataFrame({
            "zoom": [int(pdf["zoom"].iloc[0])],
            "tile_x": [int(key[0])], "tile_y": [int(key[1])],
            "band": [1], "data": [idx.tobytes()],
            "dtype": [str(idx.dtype)], "tile_size": [ts],
        })

    out = (tiles.groupBy("tile_x", "tile_y")
           .applyInPandas(remap, TILE_SCHEMA))
    return out, pal
