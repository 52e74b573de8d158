"""Cutline clip with blend distance.

Re-creates the warp cutline masker (alg/gdalcutline.cpp:397,
GDALWarpCutlineMaskerBlend): the cutline polygon(s) clip the raster,
and pixels within ``blend_px`` of the cutline edge get a feathered
alpha instead of a hard cut —

    alpha = clamp(0.5 + signed_dist / (2 * blend_px), 0, 1)

where signed_dist is the pixel distance to the cutline boundary
(positive inside).  blend_px = 0 is the hard mask x multiply
composition.  Output pixel = alpha * src + (1 - alpha) * nodata,
always float64 (the blend is fractional by definition).

Distributed shape: the cutline rasterizes to mask tiles on the same
grid (zero-filled over the full src tile lattice), each mask tile
gets a ceil(blend)-pixel halo from its neighbors, and the signed
distance runs per tile over the haloed canvas.  Exactness: alpha
saturates for |signed_dist| >= blend, and any boundary pixel within
blend is inside the halo window, so the per-tile EDT equals the
global one wherever alpha is fractional (same argument as
proximity_tiles' MAXDIST truncation).  Beyond the raster edge the
world is outside-the-cutline (zero padding) — the single-array
oracle in tests pads identically.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from gdal_spark.operators.proximity import (
    assemble_halo_canvas, emit_halos_k,
)
from gdal_spark.operators.rasterize import GridSpec, rasterize
from gdal_spark.operators.tiling import (
    TILE_SCHEMA, decode_tile, encode_tile,
)


def blend_alpha(mask: np.ndarray, blend_px: float) -> np.ndarray:
    """Feathered alpha from a boolean inside-mask (single-array
    reference kernel; the distributed path must reproduce it).

    Alpha only depends on distances <= blend_px (it saturates
    beyond), so instead of a full EDT the signed distance comes from
    an exact (2k+1)^2 window min-sweep of vectorized shifts — equal
    output, and ~1000x cheaper per tile than the Python-loop EDT
    when hundreds of small tiles land in one task."""
    if blend_px <= 0:
        return mask.astype(np.float64)
    k = int(np.ceil(blend_px))
    h, w = mask.shape
    d2_in = np.full((h, w), np.inf)    # nearest OUTSIDE px, for in px
    d2_out = np.full((h, w), np.inf)   # nearest INSIDE px, for out px
    inv = ~mask
    for dy in range(-k, k + 1):
        for dx in range(-k, k + 1):
            dd = dy * dy + dx * dx
            if dd == 0 or dd > k * k:
                continue
            ys0, ys1 = max(dy, 0), h + min(dy, 0)
            xs0, xs1 = max(dx, 0), w + min(dx, 0)
            # candidate window shifted by (dy, dx); beyond-array has
            # no candidates (the EDT convention)
            sl_dst = (slice(ys0, ys1), slice(xs0, xs1))
            sl_src = (slice(ys0 - dy, ys1 - dy),
                      slice(xs0 - dx, xs1 - dx))
            d2_in[sl_dst] = np.where(
                inv[sl_src], np.minimum(d2_in[sl_dst], dd),
                d2_in[sl_dst])
            d2_out[sl_dst] = np.where(
                mask[sl_src], np.minimum(d2_out[sl_dst], dd),
                d2_out[sl_dst])
    with np.errstate(invalid="ignore"):
        signed = np.where(mask, np.sqrt(d2_in), -np.sqrt(d2_out))
    return np.clip(0.5 + signed / (2.0 * blend_px), 0.0, 1.0)


def cutline_clip(spark: SparkSession, src_tiles: DataFrame,
                 cutline_pdf: pd.DataFrame, grid: GridSpec,
                 blend_px: float = 0.0, nodata: float = 0.0,
                 tile_size: int = 256) -> DataFrame:
    """Clip ``src_tiles`` to the cutline polygons, feathering
    ``blend_px`` pixels across the edge (0 = hard cut)."""
    k = max(1, int(np.ceil(blend_px)))
    mask = rasterize(spark, cutline_pdf, grid, burn_value=1.0,
                     dtype="uint8", tile_size=tile_size)

    # zero-fill the mask over the src tile lattice so every src tile
    # owns a center canvas (tiles the cutline never touches are
    # all-outside, not absent)
    keys = src_tiles.select("zoom", "tile_x", "tile_y",
                            "tile_size").distinct()
    mdat = mask.select("tile_x", "tile_y",
                       F.col("data").alias("m_data"),
                       F.col("dtype").alias("m_dtype"))
    # explicit partitioning: AQE coalesces these small joins to ONE
    # partition and would serialize every per-tile kernel downstream
    par = max(spark.sparkContext.defaultParallelism, 8)
    with_mask = keys.join(mdat, ["tile_x", "tile_y"], "left") \
        .repartition(par)

    def fill(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            if len(b) == 0:
                continue
            rows = {f.name: [] for f in TILE_SCHEMA.fields}
            for _, r in b.iterrows():
                ts = int(r["tile_size"])
                if r["m_data"] is None:
                    arr = np.zeros((ts, ts), dtype=np.uint8)
                else:
                    arr = decode_tile(r["m_data"], r["m_dtype"], ts)
                payload, dts = encode_tile(arr.astype(np.uint8), None)
                rows["zoom"].append(int(r["zoom"]))
                rows["tile_x"].append(int(r["tile_x"]))
                rows["tile_y"].append(int(r["tile_y"]))
                rows["band"].append(1)
                rows["data"].append(payload)
                rows["dtype"].append(dts)
                rows["tile_size"].append(ts)
            yield pd.DataFrame(rows)

    mask_full = with_mask.mapInPandas(fill, TILE_SCHEMA)

    # per-tile alpha over a k-haloed canvas
    halos = emit_halos_k(mask_full, k)

    def render_alpha(key, pdf: pd.DataFrame) -> pd.DataFrame:
        ts = int(pdf["tile_size"].iloc[0])
        got = assemble_halo_canvas(pdf, ts, k, fill=0.0)
        if got is None:
            return pd.DataFrame({f.name: [] for f in TILE_SCHEMA.fields})
        canvas, meta = got
        alpha = blend_alpha(canvas >= 0.5, blend_px)[k:-k, k:-k]
        payload, dts = encode_tile(alpha.astype(np.float64), None)
        return pd.DataFrame({
            "zoom": [meta["zoom"]], "tile_x": [int(key[0])],
            "tile_y": [int(key[1])], "band": [meta["band"]],
            "data": [payload], "dtype": [dts], "tile_size": [ts],
        })

    alpha_tiles = (
        halos.repartition(par, "tile_x", "tile_y")
        .groupBy("tile_x", "tile_y")
        .applyInPandas(render_alpha, TILE_SCHEMA)
        .select("tile_x", "tile_y",
                F.col("data").alias("a_data"),
                F.col("dtype").alias("a_dtype"))
    )

    blended_in = src_tiles.join(alpha_tiles, ["tile_x", "tile_y"]) \
        .repartition(par)

    def blend(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            if len(b) == 0:
                continue
            rows = {f.name: [] for f in TILE_SCHEMA.fields}
            for _, r in b.iterrows():
                ts = int(r["tile_size"])
                src = decode_tile(r["data"], r["dtype"], ts) \
                    .astype(np.float64)
                alpha = decode_tile(r["a_data"], r["a_dtype"], ts)
                out = alpha * src + (1.0 - alpha) * float(nodata)
                payload, dts = encode_tile(out, None)
                rows["zoom"].append(int(r["zoom"]))
                rows["tile_x"].append(int(r["tile_x"]))
                rows["tile_y"].append(int(r["tile_y"]))
                rows["band"].append(int(r["band"]))
                rows["data"].append(payload)
                rows["dtype"].append(dts)
                rows["tile_size"].append(ts)
            yield pd.DataFrame(rows)

    return blended_in.mapInPandas(blend, TILE_SCHEMA)
