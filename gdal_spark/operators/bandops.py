"""Small per-band raster operators backing the ``gdal raster``
pipeline verbs select / set-type / nodata-to-alpha / stack.

Reference: apps/gdalalg_raster_select.cpp (band subset),
gdalalg_raster_set_type.cpp (GDALTranslate -ot semantics: round to
nearest for integer targets and clamp to the type range —
gcore/rasterio.cpp GDALCopyWord), gdalalg_raster_nodata_to_alpha.cpp
(append an alpha band that is 0 on nodata, 255 elsewhere),
gdalalg_raster_stack.cpp (inputs stack as consecutive bands).

All four are narrow per-tile maps (select/stack are pure JVM
DataFrame ops — no kernel at all); nothing shuffles.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    DoubleType, IntegerType, LongType, StructField, StructType,
)

from gdal_spark.operators.tiling import (
    TILE_SCHEMA, decode_tile, encode_tile,
)

_INT_RANGES = {
    "uint8": (0, 255), "int8": (-128, 127),
    "uint16": (0, 65535), "int16": (-32768, 32767),
    "uint32": (0, 4294967295), "int32": (-2147483648, 2147483647),
    "uint64": (0, 2 ** 64 - 1),
    "int64": (-(2 ** 63), 2 ** 63 - 1),
}


def select_bands(tiles: DataFrame, bands: list[int]) -> DataFrame:
    """gdal raster select: keep ``bands`` (1-based order defines the
    output numbering).  Pure JVM: a filter + a literal band remap —
    no Python touches the payload."""
    if not bands:
        raise ValueError("select needs at least one band")
    mapping = F.create_map(
        *[F.lit(v) for pair in
          ((src, dst + 1) for dst, src in enumerate(bands))
          for v in pair])
    return (tiles.filter(F.col("band").isin([int(b) for b in bands]))
            .withColumn("band", mapping[F.col("band")]
                        .cast("int")))


def stack_bands(tile_sets: list[DataFrame]) -> DataFrame:
    """gdal raster stack: each input's bands become consecutive
    output bands.  Band counts come from one tiny agg per input
    (bounded scalar reads); the stack itself is a pure unionByName —
    no shuffle, no kernel."""
    out = None
    offset = 0
    for t in tile_sets:
        row = t.agg(F.max("band").alias("m")).collect()[0]
        nb = int(row["m"] or 0)
        shifted = t.withColumn(
            "band", (F.col("band") + F.lit(offset)).cast("int"))
        out = shifted if out is None else out.unionByName(shifted)
        offset += nb
    if out is None:
        raise ValueError("stack needs at least one input")
    return out


def set_dtype(tiles: DataFrame, dtype: str) -> DataFrame:
    """gdal raster set-type: convert the pixel type with the
    reference's GDALCopyWord rules — round to nearest for integer
    targets, clamp to the target range."""
    dt = np.dtype(dtype)
    name = str(dt)
    if name not in _INT_RANGES and not np.issubdtype(dt, np.floating):
        raise ValueError(f"unsupported target type {dtype!r}")

    def kernel(batches: Iterator[pd.DataFrame]
               ) -> Iterator[pd.DataFrame]:
        for b in batches:
            out = b.copy()
            datas, dts = [], []
            for _, r in b.iterrows():
                ts = int(r["tile_size"])
                a = decode_tile(r["data"], r["dtype"], ts)
                if name in _INT_RANGES:
                    lo, hi = _INT_RANGES[name]
                    f = a.astype(np.float64)
                    # GDALCopyWord rounds half AWAY from zero
                    # (gcore/gdal_priv_templates.hpp:479,641)
                    r = np.where(f >= 0, np.trunc(f + 0.5),
                                 np.trunc(f - 0.5))
                    a = np.clip(r, lo, hi).astype(dt)
                else:
                    a = a.astype(dt)
                payload, dstr = encode_tile(a)
                datas.append(payload)
                dts.append(dstr)
            out["data"] = datas
            out["dtype"] = dts
            yield out[[f.name for f in TILE_SCHEMA.fields]]

    return tiles.mapInPandas(kernel, TILE_SCHEMA)


def nodata_to_alpha(tiles: DataFrame, nodata: float) -> DataFrame:
    """gdal raster nodata-to-alpha: append an alpha band (0 where
    EVERY source band is nodata, 255 elsewhere) after the last
    band.  One narrow per-tile group (bands of a tile meet to AND
    their nodata masks)."""
    nd = float(nodata)

    def kernel(key, pdf: pd.DataFrame) -> pd.DataFrame:
        ts = int(pdf["tile_size"].iloc[0])
        all_nd = None
        maxb = int(pdf["band"].max())
        for _, r in pdf.iterrows():
            a = decode_tile(r["data"], r["dtype"], ts) \
                .astype(np.float64)
            m = a == nd
            all_nd = m if all_nd is None else (all_nd & m)
        alpha = np.where(all_nd, 0, 255).astype(np.uint8)
        extra = pd.DataFrame({
            "zoom": [int(pdf["zoom"].iloc[0])],
            "tile_x": [int(key[0])], "tile_y": [int(key[1])],
            "band": [maxb + 1],
            "data": [alpha.tobytes()],
            "dtype": ["uint8"], "tile_size": [ts],
        })
        return pd.concat(
            [pdf[[f.name for f in TILE_SCHEMA.fields]], extra],
            ignore_index=True)

    return (tiles.groupBy("tile_x", "tile_y")
            .applyInPandas(kernel, TILE_SCHEMA))


_CMP_SCHEMA = StructType([
    StructField("band", IntegerType()),
    StructField("n_diff", LongType()),
    StructField("max_abs", DoubleType()),
    StructField("only_a", LongType()),
    StructField("only_b", LongType()),
])


def raster_compare(a: DataFrame, b: DataFrame) -> dict:
    """gdal raster compare (apps/gdalalg_raster_compare.cpp /
    gdalcompare 'pixels differing' report): per-band differing-pixel
    count + max absolute difference between two tile frames, plus
    tiles present on only one side.  One keyed shuffle (the tile
    cogroup); the driver reads one row per band."""
    keys = ["zoom", "tile_x", "tile_y", "band"]

    tagged = (a.select(*keys, "data", "dtype", "tile_size",
                       F.lit(0).alias("src"))
              .unionByName(
                  b.select(*keys, "data", "dtype", "tile_size",
                           F.lit(1).alias("src"))))

    def kernel(key, pdf: pd.DataFrame) -> pd.DataFrame:
        band = int(key[3])
        ts = int(pdf["tile_size"].iloc[0])
        sides = {int(r["src"]): decode_tile(
            r["data"], r["dtype"], int(r["tile_size"]))
            for _, r in pdf.iterrows()}
        if 0 in sides and 1 in sides:
            d = np.abs(sides[0].astype(np.float64)
                       - sides[1].astype(np.float64))
            return pd.DataFrame({
                "band": [band],
                "n_diff": [int((d != 0).sum())],
                "max_abs": [float(d.max()) if d.size else 0.0],
                "only_a": [0], "only_b": [0]})
        return pd.DataFrame({
            "band": [band], "n_diff": [ts * ts], "max_abs": [0.0],
            "only_a": [int(0 in sides)], "only_b": [int(1 in sides)]})

    rows = (tagged.groupBy(*keys).applyInPandas(kernel, _CMP_SCHEMA)
            .groupBy("band")
            .agg(F.sum("n_diff").alias("n_diff"),
                 F.max("max_abs").alias("max_abs"),
                 F.sum("only_a").alias("only_a"),
                 F.sum("only_b").alias("only_b"))
            .orderBy("band").collect())
    return {
        "bands": {int(r["band"]): {"n_diff": int(r["n_diff"]),
                                   "max_abs": float(r["max_abs"])}
                  for r in rows},
        "tiles_only_a": int(sum(r["only_a"] for r in rows)),
        "tiles_only_b": int(sum(r["only_b"] for r in rows)),
        "identical": all(int(r["n_diff"]) == 0 for r in rows),
    }


_BLEND_MODES = ("src-over", "multiply", "screen", "overlay",
                "darken", "lighten")


def blend_tiles(base: DataFrame, over: DataFrame,
                mode: str = "src-over",
                opacity: float = 100.0) -> DataFrame:
    """gdal raster blend (apps/gdalalg_raster_blend.cpp): compose an
    overlay onto a base raster with a Porter-Duff / ISO-32000 blend
    mode and an opacity percentage.  Values normalize to [0,1] over
    the Byte range, blend, then recompose:
    out = (1-a)*base + a*blend(base, over).  One keyed cogroup per
    tile; output keeps the base dtype (GDALCopyWord rounding)."""
    if mode not in _BLEND_MODES:
        raise ValueError(
            f"unknown blend mode {mode!r}; valid: {_BLEND_MODES}")
    a = float(opacity) / 100.0
    keys = ["zoom", "tile_x", "tile_y", "band"]
    tagged = (base.select(*keys, "data", "dtype", "tile_size",
                          F.lit(0).alias("src"))
              .unionByName(
                  over.select(*keys, "data", "dtype", "tile_size",
                              F.lit(1).alias("src"))))

    def kernel(key, pdf: pd.DataFrame) -> pd.DataFrame:
        ts = int(pdf["tile_size"].iloc[0])
        sides = {}
        dts = {}
        for _, r in pdf.iterrows():
            sides[int(r["src"])] = decode_tile(
                r["data"], r["dtype"], int(r["tile_size"]))
            dts[int(r["src"])] = r["dtype"]
        if 0 not in sides:          # overlay-only tile passes through
            arr, dt = sides[1], dts[1]
            out = arr
        elif 1 not in sides:
            arr, dt = sides[0], dts[0]
            out = arr
        else:
            dt = dts[0]
            b = sides[0].astype(np.float64) / 255.0
            o = sides[1].astype(np.float64) / 255.0
            if mode == "src-over":
                blended = o
            elif mode == "multiply":
                blended = b * o
            elif mode == "screen":
                blended = 1.0 - (1.0 - b) * (1.0 - o)
            elif mode == "overlay":
                blended = np.where(b < 0.5, 2.0 * b * o,
                                   1.0 - 2.0 * (1.0 - b)
                                   * (1.0 - o))
            elif mode == "darken":
                blended = np.minimum(b, o)
            else:
                blended = np.maximum(b, o)
            res = ((1.0 - a) * b + a * blended) * 255.0
            target = np.dtype(str(dt).split(":")[-1])
            if np.issubdtype(target, np.integer):
                lo, hi = _INT_RANGES[str(target)]
                res = np.clip(np.where(res >= 0,
                                       np.trunc(res + 0.5),
                                       np.trunc(res - 0.5)),
                              lo, hi)
            out = res.astype(target)
        return pd.DataFrame({
            "zoom": [int(key[0])], "tile_x": [int(key[1])],
            "tile_y": [int(key[2])], "band": [int(key[3])],
            "data": [np.ascontiguousarray(out).tobytes()],
            "dtype": [str(out.dtype)], "tile_size": [ts],
        })

    return tagged.groupBy(*keys).applyInPandas(kernel, TILE_SCHEMA)


def create_tiles(spark, value: float, zoom: int, n_tx: int,
                 n_ty: int, tile_size: int = 256,
                 dtype: str = "float64", band: int = 1) -> DataFrame:
    """gdal raster create (apps/gdalalg_raster_create.cpp): a
    constant raster as a tile frame — the tile keys come from a JVM
    range cross, only the (identical) payload is Python-built
    once."""
    arr = np.full((tile_size, tile_size), value,
                  dtype=np.dtype(dtype))
    payload = arr.tobytes()
    n = int(n_tx) * int(n_ty)
    return (spark.range(n).select(
        F.lit(int(zoom)).cast("int").alias("zoom"),
        (F.col("id") % n_tx).cast("long").alias("tile_x"),
        F.floor(F.col("id") / n_tx).cast("long").alias("tile_y"),
        F.lit(int(band)).cast("int").alias("band"),
        F.lit(payload).alias("data"),
        F.lit(str(arr.dtype)).alias("dtype"),
        F.lit(int(tile_size)).cast("int").alias("tile_size")))
