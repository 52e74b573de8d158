"""GDAL image checksum — the oracle for all raster golden tests.

Behavior-exact port of GDALChecksumImage (alg/gdalchecksum.cpp:47-330):

* primes cycle [7,11,13,17,19,23,29,31,37,41,43]; the prime index is
  re-initialized per line as (nValsPerIter * (y*xsize + xoff)) % 11
* integer data: checksum += value % primes[i] (C truncated modulo),
  masked & 0xffff after each line
* floating data: converted to int32 by dfVal += 0.5; floor; clamped
  to [-2147483647, 2147483647]; non-finite -> INT_MIN
* the canonical fixture byte.tif (20x20 GDT_Byte) checksums to 4672
  (autotest/gcore/tiff_read.py:45)

Vectorized: per-line numpy modulo against a precomputed prime row.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import IntegerType, LongType, StructField, StructType

PRIMES = np.array([7, 11, 13, 17, 19, 23, 29, 31, 37, 41, 43],
                  dtype=np.int64)


def checksum_array(arr: np.ndarray, xoff: int = 0, yoff: int = 0) -> int:
    """GDALChecksumImage over a full 2-D array window."""
    arr = np.asarray(arr)
    if arr.ndim != 2:
        raise ValueError("checksum_array expects a 2-D array")
    h, w = arr.shape
    if np.issubdtype(arr.dtype, np.floating):
        vals = arr.astype(np.float64) + 0.5
        iv = np.where(
            np.isfinite(vals),
            np.clip(np.floor(vals), -2147483647.0, 2147483647.0),
            np.float64(-2147483648.0),
        ).astype(np.int64)
    else:
        iv = arr.astype(np.int64)
    cs = 0
    for y in range(h):
        iprime0 = ((y + yoff) * w + xoff) % 11
        primes_row = PRIMES[(iprime0 + np.arange(w)) % 11]
        # C-truncated modulo: numpy fmod keeps the dividend's sign
        line = np.fmod(iv[y], primes_row).sum()
        cs = (cs + int(line)) & 0xFFFF
    return cs


CHECKSUM_SCHEMA = StructType([
    StructField("zoom", IntegerType()),
    StructField("tile_x", LongType()),
    StructField("tile_y", LongType()),
    StructField("band", IntegerType()),
    StructField("checksum", IntegerType()),
])


def tile_checksums(tiles: DataFrame) -> DataFrame:
    """Per-tile checksum column (Arrow-batched kernel)."""
    from typing import Iterator

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out = []
            for _, r in b.iterrows():
                ts = int(r["tile_size"])
                from gdal_spark.operators.tiling import decode_tile

                arr = decode_tile(r["data"], r["dtype"], ts)
                out.append(checksum_array(arr))
            yield pd.DataFrame({
                "zoom": b["zoom"], "tile_x": b["tile_x"],
                "tile_y": b["tile_y"], "band": b["band"],
                "checksum": np.array(out, dtype=np.int32),
            })

    return tiles.mapInPandas(kernel, CHECKSUM_SCHEMA)
