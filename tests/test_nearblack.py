"""gdal raster clean-collar (nearblack flood fill).

Brute-force reference: a literal BFS 4-connected flood fill from the
raster border over the near-color mask.  The distributed
label-propagation loop must match it exactly, including interior
near-color lakes staying untouched and collars that snake across
many tiles.
"""

from collections import deque

import numpy as np
import pandas as pd
import pytest

from gdal_spark.operators.nearblack import clean_collar_tiles
from gdal_spark.operators.tiling import TILE_SCHEMA, decode_tile


def _brute(arr, colors, thr, out_val):
    h, w = arr.shape
    near = np.zeros((h, w), dtype=bool)
    for c in colors:
        near |= np.abs(arr.astype(np.float64) - c) <= thr
    filled = np.zeros((h, w), dtype=bool)
    q = deque()
    for i in range(h):
        for j in (0, w - 1):
            if near[i, j] and not filled[i, j]:
                filled[i, j] = True
                q.append((i, j))
    for j in range(w):
        for i in (0, h - 1):
            if near[i, j] and not filled[i, j]:
                filled[i, j] = True
                q.append((i, j))
    while q:
        i, j = q.popleft()
        for di, dj in ((1, 0), (-1, 0), (0, 1), (0, -1)):
            ni, nj = i + di, j + dj
            if 0 <= ni < h and 0 <= nj < w and near[ni, nj] \
                    and not filled[ni, nj]:
                filled[ni, nj] = True
                q.append((ni, nj))
    out = arr.copy()
    out[filled] = out_val
    return out, filled


def _tiles(spark, arr, ts):
    n = arr.shape[0] // ts
    rows = []
    for ty in range(n):
        for tx in range(n):
            blk = arr[ty * ts:(ty + 1) * ts, tx * ts:(tx + 1) * ts]
            rows.append({"zoom": 0, "tile_x": tx, "tile_y": ty,
                         "band": 1,
                         "data": np.ascontiguousarray(blk).tobytes(),
                         "dtype": str(blk.dtype), "tile_size": ts})
    return spark.createDataFrame(pd.DataFrame(rows), TILE_SCHEMA)


def _assemble(pdf, size, ts):
    out = np.full((size, size), np.nan)
    for _, r in pdf.iterrows():
        a = decode_tile(r["data"], r["dtype"], int(r["tile_size"]))
        out[int(r["tile_y"]) * ts:(int(r["tile_y"]) + 1) * ts,
            int(r["tile_x"]) * ts:(int(r["tile_x"]) + 1) * ts] = a
    return out


def test_jagged_collar_with_interior_lake(spark):
    arr = np.full((64, 64), 200, dtype=np.uint8)
    rng = np.random.default_rng(5)
    for j in range(64):                      # jagged top/bottom bands
        arr[:3 + (j * 7) % 9, j] = rng.integers(0, 12)
        arr[64 - (2 + (j * 5) % 7):, j] = rng.integers(0, 12)
    arr[28:36, 28:36] = 4                    # interior near-black lake
    want, filled = _brute(arr, [0.0], 15.0, 0)
    assert filled[:2, :].all() and not filled[28:36, 28:36].any()
    got = _assemble(
        clean_collar_tiles(_tiles(spark, arr, 16), color=0.0,
                           threshold=15.0).toPandas(), 64, 16)
    np.testing.assert_array_equal(got, want)


def test_snake_channel_multi_round(spark):
    """A 1-px near-black channel snaking through every tile row —
    forces multiple propagation rounds."""
    arr = np.full((64, 64), 255, dtype=np.uint8)
    # serpentine: rows 8, 24, 40, 56 black, connected alternately
    for k, row in enumerate((8, 24, 40, 56)):
        arr[row, :] = 0
    arr[8:25, 62] = 0
    arr[24:41, 1] = 0
    arr[40:57, 62] = 0
    arr[56, 0] = 0
    arr[8, 0] = 0                            # touches the left edge
    want, filled = _brute(arr, [0.0], 10.0, 0)
    assert filled[56, 30]                    # reached the last row
    got = _assemble(
        clean_collar_tiles(_tiles(spark, arr, 16), color=0.0,
                           threshold=10.0).toPandas(), 64, 16)
    np.testing.assert_array_equal(got, want)


def test_black_and_white_collar_with_set_value(spark):
    arr = np.full((32, 32), 128, dtype=np.uint8)
    arr[:4, :] = 2                           # near-black top
    arr[-4:, :] = 253                        # near-white bottom
    arr[10:14, 10:14] = 250                  # white lake survives
    want, _ = _brute(arr, [0.0, 255.0], 10.0, 7)
    got = _assemble(
        clean_collar_tiles(_tiles(spark, arr, 16),
                           color=[0.0, 255.0], threshold=10.0,
                           set_value=7).toPandas(), 32, 16)
    np.testing.assert_array_equal(got, want)
    assert (got[10:14, 10:14] == 250).all()


def test_no_collar_is_identity(spark):
    arr = np.full((32, 32), 99, dtype=np.uint8)
    got = _assemble(
        clean_collar_tiles(_tiles(spark, arr, 16),
                           color=0.0).toPandas(), 32, 16)
    np.testing.assert_array_equal(got, arr)


def test_float_tiles_and_nodata_value(spark):
    arr = np.full((32, 32), 1.5, dtype=np.float64)
    arr[:, :5] = 0.01
    got = _assemble(
        clean_collar_tiles(_tiles(spark, arr, 16), color=0.0,
                           threshold=0.1,
                           set_value=-9999.0).toPandas(), 32, 16)
    assert (got[:, :5] == -9999.0).all()
    assert (got[:, 5:] == 1.5).all()
