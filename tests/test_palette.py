"""gdal raster rgb-to-palette (median cut, alg/gdalmediancut.cpp)."""

import numpy as np
import pandas as pd
import pytest

from gdal_spark.operators.palette import (
    median_cut_palette, rgb_histogram, rgb_to_palette,
)
from gdal_spark.operators.tiling import TILE_SCHEMA, decode_tile


def _rgb_tiles(spark, r, g, b, ts=16):
    n = r.shape[0] // ts
    rows = []
    for ty in range(n):
        for tx in range(n):
            for band, arr in ((1, r), (2, g), (3, b)):
                blk = arr[ty * ts:(ty + 1) * ts,
                          tx * ts:(tx + 1) * ts]
                rows.append({
                    "zoom": 0, "tile_x": tx, "tile_y": ty,
                    "band": band,
                    "data": np.ascontiguousarray(blk).tobytes(),
                    "dtype": "uint8", "tile_size": ts,
                })
    return spark.createDataFrame(pd.DataFrame(rows), TILE_SCHEMA)


def test_histogram_counts_match_numpy(spark):
    rng = np.random.default_rng(3)
    r = rng.integers(0, 256, (32, 32)).astype(np.uint8)
    g = rng.integers(0, 256, (32, 32)).astype(np.uint8)
    b = rng.integers(0, 256, (32, 32)).astype(np.uint8)
    h = rgb_histogram(_rgb_tiles(spark, r, g, b)).toPandas()
    assert h["n"].sum() == 32 * 32
    code = ((r.astype(np.int64) >> 3) << 10) \
        | ((g.astype(np.int64) >> 3) << 5) | (b.astype(np.int64) >> 3)
    want = pd.Series(code.ravel()).value_counts()
    got = h.set_index("code")["n"]
    assert got.sort_index().equals(
        want.sort_index().astype(np.int64))


def test_few_colors_palette_is_exact(spark):
    """≤ n_colors distinct 5-bit cells -> every color its own box,
    entry == box center == the 8-aligned color itself."""
    py_g, px_g = np.mgrid[0:64, 0:64]
    r = (8 * (px_g % 8)).astype(np.uint8)
    g = (8 * (py_g % 8)).astype(np.uint8)
    b = np.zeros_like(r)
    out, pal = rgb_to_palette(_rgb_tiles(spark, r, g, b))
    assert len(pal) == 64
    assert sorted(map(tuple, pal)) == sorted(
        (8 * i, 8 * j, 0) for i in range(8) for j in range(8))
    pdf = out.toPandas()
    full = np.zeros((64, 64), dtype=np.int64)
    for _, row in pdf.iterrows():
        a = decode_tile(row["data"], row["dtype"], 16)
        full[int(row["tile_y"]) * 16:(int(row["tile_y"]) + 1) * 16,
             int(row["tile_x"]) * 16:(int(row["tile_x"]) + 1) * 16] \
            = a
    # every pixel maps back to exactly its own color
    back = pal[full]
    np.testing.assert_array_equal(back[..., 0], r)
    np.testing.assert_array_equal(back[..., 1], g)


def test_palette_capped_and_mass_conserved(spark):
    rng = np.random.default_rng(9)
    r = rng.integers(0, 256, (64, 64)).astype(np.uint8)
    g = rng.integers(0, 256, (64, 64)).astype(np.uint8)
    b = rng.integers(0, 256, (64, 64)).astype(np.uint8)
    out, pal = rgb_to_palette(_rgb_tiles(spark, r, g, b),
                              n_colors=16)
    assert len(pal) == 16
    pdf = out.toPandas()
    total = sum(
        decode_tile(row["data"], row["dtype"], 16).size
        for _, row in pdf.iterrows())
    assert total == 64 * 64
    idx_max = max(
        decode_tile(row["data"], row["dtype"], 16).max()
        for _, row in pdf.iterrows())
    assert idx_max < 16


def test_median_cut_split_rules():
    """Two heavy colors far apart on red -> first split separates
    them along red at the reference's total/2 rule."""
    codes = np.array([(0 << 10), (31 << 10)], dtype=np.int64)
    counts = np.array([300, 100], dtype=np.int64)
    pal = median_cut_palette(codes, counts, n_colors=2)
    assert len(pal) == 2
    assert sorted(p[0] for p in pal) == [0, 248]
