"""Contour: marching squares + cross-tile segment parity."""

import numpy as np

from gdal_spark.operators.contour import (
    contour_tiles, marching_squares_segments, stitch_segments,
)
from gdal_spark.operators.warp import tiles_from_array

RNG = np.random.RandomState(41)


def test_single_cell_cases():
    # one pixel above the level in a 2x2 grid -> one corner segment
    arr = np.array([[5.0, 0.0], [0.0, 0.0]])
    segs = marching_squares_segments(arr, 1.0)
    assert len(segs) == 1
    # crossing points interpolate at t=(1-5)/(0-5)=0.8 along edges
    s = segs[0]
    np.testing.assert_allclose(sorted([s[0], s[2]]), [0.5, 1.3])


def test_closed_contour_stitches():
    # radial bump -> closed iso-line
    yy, xx = np.mgrid[0:32, 0:32]
    arr = 10.0 - np.hypot(xx - 16, yy - 16)
    segs = marching_squares_segments(arr, 5.0)
    lines = stitch_segments(segs)
    assert len(lines) == 1
    line = lines[0]
    # closed ring: first == last endpoint
    np.testing.assert_allclose(line[0], line[-1])
    # circle of radius 5 around (16.5, 16.5): perimeter ~ 2*pi*5
    d = np.diff(line, axis=0)
    perim = np.hypot(d[:, 0], d[:, 1]).sum()
    assert abs(perim - 2 * np.pi * 5) < 2.0


def test_distributed_segments_match_single_array(spark):
    arr = RNG.uniform(0, 10, (64, 64))
    # smooth it for fewer degenerate crossings
    k = np.ones((5, 5)) / 25.0
    sm = arr.copy()
    for _ in range(2):
        pad = np.pad(sm, 2, mode="edge")
        out = np.zeros_like(sm)
        for dy in range(5):
            for dx in range(5):
                out += pad[dy:dy + 64, dx:dx + 64] * k[dy, dx]
        sm = out
    tiles, w, h = tiles_from_array(spark, sm, tile_size=32)
    gt = [0.0, 1.0, 0.0, 64.0, 0.0, -1.0]
    got = contour_tiles(tiles, [5.0], gt).toPandas()
    want = marching_squares_segments(sm, 5.0)
    # georeference the oracle
    wx1 = gt[0] + want[:, 0] * gt[1]
    wy1 = gt[3] + want[:, 1] * gt[5]
    wx2 = gt[0] + want[:, 2] * gt[1]
    wy2 = gt[3] + want[:, 3] * gt[5]

    def canon(x1, y1, x2, y2):
        a = np.round(np.column_stack([x1, y1, x2, y2]), 9)
        swap = (a[:, 0] > a[:, 2]) | ((a[:, 0] == a[:, 2])
                                      & (a[:, 1] > a[:, 3]))
        a[swap] = a[swap][:, [2, 3, 0, 1]]
        return set(map(tuple, a))

    got_set = canon(got["x1"], got["y1"], got["x2"], got["y2"])
    want_set = canon(wx1, wy1, wx2, wy2)
    assert got_set == want_set


def test_contour_polygons_partition_and_parity(spark):
    """Polygon mode: bands partition the raster (pixel counts sum to
    the raster size), level ranges attach correctly, and the
    distributed output equals the single-array path on the classified
    raster."""
    import pandas as pd
    from gdal_spark.operators.contour import contour_polygons
    from gdal_spark.operators.polygonize import polygonize_array
    from gdal_spark.operators.warp import tiles_from_array

    h = w = 64
    jj, ii = np.mgrid[0:h, 0:w]
    arr = (np.sin(ii / 9.0) * 3 + jj * 0.1).astype(np.float64)
    gt = [0.0, 1.0, 0.0, float(h), 0.0, -1.0]
    levels = [1.0, 3.0, 5.0]
    tiles, _, _ = tiles_from_array(spark, arr, tile_size=16)
    got = contour_polygons(tiles, levels, gt).toPandas()

    assert got["n_pixels"].sum() == h * w
    # level ranges: lowest band open below, highest open above
    assert got.loc[got["band"] == 0, "level_min"].isna().all()
    assert (got.loc[got["band"] == 1, "level_min"] == 1.0).all()
    assert (got.loc[got["band"] == 1, "level_max"] == 3.0).all()
    assert got.loc[got["band"] == 3, "level_max"].isna().all()

    # parity with the single-array path on the same classification
    band_arr = np.digitize(arr, np.array(levels)).astype(np.float64)
    want = polygonize_array(band_arr, gt, nodata=None)
    gsum = got.groupby("band")["n_pixels"].sum().sort_index()
    wsum = want.assign(band=want["value"].astype(int)) \
        .groupby("band")["n_pixels"].sum().sort_index()
    pd.testing.assert_series_equal(gsum, wsum, check_names=False)
    assert len(got) == len(want)
