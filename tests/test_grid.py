"""Grid interpolation + sample-at-points vs numpy oracles."""

import numpy as np
import pandas as pd

from gdal_spark.operators.grid import grid_interpolate, sample_at_points
from gdal_spark.operators.rasterize import GridSpec, assemble_raster
from gdal_spark.operators.warp import tiles_from_array

RNG = np.random.RandomState(23)


def _points(spark, n=50):
    pdf = pd.DataFrame({
        "x": RNG.uniform(0, 64, n),
        "y": RNG.uniform(0, 64, n),
        "v": RNG.uniform(0, 100, n),
    })
    return spark.createDataFrame(pdf), pdf


def test_invdist_matches_oracle(spark):
    pts, pdf = _points(spark)
    grid = GridSpec(0.0, 64.0, 1.0, 1.0, 64, 64)
    out = grid_interpolate(pts, grid, "invdist", tile_size=32)
    got = assemble_raster(out.toPandas(), grid)
    jj, ii = np.mgrid[0:64, 0:64]
    cx = (ii + 0.5)[..., None]
    cy = (64.0 - (jj + 0.5))[..., None]
    d2 = (cx - pdf["x"].to_numpy()) ** 2 + (cy - pdf["y"].to_numpy()) ** 2
    w = 1.0 / d2
    want = (w * pdf["v"].to_numpy()).sum(-1) / w.sum(-1)
    np.testing.assert_allclose(got, want, rtol=1e-9)


def test_nearest_with_radius(spark):
    pts, pdf = _points(spark, 20)
    grid = GridSpec(0.0, 64.0, 1.0, 1.0, 64, 64)
    out = grid_interpolate(pts, grid, "nearest", radius=10.0,
                           nodata=-1.0, tile_size=32)
    got = assemble_raster(out.toPandas(), grid)
    jj, ii = np.mgrid[0:64, 0:64]
    cx = (ii + 0.5)[..., None]
    cy = (64.0 - (jj + 0.5))[..., None]
    d2 = (cx - pdf["x"].to_numpy()) ** 2 + (cy - pdf["y"].to_numpy()) ** 2
    k = np.argmin(d2, axis=-1)
    dmin = np.take_along_axis(d2, k[..., None], -1)[..., 0]
    want = np.where(dmin <= 100.0, pdf["v"].to_numpy()[k], -1.0)
    np.testing.assert_allclose(got, want)


def test_count_metric(spark):
    pts, pdf = _points(spark, 30)
    grid = GridSpec(0.0, 64.0, 8.0, 8.0, 8, 8)
    out = grid_interpolate(pts, grid, "count", radius=16.0, tile_size=8)
    got = assemble_raster(out.toPandas(), grid)
    assert got.sum() > 0


def test_sample_at_points_near_and_bilinear(spark):
    arr = RNG.uniform(0, 50, (64, 64))
    tiles, w, h = tiles_from_array(spark, arr, tile_size=32)
    grid = GridSpec(0.0, 64.0, 1.0, 1.0, 64, 64)
    pdf = pd.DataFrame({
        "k": np.arange(100, dtype=np.int64),
        "x": RNG.uniform(1, 63, 100),
        "y": RNG.uniform(1, 63, 100),
    })
    pts = spark.createDataFrame(pdf)
    near = sample_at_points(tiles, grid, pts, "near", tile_size=32) \
        .toPandas().set_index("k").sort_index()
    px = pdf["x"].to_numpy()
    py = 64.0 - pdf["y"].to_numpy()
    want = arr[np.floor(py).astype(int), np.floor(px).astype(int)]
    np.testing.assert_allclose(near["sample"].to_numpy(), want)

    bil = sample_at_points(tiles, grid, pts, "bilinear", tile_size=32) \
        .toPandas().set_index("k").sort_index()
    # oracle bilinear on pixel centers
    fx = px - 0.5
    fy = py - 0.5
    x0 = np.floor(fx).astype(int).clip(0, 62)
    y0 = np.floor(fy).astype(int).clip(0, 62)
    tx = fx - x0
    ty = fy - y0
    want_b = (arr[y0, x0] * (1 - tx) * (1 - ty)
              + arr[y0, x0 + 1] * tx * (1 - ty)
              + arr[y0 + 1, x0] * (1 - tx) * ty
              + arr[y0 + 1, x0 + 1] * tx * ty)
    np.testing.assert_allclose(bil["sample"].to_numpy(), want_b,
                               rtol=1e-12)


def test_nearest_tie_break_deterministic(spark):
    """Two points exactly equidistant from a pixel center must
    resolve by the (distance, value) lexicographic rule — the same
    result for every partitioning / point order."""
    import numpy as np
    import pandas as pd

    from gdal_spark.operators.grid import grid_interpolate
    from gdal_spark.operators.rasterize import (
        GridSpec, assemble_raster,
    )

    grid = GridSpec(0.0, 2.0, 2.0, 2.0, 1, 1)  # one pixel, center (1,1)
    for order in ([(0.0, 1.0, 9.0), (2.0, 1.0, 4.0)],
                  [(2.0, 1.0, 4.0), (0.0, 1.0, 9.0)]):
        pts = spark.createDataFrame(
            pd.DataFrame(order, columns=["x", "y", "v"])).repartition(2)
        out = grid_interpolate(pts, grid, "nearest", radius=0.0)
        arr = assemble_raster(out.toPandas(), grid)
        assert arr[0, 0] == 4.0  # smaller value wins the exact tie
