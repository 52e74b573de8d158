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


def test_data_metrics_radius(spark):
    """minimum/maximum/range/average_distance vs the brute window
    (GDALGridDataMetric* family, alg/gdalgrid.cpp)."""
    pts, pdf = _points(spark, n=80)
    grid = GridSpec(0.0, 64.0, 4.0, 4.0, 16, 16)
    r = 9.0
    jj, ii = np.mgrid[0:16, 0:16]
    cx = (ii * 4.0 + 2.0)[..., None]
    cy = (64.0 - (jj * 4.0 + 2.0))[..., None]
    d2 = (cx - pdf["x"].to_numpy()) ** 2 \
        + (cy - pdf["y"].to_numpy()) ** 2
    mask = d2 <= r * r
    cnt = mask.sum(-1)
    vs = pdf["v"].to_numpy()
    mn = np.where(mask, vs, np.inf).min(-1)
    mx = np.where(mask, vs, -np.inf).max(-1)
    wants = {
        "minimum": np.where(cnt > 0, mn, -9.0),
        "maximum": np.where(cnt > 0, mx, -9.0),
        "range": np.where(cnt > 0, mx - mn, -9.0),
        "average_distance": np.where(
            cnt > 0,
            np.where(mask, np.sqrt(d2), 0.0).sum(-1)
            / np.maximum(cnt, 1), -9.0),
    }
    for alg, want in wants.items():
        out = grid_interpolate(pts, grid, alg, radius=r,
                               nodata=-9.0, tile_size=8)
        got = assemble_raster(out.toPandas(), grid)
        np.testing.assert_allclose(got, want, rtol=1e-12,
                                   err_msg=alg)


def test_data_metrics_radius0_constant_fill(spark):
    pts, pdf = _points(spark, n=30)
    grid = GridSpec(0.0, 16.0, 1.0, 1.0, 16, 16)
    vs = pdf["v"].to_numpy()
    for alg, want in (("minimum", vs.min()), ("maximum", vs.max()),
                      ("range", vs.max() - vs.min())):
        out = grid_interpolate(pts, grid, alg, tile_size=16)
        got = assemble_raster(out.toPandas(), grid)
        np.testing.assert_allclose(got, np.full((16, 16), want),
                                   err_msg=alg)


def test_invdistnn_limits_to_nearest(spark):
    """invdistnn == invdist computed over only the max_points
    nearest points inside the radius
    (GDALGridInverseDistanceToAPowerNearestNeighbor)."""
    pts, pdf = _points(spark, n=60)
    grid = GridSpec(0.0, 64.0, 4.0, 4.0, 16, 16)
    r, mp = 20.0, 4
    out = grid_interpolate(pts, grid, "invdistnn", radius=r,
                           max_points=mp, nodata=-9.0, tile_size=8)
    got = assemble_raster(out.toPandas(), grid)
    xs, ys, vs = (pdf[c].to_numpy() for c in ("x", "y", "v"))
    want = np.full((16, 16), -9.0)
    for j in range(16):
        for i in range(16):
            cx, cy = i * 4.0 + 2.0, 64.0 - (j * 4.0 + 2.0)
            d2 = (cx - xs) ** 2 + (cy - ys) ** 2
            sel = np.argsort(d2)
            sel = sel[d2[sel] <= r * r][:mp]
            if len(sel) == 0:
                continue
            w = 1.0 / d2[sel]
            want[j, i] = (w * vs[sel]).sum() / w.sum()
    np.testing.assert_allclose(got, want, rtol=1e-9)


def test_invdistnn_needs_radius(spark):
    import pytest

    pts, _ = _points(spark, n=5)
    grid = GridSpec(0.0, 8.0, 1.0, 1.0, 8, 8)
    with pytest.raises(ValueError, match="radius"):
        grid_interpolate(pts, grid, "invdistnn")
    with pytest.raises(ValueError, match="radius"):
        grid_interpolate(pts, grid, "average_distance")


def test_vector_pipeline_grid_verb(spark):
    """gdal vector grid as a pipeline step -> tile frame."""
    from gdal_spark.plans.pipeline import run_vector_pipeline

    pts, pdf = _points(spark, n=40)
    out = run_vector_pipeline(
        spark,
        "read p ! grid minimum 0 64 4 4 16 16 9.0 -9.0",
        layers={"p": pts})
    got = assemble_raster(out.toPandas(),
                          GridSpec(0.0, 64.0, 4.0, 4.0, 16, 16))
    assert got.shape == (16, 16)
    vs = pdf["v"].to_numpy()
    assert ((got == -9.0) | ((got >= vs.min() - 1e-9)
                             & (got <= vs.max() + 1e-9))).all()
