"""DEM focal ops (Horn 3x3 + halo exchange) and raster calc /
reclassify / mosaic."""

import numpy as np
from pyspark.sql import functions as F

from gdal_spark.operators.dem import (
    focal_kernel, focal_tiles, mosaic, raster_calc, reclassify,
)
from gdal_spark.operators.rasterize import GridSpec, assemble_raster
from gdal_spark.operators.warp import tiles_from_array

RNG = np.random.RandomState(17)


def _full_reference(arr, op, **kw):
    """Single-array oracle: pad with NaN halo, run the same kernel."""
    canvas = np.full((arr.shape[0] + 2, arr.shape[1] + 2), np.nan)
    canvas[1:-1, 1:-1] = arr
    return focal_kernel(canvas, op, kw.get("xres", 1.0),
                        kw.get("yres", 1.0), kw.get("z_factor", 1.0),
                        kw.get("azimuth", 315.0), kw.get("altitude", 45.0))


def test_focal_tiles_match_single_array(spark):
    """Distributed halo exchange == single-array stencil (interior
    pixels; tile borders are exactly where halos matter)."""
    arr = RNG.uniform(0, 100, (64, 64))
    tiles, w, h = tiles_from_array(spark, arr, tile_size=32)
    grid = GridSpec(0.0, float(h), 1.0, 1.0, w, h)
    for op in ("slope", "hillshade", "tpi", "roughness", "tri"):
        out = focal_tiles(tiles, op)
        got = assemble_raster(out.toPandas(), grid)
        want = _full_reference(arr, op)
        want = np.where(np.isnan(want), 0.0, want)
        np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12,
                                   err_msg=op)


def test_slope_flat_and_ramp():
    flat = np.full((6, 6), 7.0)
    s = _full_reference(flat, "slope")
    np.testing.assert_allclose(s[1:-1, 1:-1], 0.0)
    # 45-degree ramp: dz/dx = 1
    ramp = np.tile(np.arange(6, dtype=float), (6, 1))
    s = _full_reference(ramp, "slope")
    np.testing.assert_allclose(s[1:-1, 1:-1], 45.0)


def test_raster_calc_ndvi_style(spark):
    a = RNG.uniform(1, 10, (32, 32))
    b = RNG.uniform(1, 10, (32, 32))
    ta, _, _ = tiles_from_array(spark, a, tile_size=32)
    tb, _, _ = tiles_from_array(spark, b, tile_size=32)
    out = raster_calc({"a": ta, "b": tb},
                      lambda a, b: (a - b) / (a + b))
    grid = GridSpec(0.0, 32.0, 1.0, 1.0, 32, 32)
    got = assemble_raster(out.toPandas(), grid)
    np.testing.assert_allclose(got, (a - b) / (a + b))


def test_reclassify(spark):
    arr = np.array([[1.0, 5.0], [10.0, 50.0]])
    t, _, _ = tiles_from_array(spark, arr, tile_size=2)
    out = reclassify(t, [(0, 5, 100.0), (5, 20, 200.0)], default=-1.0)
    grid = GridSpec(0.0, 2.0, 1.0, 1.0, 2, 2)
    got = assemble_raster(out.toPandas(), grid)
    np.testing.assert_array_equal(got, [[100, 200], [200, -1]])


def test_mosaic_rules(spark):
    a = np.full((8, 8), 1.0)
    b = np.full((8, 8), 2.0)
    ta, _, _ = tiles_from_array(spark, a, tile_size=8)
    tb, _, _ = tiles_from_array(spark, b, tile_size=8)
    grid = GridSpec(0.0, 8.0, 1.0, 1.0, 8, 8)
    assert assemble_raster(
        mosaic([ta, tb], "last").toPandas(), grid)[0, 0] == 2.0
    assert assemble_raster(
        mosaic([ta, tb], "first").toPandas(), grid)[0, 0] == 1.0
    assert assemble_raster(
        mosaic([ta, tb], "sum").toPandas(), grid)[0, 0] == 3.0


def test_color_relief(spark):
    from gdal_spark.operators.dem import color_relief
    from gdal_spark.operators.warp import tiles_from_array
    from gdal_spark.operators.tiling import decode_tile

    arr = np.linspace(0.0, 100.0, 32 * 32).reshape(32, 32)
    tiles, _, _ = tiles_from_array(spark, arr, tile_size=32)
    ramp = [(0.0, 0, 0, 255), (50.0, 0, 255, 0), (100.0, 255, 0, 0)]
    out = color_relief(tiles, ramp).toPandas()
    assert sorted(out["band"].tolist()) == [1, 2, 3]
    got = {int(r["band"]): decode_tile(r["data"], r["dtype"], 32)
           for _, r in out.iterrows()}
    # oracle: numpy interp per channel, rounded half-up to uint8
    for band, ch in ((1, [0, 0, 255]), (2, [0, 255, 0]),
                     (3, [255, 0, 0])):
        want = np.interp(arr, [0.0, 50.0, 100.0], ch)
        want = np.clip(np.floor(want + 0.5), 0, 255).astype(np.uint8)
        np.testing.assert_array_equal(got[band], want)
    # nearest mode: exact ramp colors only
    out2 = color_relief(tiles, ramp, interpolate=False).toPandas()
    vals = {int(v) for _, r in out2.iterrows()
            for v in np.unique(decode_tile(r["data"], r["dtype"], 32))}
    assert vals <= {0, 255}
