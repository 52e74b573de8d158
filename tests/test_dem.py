"""gdaldem hillshade variants (combined/multidirectional/igor)
vs literal translations of the reference C loops."""

def test_hillshade_variants_reference_formulas(spark):
    """-combined / -multidirectional / -igor (gdaldem_lib.cpp
    GDALHillshadeCombinedAlg:1151 / MultiDirectionalAlg:1253 /
    IgorAlg:947) vs a literal per-pixel translation of the C loops."""
    import numpy as np

    from gdal_spark.operators.dem import focal_tiles
    from gdal_spark.operators.tiling import TILE_SCHEMA, decode_tile
    import pandas as pd

    rng = np.random.default_rng(77)
    arr = rng.uniform(0, 80, (32, 32))
    rows = []
    for ty in range(2):
        for tx in range(2):
            blk = arr[ty * 16:(ty + 1) * 16, tx * 16:(tx + 1) * 16]
            rows.append({"zoom": 0, "tile_x": tx, "tile_y": ty,
                         "band": 1,
                         "data": np.ascontiguousarray(blk).tobytes(),
                         "dtype": "float64", "tile_size": 16})
    df = spark.createDataFrame(pd.DataFrame(rows), TILE_SCHEMA)
    z, alt, az = 2.0, 45.0, 315.0
    zf = z / 8.0

    def grads(y, x):
        win = arr[y - 1:y + 2, x - 1:x + 2]
        X = ((win[0, 0] + 2 * win[1, 0] + win[2, 0])
             - (win[0, 2] + 2 * win[1, 2] + win[2, 2])) / 1.0
        Y = -((win[2, 0] + 2 * win[2, 1] + win[2, 2])
              - (win[0, 0] + 2 * win[0, 1] + win[0, 2])) / 1.0
        return X, Y

    sin_a, cos_a = np.sin(np.radians(alt)), np.cos(np.radians(alt))

    def brute_multi(y, x):
        X, Y = grads(y, x)
        r = X * X + Y * Y
        if r == 0:
            return 1.0 + 254.0 * sin_a
        czf = cos_a * zf
        c225 = np.cos(np.radians(225.0))
        v225 = max(sin_a + (X - Y) * c225 * czf, 0.0)
        v270 = max(sin_a - X * czf, 0.0)
        v315 = max(sin_a + (X + Y) * c225 * czf, 0.0)
        v360 = max(sin_a - Y * czf, 0.0)
        w225 = 0.5 * r - X * Y
        w270 = X * X
        w315 = r - w225
        w360 = Y * Y
        num = (w225 * v225 + w270 * v270 + w315 * v315
               + w360 * v360) / r
        return 1.0 + 127.0 * num / np.sqrt(1.0 + zf * zf * r)

    def brute_combined(y, x):
        X, Y = grads(y, x)
        r = X * X + Y * Y
        az_r = np.radians(az)
        czf = cos_a * zf
        shade = (sin_a - (Y * np.cos(az_r) * czf
                          - X * np.sin(az_r) * czf)) \
            / np.sqrt(1.0 + zf * zf * r)
        cang = 1.0 - np.arccos(np.clip(shade, -1, 1)) \
            * np.arctan(np.sqrt(zf * zf * r)) \
            * (4.0 / np.pi ** 2)
        return 1.0 if cang <= 0 else 1.0 + 254.0 * cang

    def brute_igor(y, x):
        win = arr[y - 1:y + 2, x - 1:x + 2]
        X, Y = grads(y, x)
        slope_deg = np.degrees(np.arctan(
            np.sqrt(X * X + Y * Y) * zf))
        dx2 = ((win[0, 2] + 2 * win[1, 2] + win[2, 2])
               - (win[0, 0] + 2 * win[1, 0] + win[2, 0]))
        dy2 = ((win[2, 0] + 2 * win[2, 1] + win[2, 2])
               - (win[0, 0] + 2 * win[0, 1] + win[0, 2]))
        aspect = np.arctan2(dy2, -dx2)
        target = 1.5 * np.pi - np.radians(az)
        d = abs(aspect - target) % (2 * np.pi)
        d = min(d, 2 * np.pi - d)
        return 255.0 * (1.0 - (slope_deg / 90.0)
                        * (1.0 - d / np.pi))

    for op, brute in (("hillshade-multidirectional", brute_multi),
                      ("hillshade-combined", brute_combined),
                      ("hillshade-igor", brute_igor)):
        out = focal_tiles(df, op, z_factor=z, azimuth=az,
                          altitude=alt).toPandas()
        got = np.full((32, 32), np.nan)
        for _, rrow in out.iterrows():
            aa = decode_tile(rrow["data"], rrow["dtype"], 16)
            got[int(rrow["tile_y"]) * 16:
                (int(rrow["tile_y"]) + 1) * 16,
                int(rrow["tile_x"]) * 16:
                (int(rrow["tile_x"]) + 1) * 16] = aa
        for y, x in [(5, 5), (10, 20), (25, 7), (16, 16)]:
            assert got[y, x] == __import__("pytest").approx(
                brute(y, x), rel=1e-9), (op, y, x)


def test_zevenbergen_thorne_gradients(spark):
    """--alg ZevenbergenThorne (gdaldem_lib.cpp:798 central
    differences): on the plane z = 3x + 4y the ZT gradients are
    EXACT (dzdx=3, dzdy=4), so slope/aspect are closed-form."""
    import numpy as np
    import pandas as pd

    from gdal_spark.operators.dem import focal_tiles
    from gdal_spark.operators.tiling import TILE_SCHEMA, decode_tile

    jj, ii = np.mgrid[0:32, 0:32]
    arr = (3.0 * ii + 4.0 * jj).astype(np.float64)
    rows = []
    for ty in range(2):
        for tx in range(2):
            blk = arr[ty * 16:(ty + 1) * 16, tx * 16:(tx + 1) * 16]
            rows.append({"zoom": 0, "tile_x": tx, "tile_y": ty,
                         "band": 1,
                         "data": np.ascontiguousarray(blk).tobytes(),
                         "dtype": "float64", "tile_size": 16})
    df = spark.createDataFrame(pd.DataFrame(rows), TILE_SCHEMA)

    def center(op, **kw):
        out = focal_tiles(df, op, alg="zt", **kw).toPandas() \
            .set_index(["tile_x", "tile_y"])
        aa = decode_tile(out.loc[(0, 0), "data"],
                         out.loc[(0, 0), "dtype"], 16)
        return aa[8, 8]

    import pytest as _pt

    want_slope = np.degrees(np.arctan(np.hypot(3.0, 4.0)))
    assert center("slope") == _pt.approx(want_slope)
    # aspect: atan2(dzdy, -dzdx) mapped to geographic degrees
    asp = np.degrees(np.arctan2(4.0, -3.0))
    want_aspect = 90.0 - asp if 0 <= asp <= 90 else (
        90.0 - asp if asp < 0 else 360.0 - asp + 90.0)
    assert center("aspect") == _pt.approx(want_aspect % 360.0)
    # pipeline verb plumbs the alg through
    from gdal_spark.plans.raster_pipeline import run_raster_pipeline

    out = run_raster_pipeline(spark, "read t ! slope zt",
                              layers={"t": df}).toPandas() \
        .set_index(["tile_x", "tile_y"])
    aa = decode_tile(out.loc[(0, 0), "data"],
                     out.loc[(0, 0), "dtype"], 16)
    assert aa[8, 8] == _pt.approx(want_slope)
