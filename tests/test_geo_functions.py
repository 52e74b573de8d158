"""Geo Column expressions: mercator, tile math (GetTileIndices
semantics), cells, haversine — validated against numpy goldens."""

import numpy as np
from pyspark.sql import functions as F

from gdal_spark.functions import geo


def test_mercator_known_values(spark):
    df = spark.createDataFrame(
        [(0.0, 0.0), (180.0, 0.0), (2.3522, 48.8566)], ["lon", "lat"]
    )
    rows = df.select(
        geo.merc_x("lon").alias("x"), geo.merc_y("lat").alias("y")
    ).collect()
    assert abs(rows[0].x) < 1e-9 and abs(rows[0].y) < 1e-9
    assert abs(rows[1].x - geo.ORIGIN) < 1e-6
    # Paris EPSG:3857, independent closed-form computation
    import math

    want_x = 2.3522 * geo.ORIGIN / 180.0
    want_y = (
        math.log(math.tan((90 + 48.8566) * math.pi / 360)) / math.pi
        * geo.ORIGIN
    )
    assert abs(rows[2].x - want_x) < 1e-6
    assert abs(rows[2].y - want_y) < 1e-6


def test_mercator_roundtrip(spark):
    df = spark.createDataFrame(
        [(float(l), float(t)) for l, t in zip(np.linspace(-179, 179, 21),
                                              np.linspace(-84, 84, 21))],
        ["lon", "lat"],
    )
    rows = (
        df.withColumn("x", geo.merc_x("lon"))
        .withColumn("y", geo.merc_y("lat"))
        .select(
            geo.inv_merc_lon("x").alias("lon2"),
            geo.inv_merc_lat("y").alias("lat2"),
            "lon", "lat",
        )
        .collect()
    )
    for r in rows:
        assert abs(r.lon2 - r.lon) < 1e-9
        assert abs(r.lat2 - r.lat) < 1e-9


def test_tile_assignment_gdal_math(spark):
    """Tile indices follow apps/gdalalg_raster_tile.cpp:457-480:
    floor((x-topLeft)/span + 1e-3), clamped."""
    df = spark.createDataFrame(
        [(0.0, 0.0), (-179.9, 84.9), (179.9, -84.9), (2.3522, 48.8566)],
        ["lon", "lat"],
    )
    z = 10
    rows = (
        df.withColumn("x", geo.merc_x("lon"))
        .withColumn("y", geo.merc_y("lat"))
        .select(
            geo.tile_x("x", z).alias("tx"), geo.tile_y("y", z).alias("ty")
        )
        .collect()
    )
    # (0,0): exactly on the center boundary -> epsilon pushes to 512
    assert (rows[0].tx, rows[0].ty) == (512, 512)
    assert (rows[1].tx, rows[1].ty) == (0, 4)
    assert (rows[2].tx, rows[2].ty) == (1023, 1019)
    # Paris at z=10 is tile (518, 352) (known slippy-map value)
    assert (rows[3].tx, rows[3].ty) == (518, 352)


def test_tile_y_tms_flip(spark):
    df = spark.createDataFrame([(352,)], ["ty"])
    r = df.select(geo.tile_y_tms("ty", 10).alias("tms")).collect()[0]
    assert r.tms == 1023 - 352


def test_cell_id_and_neighbors(spark):
    res = 5
    df = spark.createDataFrame([(2.3522, 48.8566)], ["lon", "lat"])
    cell = df.select(geo.cell_id("lon", "lat", res).alias("c")).collect()[0].c
    n = 1 << res
    tx, ty = divmod(cell, n)
    assert 0 <= tx < n and 0 <= ty < n
    ring = geo.cell_neighbors(cell, res, k=1)
    assert cell in ring and len(ring) == 9


def test_haversine(spark):
    # Paris -> London ~ 343.5 km
    df = spark.createDataFrame([(2.3522, 48.8566, -0.1276, 51.5072)],
                               ["lon1", "lat1", "lon2", "lat2"])
    d = df.select(
        geo.haversine_m("lon1", "lat1", "lon2", "lat2").alias("d")
    ).collect()[0].d
    assert abs(d - 343_500) < 1_500


def test_lcg_geocode_matches_numpy(spark):
    df = spark.range(0, 1000).withColumnRenamed("id", "k")
    rows = df.select(
        F.expr(geo.lon_from_key_sql("k")).alias("lon"),
        F.expr(geo.lat_from_key_sql("k")).alias("lat"),
    ).collect()
    k = np.arange(1000, dtype=np.int64)
    lon = ((k * geo.LON_MULT + geo.LON_ADD) % geo.LCG_M) / geo.LCG_M \
        * 360 - 180
    lat = ((k * geo.LAT_MULT + geo.LAT_ADD) % geo.LCG_M) / geo.LCG_M \
        * 170 - 85
    np.testing.assert_allclose([r.lon for r in rows], lon, atol=1e-12)
    np.testing.assert_allclose([r.lat for r in rows], lat, atol=1e-12)
