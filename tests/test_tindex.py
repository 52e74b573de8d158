"""gdaltindex / ogrtindex analogs (sources/tindex.py).

Reference: apps/gdaltindex_lib.cpp (extent polygon + location field
per raster), apps/ogrtindex.cpp.  Header-only probes must agree with
the data actually written; the scan fallback must agree with the
header path.
"""

import os

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from gdal_spark.functions import geo
from gdal_spark.geometry import wkb as W
from gdal_spark.sources.tindex import raster_index, vector_index


@pytest.fixture(scope="module")
def gtiff_pyramid(spark, tmp_path_factory):
    from gdal_spark.operators.tiling import TILE_SCHEMA, write_tiles

    rows = []
    for tx, ty in [(0, 0), (1, 2), (3, 3)]:
        arr = np.full((16, 16), tx * 10 + ty, dtype=np.uint8)
        rows.append({"zoom": 2, "tile_x": tx, "tile_y": ty,
                     "band": 1, "data": arr.tobytes(),
                     "dtype": "uint8", "tile_size": 16})
    tiles = spark.createDataFrame(pd.DataFrame(rows), TILE_SCHEMA)
    out = str(tmp_path_factory.mktemp("tindex") / "pyr")
    write_tiles(tiles, out, format="gtiff")
    return out


def test_raster_index_extents_from_headers(spark, gtiff_pyramid):
    idx = raster_index(spark, gtiff_pyramid).toPandas() \
        .sort_values("location").reset_index(drop=True)
    assert len(idx) == 3
    span = geo.tile_span(2)
    for _, r in idx.iterrows():
        parts = r["location"].split(os.sep)
        ty = int(parts[-1].split(".")[0])
        tx = int(parts[-2])
        assert r["minx"] == pytest.approx(-geo.ORIGIN + tx * span)
        assert r["maxy"] == pytest.approx(geo.ORIGIN - ty * span)
        assert r["maxx"] - r["minx"] == pytest.approx(span)
        assert r["width"] == 16 and r["height"] == 16
        assert r["epsg"] == 3857
        assert r["xres"] == pytest.approx(span / 16)


def test_raster_index_pixel_size_filter(spark, gtiff_pyramid):
    span = geo.tile_span(2)
    res = span / 16
    assert raster_index(spark, gtiff_pyramid,
                        min_pixel_size=res * 2).count() == 0
    assert raster_index(spark, gtiff_pyramid,
                        max_pixel_size=res * 2).count() == 3
    assert raster_index(
        spark, gtiff_pyramid,
        filename_filter="0.tif").count() == 1


def test_raster_index_geometry_polygon(spark, gtiff_pyramid):
    idx = raster_index(spark, gtiff_pyramid,
                       with_geometry=True).toPandas()
    for _, r in idx.iterrows():
        g = W.parse_wkb(bytes(r["geometry"]))
        ring = g.parts[0]
        xs, ys = ring[:, 0], ring[:, 1]
        assert xs.min() == r["minx"] and xs.max() == r["maxx"]
        assert ys.min() == r["miny"] and ys.max() == r["maxy"]
        area = 0.5 * abs(np.sum(xs[:-1] * ys[1:] - xs[1:] * ys[:-1]))
        want = (r["maxx"] - r["minx"]) * (r["maxy"] - r["miny"])
        assert area == pytest.approx(want)


def _pts_frame(spark, n, dx=0.0):
    rng = np.random.default_rng(11)
    lon = np.round(rng.uniform(-50, 50, n) + dx, 6)
    lat = np.round(rng.uniform(-30, 30, n), 6)
    pdf = pd.DataFrame({
        "fid": np.arange(n, dtype=np.int64),
        "geometry": [W.point_wkb(float(a), float(b))
                     for a, b in zip(lon, lat)],
        "name": [f"p{i}" for i in range(n)],
    })
    return spark.createDataFrame(pdf), lon, lat


def test_vector_index_header_paths(spark, tmp_path):
    from gdal_spark.sources.flatgeobuf import write_flatgeobuf
    from gdal_spark.sources.geopackage import write_gpkg
    from gdal_spark.sources.geoparquet import write_geoparquet
    from gdal_spark.sources.shapefile import write_shapefile

    df, lon, lat = _pts_frame(spark, 200)
    shp = str(tmp_path / "a.shp")
    fgb = str(tmp_path / "b.fgb")
    gpkg = str(tmp_path / "c.gpkg")
    gpq = str(tmp_path / "d_parquet")
    write_shapefile(df, shp, mode="single")
    write_flatgeobuf(df.coalesce(1), fgb, mode="single")
    write_gpkg(df, gpkg, mode="single")
    write_geoparquet(df.coalesce(1), gpq)

    idx = vector_index(spark, [shp, fgb, gpkg, gpq]).toPandas()
    assert len(idx) == 4
    for _, r in idx.iterrows():
        assert r["minx"] == pytest.approx(lon.min(), abs=1e-6)
        assert r["maxx"] == pytest.approx(lon.max(), abs=1e-6)
        assert r["miny"] == pytest.approx(lat.min(), abs=1e-6)
        assert r["maxy"] == pytest.approx(lat.max(), abs=1e-6)
    counted = idx[idx["n_features"] >= 0]
    assert (counted["n_features"] == 200).all()


def test_vector_index_scan_fallback_matches(spark, tmp_path):
    from gdal_spark.sources.geojson import write_geojson
    from gdal_spark.sources.shapefile import write_shapefile

    df, lon, lat = _pts_frame(spark, 150, dx=3.0)
    gj = str(tmp_path / "scan.geojson")
    shp = str(tmp_path / "hdr.shp")
    write_geojson(df, gj, mode="single")
    write_shapefile(df, shp, mode="single")
    idx = vector_index(spark, [gj, shp]).toPandas() \
        .set_index("location")
    a, b = idx.loc[gj], idx.loc[shp]
    for c in ("minx", "miny", "maxx", "maxy"):
        assert a[c] == pytest.approx(b[c], abs=1e-6)
    assert a["n_features"] == 150


def test_vector_index_directory_listing(spark, tmp_path):
    from gdal_spark.sources.shapefile import write_shapefile

    for i in range(3):
        df, _, _ = _pts_frame(spark, 40, dx=float(i))
        write_shapefile(df, str(tmp_path / f"t{i}.shp"),
                        mode="single")
    idx = vector_index(spark, str(tmp_path))
    assert idx.count() == 3
