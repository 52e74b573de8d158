"""Unified open/info surface tests (sources/registry.py).

Parity model: ogr.Open's driver-probe loop and ogrinfo/gdalinfo
-json (apps/ogrinfo_lib.cpp, gdalinfo_lib.cpp).  Every format the
engine writes must open back through the ONE entry point with the
uniform (fid, geometry, fields...) shape; info numbers must equal
the known fixture values.
"""

import os
import shutil

import numpy as np
import pandas as pd
import pytest

from gdal_spark.geometry.wkb import point_wkb
from gdal_spark.sources.registry import (
    open_vector, raster_info, sniff_vector_driver, vector_info,
)


def _pts_df(spark, n=60, seed=4):
    rng = np.random.default_rng(seed)
    pdf = pd.DataFrame({
        "geometry": [point_wkb(float(x), float(y))
                     for x, y in rng.uniform(0, 10, (n, 2))],
        "k": np.arange(n, dtype=np.int64),
        "tag": [f"t{i % 5}" for i in range(n)],
    })
    from pyspark.sql.types import (
        BinaryType, LongType, StringType, StructField, StructType,
    )
    return spark.createDataFrame(pdf, StructType(
        [StructField("geometry", BinaryType()),
         StructField("k", LongType()),
         StructField("tag", StringType())])), pdf


@pytest.mark.parametrize("writer,suffix", [
    ("fgb", ".fgb"), ("gpkg", ".gpkg"), ("geojson", ""),
    ("gpx", ""), ("kml", ""), ("shp", ""), ("csv", ""),
])
def test_open_vector_every_format(spark, tmp_path, writer, suffix):
    df, pdf = _pts_df(spark)
    out = str(tmp_path / f"layer{suffix}")
    if writer == "fgb":
        from gdal_spark.sources.flatgeobuf import write_flatgeobuf
        write_flatgeobuf(df, out, mode="single")
    elif writer == "gpkg":
        from gdal_spark.sources.geopackage import write_gpkg
        write_gpkg(df, out, mode="single")
    elif writer == "geojson":
        from gdal_spark.sources.geojson import write_geojson
        write_geojson(df.withColumnRenamed("k", "fid"), out)
    elif writer == "gpx":
        from gdal_spark.sources.xmlgeo import write_gpx
        write_gpx(df.selectExpr("geometry",
                                "CAST(k AS STRING) AS name"), out)
    elif writer == "kml":
        from gdal_spark.sources.xmlgeo import write_kml
        write_kml(df.selectExpr("geometry",
                                "CAST(k AS STRING) AS name"), out)
    elif writer == "shp":
        from gdal_spark.sources.shapefile import write_shapefile
        write_shapefile(df, out)
    else:
        from gdal_spark.sources.csvfile import write_csv_layer
        write_csv_layer(df, out, create_csvt=True)
    back = open_vector(spark, out)
    assert back.count() == len(pdf)
    assert "geometry" in back.columns


def test_sniff_by_magic_without_extension(spark, tmp_path):
    df, _ = _pts_df(spark, n=10)
    from gdal_spark.sources.flatgeobuf import write_flatgeobuf
    from gdal_spark.sources.geopackage import write_gpkg
    p1 = str(tmp_path / "layer1.fgb")
    write_flatgeobuf(df, p1, mode="single")
    bare1 = str(tmp_path / "noext1")
    shutil.copy(p1, bare1)
    assert sniff_vector_driver(bare1) == "FlatGeobuf"
    p2 = str(tmp_path / "layer2.gpkg")
    write_gpkg(df, p2, mode="single")
    bare2 = str(tmp_path / "noext2")
    shutil.copy(p2, bare2)
    assert sniff_vector_driver(bare2) == "GPKG"
    # XML content sniffs
    from gdal_spark.sources.xmlgeo import write_gpx, write_kml
    p3 = str(tmp_path / "w.gpx")
    write_gpx(df.select("geometry"), p3, mode="single")
    bare3 = str(tmp_path / "noext3")
    shutil.copy(p3, bare3)
    assert sniff_vector_driver(bare3) == "GPX"
    p4 = str(tmp_path / "w.kml")
    write_kml(df.select("geometry"), p4, mode="single")
    bare4 = str(tmp_path / "noext4")
    shutil.copy(p4, bare4)
    assert sniff_vector_driver(bare4) == "KML"


def test_sniff_unknown_rejected(tmp_path):
    p = str(tmp_path / "mystery.bin")
    with open(p, "wb") as fh:
        fh.write(b"\x00\x01\x02\x03 not a dataset")
    with pytest.raises(ValueError, match="no driver"):
        sniff_vector_driver(p)


def test_vector_info_counts_and_extent(spark, tmp_path):
    df, pdf = _pts_df(spark, n=80, seed=9)
    from gdal_spark.sources.flatgeobuf import write_flatgeobuf
    p = str(tmp_path / "layer.fgb")
    write_flatgeobuf(df, p, mode="single")
    info = vector_info(spark, p)
    assert info["driver"] == "FlatGeobuf"
    assert info["featureCount"] == 80
    assert info["geometryTypes"] == ["Point"]
    xy = np.array([[x, y] for x, y in
                   (parse_xy(g) for g in pdf.geometry)])
    np.testing.assert_allclose(
        info["extent"],
        [xy[:, 0].min(), xy[:, 1].min(),
         xy[:, 0].max(), xy[:, 1].max()])
    names = {f["name"] for f in info["fields"]}
    assert names == {"k", "tag"}


def parse_xy(wkb):
    from gdal_spark.geometry.wkb import parse_wkb
    p = parse_wkb(bytes(wkb)).parts[0][0]
    return float(p[0]), float(p[1])


def test_ogr2ogr_convert_chain(spark, tmp_path):
    """fgb -> gpkg -> kml across the registry: geometry must
    survive byte-exact through every hop."""
    from gdal_spark.sources.registry import convert, write_vector

    df, pdf = _pts_df(spark, n=40, seed=8)
    src = str(tmp_path / "a.fgb")
    write_vector(df, src, mode="single")
    mid = str(tmp_path / "b.gpkg")
    convert(spark, src, mid, dst_opts={"mode": "single"})
    last = str(tmp_path / "c.kml")
    # kml keeps name/description: project k into name first
    kdf = open_vector(spark, mid).selectExpr(
        "geometry", "CAST(k AS STRING) AS name")
    write_vector(kdf, last, mode="single")
    back = open_vector(spark, last)
    a = {int(r["name"]): bytes(r.geometry) for r in back.collect()}
    assert len(a) == 40
    for _, row in pdf.iterrows():
        assert a[int(row.k)] == bytes(row.geometry)


def test_write_vector_unknown_extension(spark):
    from gdal_spark.sources.registry import write_vector
    with pytest.raises(ValueError, match="driver"):
        write_vector(None, "/tmp/out.xyzzy")


def test_raster_info_gtiff_and_pyramid(spark, tmp_path):
    from gdal_spark.operators.gtiff import encode_gtiff
    from gdal_spark.operators.tiling import write_tiles
    arr = np.arange(64, dtype=np.uint8).reshape(8, 8)
    p = str(tmp_path / "r.tif")
    with open(p, "wb") as fh:
        fh.write(encode_gtiff(arr, geotransform=(0, 2, 0, 16, 0,
                                                 -2), epsg=3857))
    info = raster_info(p)
    assert info == {"driver": "GTiff", "size": [8, 8], "bands": 1,
                    "dtype": "uint8",
                    "geotransform": [0.0, 2.0, 0.0, 16.0, 0.0,
                                     -2.0],
                    "epsg": 3857}
    # pyramid directory form
    from gdal_spark.operators.warp import tiles_from_array
    from pyspark.sql import functions as F
    tiles, _, _ = tiles_from_array(spark, arr, tile_size=8)
    tiles = tiles.withColumn("zoom", F.lit(1).cast("int"))
    out = str(tmp_path / "pyr")
    write_tiles(tiles, out, convention="xyz", format="gtiff")
    pinfo = raster_info(out)
    assert pinfo["driver"] == "TilePyramid"
    assert pinfo["zooms"] == {1: 1}
    assert pinfo["sampleTile"]["dtype"] == "uint8"
