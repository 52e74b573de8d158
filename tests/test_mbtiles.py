"""MBTiles container: raster + vector round-trips, TMS row order,
metadata conformance, view-layout fallback, registry dispatch.

Reference parity target: ogr/ogrsf_frmts/mbtiles/mbtilesdataset.cpp
re-derived from the public mbtiles-spec 1.3.
"""

import sqlite3

import numpy as np
import pandas as pd
import pytest

from gdal_spark.geometry import wkb as W
from gdal_spark.sources.mbtiles import (
    mbtiles_metadata, read_mbtiles, write_mbtiles,
    write_mbtiles_vector,
)


def _tile_frame(spark, zooms=(1, 2), ts=16, seed=7):
    from gdal_spark.operators.tiling import encode_tile
    rng = np.random.RandomState(seed)
    rows, arrays = [], {}
    for z in zooms:
        for tx, ty in [(0, 0), (1, 0), ((1 << z) - 1, (1 << z) - 1)]:
            arr = rng.randint(0, 256, (ts, ts)).astype(np.uint8)
            payload, dts = encode_tile(arr, None)
            arrays[(z, tx, ty)] = arr
            rows.append({"zoom": z, "tile_x": tx, "tile_y": ty,
                         "band": 1, "data": payload, "dtype": dts,
                         "tile_size": ts})
    return spark.createDataFrame(pd.DataFrame(rows)), arrays


def test_raster_roundtrip_png(spark, tmp_path):
    from gdal_spark.operators.tiling import decode_tile
    tiles, arrays = _tile_frame(spark)
    p = str(tmp_path / "pyr.mbtiles")
    assert write_mbtiles(tiles, p, format="png") == len(arrays)
    back = read_mbtiles(spark, p)
    got = {(r.zoom, r.tile_x, r.tile_y):
           decode_tile(r.data, r.dtype, r.tile_size)
           for r in back.collect()}
    assert set(got) == set(arrays)
    for k in arrays:
        np.testing.assert_array_equal(got[k], arrays[k])
    z2 = read_mbtiles(spark, p, zoom=2).collect()
    assert {r.zoom for r in z2} == {2} and len(z2) == 3


def test_tms_row_order_on_disk(spark, tmp_path):
    # spec: tile_row is TMS — xyz (z=2, y=0) stores as row 3
    tiles, arrays = _tile_frame(spark, zooms=(2,))
    p = str(tmp_path / "tms.mbtiles")
    write_mbtiles(tiles, p)
    con = sqlite3.connect(p)
    rows = {(z, x, r) for z, x, r in con.execute(
        "SELECT zoom_level, tile_column, tile_row FROM tiles")}
    con.close()
    assert rows == {(2, 0, 3), (2, 1, 3), (2, 3, 0)}


def test_metadata_required_rows(spark, tmp_path):
    tiles, _ = _tile_frame(spark, zooms=(3,), ts=8)
    p = str(tmp_path / "m.mbtiles")
    write_mbtiles(tiles, p, format="jpeg", name="demo")
    meta = mbtiles_metadata(p)
    assert meta["name"] == "demo"
    assert meta["format"] == "jpg"
    assert meta["minzoom"] == "3" and meta["maxzoom"] == "3"
    assert len(meta["bounds"].split(",")) == 4


def _pts_df(spark, n=40, seed=11):
    rng = np.random.default_rng(seed)
    pdf = pd.DataFrame({
        "fid": np.arange(1, n + 1, dtype=np.int64),
        "geometry": [W.point_wkb(float(x), float(y))
                     for x, y in rng.uniform(-60, 60, (n, 2))],
        "tag": [f"t{i}" for i in range(n)],
    })
    return spark.createDataFrame(pdf), pdf


def test_vector_roundtrip(spark, tmp_path):
    df, pdf = _pts_df(spark)
    p = str(tmp_path / "vec.mbtiles")
    stats = write_mbtiles_vector(df, p, minzoom=4, maxzoom=4,
                                 buffer=0, layer="pts")
    assert stats["features"] == 40
    meta = mbtiles_metadata(p)
    assert meta["format"] == "pbf"
    back = read_mbtiles(spark, p).toPandas()
    assert len(back) == 40
    assert sorted(back["fid"]) == list(range(1, 41))
    assert set(back["tag"]) == set(pdf["tag"])
    # blobs must be gzip (spec requires it for pbf)
    con = sqlite3.connect(p)
    blob = con.execute(
        "SELECT tile_data FROM tiles LIMIT 1").fetchone()[0]
    con.close()
    assert bytes(blob)[:2] == b"\x1f\x8b"


def test_vector_matches_directory_mvt(spark, tmp_path):
    # same input through the directory sink and the mbtiles
    # container must produce identical per-tile feature sets
    from gdal_spark.sources.mvt import read_mvt, write_mvt
    df, _ = _pts_df(spark, n=30, seed=3)
    d = str(tmp_path / "dir.mvt")
    write_mvt(df, d, minzoom=3, maxzoom=4, buffer=80)
    m = str(tmp_path / "c.mbtiles")
    write_mbtiles_vector(df, m, minzoom=3, maxzoom=4, buffer=80)
    a = read_mvt(spark, d).toPandas()
    b = read_mbtiles(spark, m).toPandas()
    key = ["zoom", "tile_x", "tile_y", "fid"]
    assert sorted(map(tuple, a[key].values.tolist())) == \
        sorted(map(tuple, b[key].values.tolist()))


def test_view_layout_fallback(spark, tmp_path):
    # foreign dedup layout: tiles is a VIEW over images+map
    df, _ = _pts_df(spark, n=20, seed=9)
    p = str(tmp_path / "v.mbtiles")
    write_mbtiles_vector(df, p, minzoom=4, maxzoom=4, buffer=0)
    con = sqlite3.connect(p)
    con.executescript("""
        CREATE TABLE map (zoom_level INTEGER, tile_column INTEGER,
            tile_row INTEGER, tile_id TEXT);
        CREATE TABLE images (tile_data BLOB, tile_id TEXT);
        INSERT INTO map SELECT zoom_level, tile_column, tile_row,
            zoom_level || '/' || tile_column || '/' || tile_row
            FROM tiles;
        INSERT INTO images SELECT tile_data,
            zoom_level || '/' || tile_column || '/' || tile_row
            FROM tiles;
        DROP TABLE tiles;
        CREATE VIEW tiles AS SELECT map.zoom_level AS zoom_level,
            map.tile_column AS tile_column,
            map.tile_row AS tile_row,
            images.tile_data AS tile_data
            FROM map JOIN images ON images.tile_id = map.tile_id;
    """)
    con.commit()
    con.close()
    back = read_mbtiles(spark, p).toPandas()
    assert len(back) == 20


def test_registry_dispatch(spark, tmp_path):
    from gdal_spark.sources.registry import (
        open_vector, sniff_vector_driver, write_vector,
    )
    df, _ = _pts_df(spark, n=12, seed=2)
    p = str(tmp_path / "r.mbtiles")
    write_vector(df, p, minzoom=3, maxzoom=3, buffer=0)
    assert sniff_vector_driver(p) == "MBTiles"
    assert open_vector(spark, p).count() == 12
    # and a GPKG is still sniffed as GPKG (application_id check)
    from gdal_spark.sources.geopackage import write_gpkg
    g = str(tmp_path / "g")
    write_gpkg(df.select("fid", "geometry"), g, mode="single")
    import glob as _g
    gf = (_g.glob(g) + _g.glob(g + "/*.gpkg") + [g])[0]
    assert sniff_vector_driver(gf) == "GPKG"


def test_object_store_paths_rejected(spark):
    with pytest.raises(ValueError, match="shared-filesystem"):
        read_mbtiles(spark, "s3a://bucket/x.mbtiles")
    with pytest.raises(ValueError, match="shared-filesystem"):
        write_mbtiles(None, "hdfs://nn/x.mbtiles")


def test_raster_info_containers(spark, tmp_path):
    """gdalinfo analog over SQLite containers: header-only."""
    from gdal_spark.sources.geopackage import write_gpkg_tiles
    from gdal_spark.sources.registry import raster_info

    tiles, arrays = _tile_frame(spark, zooms=(1, 2))
    m = str(tmp_path / "i.mbtiles")
    write_mbtiles(tiles, m, name="probe")
    info = raster_info(m)
    assert info["driver"] == "MBTiles"
    assert info["format"] == "png"
    assert info["zooms"] == {1: 3, 2: 3}
    assert info["name"] == "probe"
    g = str(tmp_path / "i.gpkg")
    write_gpkg_tiles(tiles, g, format="png")
    gi = raster_info(g)
    assert gi["driver"] == "GPKG"
    assert gi["zooms"] == {1: 3, 2: 3}
    assert gi["epsg"] == 3857
