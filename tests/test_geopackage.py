"""GeoPackage driver tests.

Golden strategy: the reference's own autotest fixtures decode with
the documented semantics (poly_golden.gpkg is the canonical 10-row
layer — same content as the poly.shp golden, so the EAS_ID filter
set and the per-feature shoelace-area == |AREA| anchor both carry
over; the envelope variants 2d_envelope/no_envelope and
first_geometry_null exercise the header-flag matrix).  The writer
is checked as read(write(x)) == x through both the distributed
parts layout and the classic single-file layout, and structurally
for spec conformance: application_id/user_version pragmas,
gpkg_contents extents, the R*Tree population + extension row +
trigger set, and the float32 outward-rounding invariant (the
R-tree box never shrinks below the true envelope).
"""

import os
import sqlite3
import struct

import numpy as np
import pandas as pd
import pytest

from gdal_spark.geometry.wkb import (
    linestring_wkb, multipolygon_wkb, parse_wkb, point_wkb,
    polygon_wkb,
)
from gdal_spark.sources.geopackage import (
    APPLICATION_ID, USER_VERSION, gpkg_blob, gpkg_wkb, read_gpkg,
    write_gpkg,
)

DATA = "/root/reference/autotest/ogr/data/gpkg"


def _ring_area(g) -> float:
    """Shell areas minus hole areas across all parts."""
    total = 0.0
    po = g.part_offsets
    for i in range(len(po) - 1):
        rings = g.parts[po[i]:po[i + 1]]
        for k, r in enumerate(rings):
            a = abs(0.5 * (np.dot(r[:, 0], np.roll(r[:, 1], -1))
                           - np.dot(r[:, 1], np.roll(r[:, 0], -1))))
            total += a if k == 0 else -a
    return total


# ------------------------------------------------ fixture corpus

def test_reference_poly_golden(spark):
    df = read_gpkg(spark, os.path.join(DATA, "poly_golden.gpkg"))
    assert df.schema.simpleString() == (
        "struct<fid:bigint,geometry:binary,AREA:double,"
        "EAS_ID:bigint,PRFEDEA:string>")
    rows = df.collect()
    assert len(rows) == 10
    # the same EAS_ID > 170 filter set ogr_gpkg.py asserts via
    # the shared poly fixture content
    assert sorted(r.EAS_ID for r in rows if r.EAS_ID > 170) == \
        [171, 172, 173, 179]
    for r in rows:
        g = parse_wkb(bytes(r.geometry))
        assert _ring_area(g) == pytest.approx(abs(r.AREA), abs=0.05)


def test_reference_envelope_matrix(spark):
    # same content with and without the optional blob envelope
    a = {r.fid: bytes(r.geometry) for r in read_gpkg(
        spark, os.path.join(DATA, "2d_envelope.gpkg")).collect()}
    b = {r.fid: bytes(r.geometry) for r in read_gpkg(
        spark, os.path.join(DATA, "no_envelope.gpkg")).collect()}
    assert len(a) == len(b) == 2
    for f in a:
        assert parse_wkb(a[f]).kind == parse_wkb(b[f]).kind


def test_reference_first_geometry_null(spark):
    rows = read_gpkg(
        spark,
        os.path.join(DATA, "first_geometry_null.gpkg")).collect()
    assert len(rows) == 2
    geoms = sorted((r.geometry is None for r in rows), reverse=True)
    assert geoms == [True, False]


# --------------------------------------------------- blob codec

def test_blob_codec_roundtrip():
    wkb = point_wkb(2.5, -3.5)
    blob = gpkg_blob(wkb, 4326, env=(2.5, -3.5, 2.5, -3.5))
    assert blob[:2] == b"GP" and blob[2] == 0
    assert blob[3] == 0x03                     # LE + XY envelope
    assert struct.unpack_from("<i", blob, 4)[0] == 4326
    # spec envelope order: minx, maxx, miny, maxy
    assert struct.unpack_from("<4d", blob, 8) == \
        (2.5, 2.5, -3.5, -3.5)
    assert gpkg_wkb(blob) == wkb
    assert gpkg_wkb(gpkg_blob(wkb, 0)) == wkb  # no envelope
    assert gpkg_blob(None, 4326) is None and gpkg_wkb(None) is None


def test_blob_codec_rejects():
    with pytest.raises(ValueError, match="magic"):
        gpkg_wkb(b"XX\x00\x00garbage")
    ext = b"GP\x00" + bytes([0x21]) + b"\x00" * 8
    with pytest.raises(ValueError, match="extended"):
        gpkg_wkb(ext)
    empty = b"GP\x00" + bytes([0x11]) + struct.pack("<i", 0)
    assert gpkg_wkb(empty) is None             # empty flag -> None


# -------------------------------------------------- Spark surface

def _layer_df(spark, n=400, seed=5):
    rng = np.random.default_rng(seed)
    pdf = pd.DataFrame({
        "geometry": [point_wkb(float(x), float(y))
                     for x, y in rng.uniform(0, 10, (n, 2))],
        "k": np.arange(n, dtype=np.int64),
        "name": [f"f{i}" for i in range(n)],
        "score": rng.standard_normal(n),
        "flag": (np.arange(n) % 3 == 0),
    })
    from pyspark.sql.types import (
        BinaryType, BooleanType, DoubleType, LongType, StringType,
        StructField, StructType,
    )
    return spark.createDataFrame(pdf, StructType(
        [StructField("geometry", BinaryType()),
         StructField("k", LongType()),
         StructField("name", StringType()),
         StructField("score", DoubleType()),
         StructField("flag", BooleanType())])), pdf


def test_parts_roundtrip(spark, tmp_path):
    df, pdf = _layer_df(spark)
    out = str(tmp_path / "layer_parts")
    assert write_gpkg(df.repartition(3), out) is None
    files = sorted(os.listdir(out))
    assert len(files) == 3 and all(f.endswith(".gpkg")
                                   for f in files)
    back = read_gpkg(spark, out)
    a = {r.k: (bytes(r.geometry), r["name"], round(r.score, 9),
               r.flag) for r in back.collect()}
    assert len(a) == len(pdf)
    for _, row in pdf.iterrows():
        g, nm, sc, fl = a[row.k]
        assert g == row.geometry and nm == row["name"]
        assert sc == round(row.score, 9) and fl == bool(row.flag)
    # fids unique across the parts directory
    fids = [r.fid for r in back.collect()]
    assert len(set(fids)) == len(fids)


def test_single_roundtrip_and_fid(spark, tmp_path):
    df, pdf = _layer_df(spark, n=300, seed=9)
    p = str(tmp_path / "layer.gpkg")
    assert write_gpkg(df, p, mode="single") == 300
    back = read_gpkg(spark, p)
    rows = back.collect()
    assert sorted(r.fid for r in rows) == list(range(1, 301))
    assert {r.k for r in rows} == set(range(300))
    again = {r.k: r.fid for r in read_gpkg(spark, p).collect()}
    assert all(again[r.k] == r.fid for r in rows)


def test_written_file_is_conformant(spark, tmp_path):
    df, pdf = _layer_df(spark, n=120, seed=2)
    p = str(tmp_path / "c.gpkg")
    write_gpkg(df, p, mode="single", table="pts", srs_id=4326)
    con = sqlite3.connect(f"file:{p}?mode=ro", uri=True)
    cur = con.cursor()
    assert cur.execute("PRAGMA application_id").fetchone()[0] == \
        APPLICATION_ID
    assert cur.execute("PRAGMA user_version").fetchone()[0] == \
        USER_VERSION
    tn, dt, minx, miny, maxx, maxy, srs = cur.execute(
        "SELECT table_name, data_type, min_x, min_y, max_x, max_y,"
        " srs_id FROM gpkg_contents").fetchone()
    assert (tn, dt, srs) == ("pts", "features", 4326)
    xy = np.array([parse_wkb(g).parts[0][0] for g in pdf.geometry])
    assert minx == xy[:, 0].min() and maxx == xy[:, 0].max()
    assert miny == xy[:, 1].min() and maxy == xy[:, 1].max()
    assert cur.execute(
        "SELECT geometry_type_name, srs_id FROM "
        "gpkg_geometry_columns").fetchone() == ("GEOMETRY", 4326)
    # R-tree: one row per non-null geometry, extension row,
    # the spec's 6-trigger maintenance set
    assert cur.execute(
        "SELECT COUNT(*) FROM rtree_pts_geometry").fetchone()[0] \
        == 120
    assert cur.execute(
        "SELECT extension_name, scope FROM gpkg_extensions"
    ).fetchone() == ("gpkg_rtree_index", "write-only")
    trig = cur.execute(
        "SELECT COUNT(*) FROM sqlite_master WHERE type='trigger' "
        "AND name LIKE 'rtree_pts_geometry_%'").fetchone()[0]
    assert trig == 6
    # float32 outward rounding: every stored box contains the
    # true float64 envelope
    boxes = cur.execute("SELECT id, minx, maxx, miny, maxy FROM "
                        "rtree_pts_geometry ORDER BY id").fetchall()
    fid_xy = {r.fid: (r.k) for r in read_gpkg(spark, p).collect()}
    for fid, mnx, mxx, mny, mxy in boxes:
        x, y = xy[fid_xy[fid]]
        assert mnx <= x <= mxx and mny <= y <= mxy
    con.close()


def test_bbox_pushdown(spark, tmp_path):
    df, pdf = _layer_df(spark, n=600, seed=13)
    p = str(tmp_path / "layer.gpkg")
    write_gpkg(df, p, mode="single")
    bbox = (2.0, 2.0, 4.0, 4.0)
    got = {r.k for r in read_gpkg(spark, p, bbox=bbox).collect()}
    xs = np.array([parse_wkb(g).parts[0][0] for g in pdf.geometry])
    exp = set(pdf.k[(xs[:, 0] >= 2) & (xs[:, 0] <= 4)
                    & (xs[:, 1] >= 2) & (xs[:, 1] <= 4)])
    assert got == exp and 0 < len(got) < 600
    # without the index the kernel-side exact check must agree
    p2 = str(tmp_path / "ni.gpkg")
    write_gpkg(df, p2, mode="single", index=False)
    con = sqlite3.connect(p2)
    assert con.execute("SELECT COUNT(*) FROM sqlite_master WHERE "
                       "name LIKE 'rtree%'").fetchone()[0] == 0
    con.close()
    got2 = {r.k for r in read_gpkg(spark, p2, bbox=bbox).collect()}
    assert got2 == exp


def test_column_pruning_and_small_tasks(spark, tmp_path):
    df, _ = _layer_df(spark, n=90)
    p = str(tmp_path / "l.gpkg")
    write_gpkg(df, p, mode="single")
    sel = read_gpkg(spark, p, columns=["score"],
                    rows_per_task=17)
    assert sel.columns == ["fid", "geometry", "score"]
    assert sel.count() == 90


def test_mixed_geometries_and_null(spark, tmp_path):
    from pyspark.sql.types import (
        BinaryType, LongType, StructField, StructType,
    )
    sq = np.array([[0, 0], [4, 0], [4, 4], [0, 4], [0, 0]], float)
    hole = np.array([[1, 1], [2, 1], [2, 2], [1, 2], [1, 1]], float)
    tri = np.array([[0, 0], [1, 0], [1, 1], [0, 0]], float)
    shell2 = np.array([[5, 5], [6, 5], [6, 6], [5, 5]], float)
    pdf = pd.DataFrame({
        "geometry": [polygon_wkb([sq, hole]),
                     multipolygon_wkb([[tri], [shell2]]),
                     linestring_wkb(np.array([[0, 0], [3, 4]],
                                             float)),
                     None],
        "id": np.array([1, 2, 3, 4], dtype=np.int64)})
    df = spark.createDataFrame(pdf, StructType(
        [StructField("geometry", BinaryType()),
         StructField("id", LongType())]))
    for mode in ("single", "parts"):
        p = str(tmp_path / f"m_{mode}.gpkg")
        write_gpkg(df.coalesce(1), p, mode=mode)
        back = {r.id: r.geometry
                for r in read_gpkg(spark, p).collect()}
        for i in (1, 2, 3):
            assert bytes(back[i]) == bytes(pdf.geometry[i - 1]), \
                (mode, i)
        assert back[4] is None


def test_unsupported_column_type_rejected(spark):
    from pyspark.sql import functions as F
    df = spark.range(3).select(
        F.lit(b"").alias("geometry"),
        F.array(F.lit(1)).alias("bad"))
    with pytest.raises(ValueError, match="no column type mapping"):
        write_gpkg(df, "/tmp/never.gpkg")


def test_object_store_paths_rejected(spark):
    with pytest.raises(ValueError, match="shared-filesystem"):
        read_gpkg(spark, "s3a://bucket/x.gpkg")
    with pytest.raises(ValueError, match="shared-filesystem"):
        write_gpkg(None, "hdfs://nn/x.gpkg")


# ------------------------------------------------------ tiles

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


def test_gpkg_tiles_roundtrip_png(spark, tmp_path):
    from gdal_spark.operators.tiling import decode_tile
    from gdal_spark.sources.geopackage import (
        read_gpkg_tiles, write_gpkg_tiles,
    )
    tiles, arrays = _tile_frame(spark)
    p = str(tmp_path / "pyr.gpkg")
    assert write_gpkg_tiles(tiles, p, format="png") == len(arrays)
    back = read_gpkg_tiles(spark, p)
    got = {(r.zoom, r.tile_x, r.tile_y):
           decode_tile(r.data, r.dtype, r.tile_size)
           for r in back.collect()}
    assert set(got) == set(arrays)
    for k in arrays:
        np.testing.assert_array_equal(got[k], arrays[k])
    # zoom pushdown
    z2 = read_gpkg_tiles(spark, p, zoom=2).collect()
    assert {r.zoom for r in z2} == {2} and len(z2) == 3


def test_gpkg_tiles_metadata_conformant(spark, tmp_path):
    from gdal_spark.functions import geo
    from gdal_spark.sources.geopackage import write_gpkg_tiles
    tiles, arrays = _tile_frame(spark, zooms=(3,), ts=8)
    p = str(tmp_path / "m.gpkg")
    write_gpkg_tiles(tiles, p, table="osm", format="png")
    con = sqlite3.connect(f"file:{p}?mode=ro", uri=True)
    assert con.execute("PRAGMA application_id").fetchone()[0] == \
        APPLICATION_ID
    assert con.execute(
        "SELECT data_type FROM gpkg_contents").fetchone()[0] == \
        "tiles"
    tm = con.execute(
        "SELECT zoom_level, matrix_width, matrix_height, "
        "tile_width, tile_height, pixel_x_size "
        "FROM gpkg_tile_matrix").fetchall()
    o = geo.ORIGIN
    assert tm == [(3, 8, 8, 8, 8, 2.0 * o / (8 * 8))]
    assert con.execute(
        "SELECT min_x, min_y, max_x, max_y FROM "
        "gpkg_tile_matrix_set").fetchone() == (-o, -o, o, o)
    # contents extent covers exactly the occupied tile range
    mnx, mny, mxx, mxy = con.execute(
        "SELECT min_x, min_y, max_x, max_y FROM "
        "gpkg_contents").fetchone()
    size = 2.0 * o / 8
    assert mnx == -o and mxy == o          # tile (0,0) occupied
    assert mxx == -o + 8 * size and mny == o - 8 * size
    # UNIQUE key on the pyramid table
    with pytest.raises(sqlite3.IntegrityError):
        con2 = sqlite3.connect(p)
        con2.execute("INSERT INTO osm (zoom_level, tile_column, "
                     "tile_row, tile_data) VALUES (3, 0, 0, x'00')")
    con.close()


def test_gpkg_tiles_multiband_jpeg(spark, tmp_path):
    from gdal_spark.operators.tiling import decode_tile, encode_tile
    from gdal_spark.sources.geopackage import (
        read_gpkg_tiles, write_gpkg_tiles,
    )
    rng = np.random.RandomState(2)
    base = rng.randint(60, 200, (16, 16)).astype(np.uint8)
    rows = []
    for b in range(1, 4):   # smooth RGB so baseline JPEG stays close
        payload, dts = encode_tile(base, None)
        rows.append({"zoom": 0, "tile_x": 0, "tile_y": 0, "band": b,
                     "data": payload, "dtype": dts, "tile_size": 16})
    tiles = spark.createDataFrame(pd.DataFrame(rows))
    p = str(tmp_path / "j.gpkg")
    assert write_gpkg_tiles(tiles, p, format="jpeg",
                            quality=95) == 1
    back = read_gpkg_tiles(spark, p).collect()
    assert sorted(r.band for r in back) == [1, 2, 3]
    for r in back:
        got = decode_tile(r.data, r.dtype, r.tile_size)
        assert float(np.mean(np.abs(
            got.astype(float) - base.astype(float)))) < 6.0


def test_gpkg_tiles_format_rejected(spark, tmp_path):
    from gdal_spark.sources.geopackage import write_gpkg_tiles
    tiles, _ = _tile_frame(spark, zooms=(0,))
    with pytest.raises(ValueError, match="PNG or JPEG"):
        write_gpkg_tiles(tiles, str(tmp_path / "x.gpkg"),
                         format="gtiff")
