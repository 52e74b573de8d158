"""OGR CSV driver tests.

Golden strategy: the reference's own autotest fixture corpus
(autotest/ogr/data/csv/ — the files ogr_csv.py anchors on) must
read with the documented semantics: testcsvt.csv types exactly per
its sidecar with width/precision qualifiers dropping
(``Integer(5)``, ``Real (10.7)``), a UTF-8 BOM is tolerated
(csv_with_utf8_bom.csv, which also carries a non-WKT value in its
WKT column — lenient null geometry, as the reference warns+nulls),
``.tsv`` implies a tab separator (test_eurostat.tsv), and
AUTODETECT maps to Spark's inferSchema
(testtypeautodetectinteger64.csv promotes to bigint/double).  The
writer is checked as read(write(x)) == x through both the
distributed part-files layout and the single-file stream, for
AS_WKT (lossless repr floats) and AS_XY.
"""

import os

import numpy as np
import pandas as pd
import pytest

from gdal_spark.geometry.wkb import (
    POINT, POLYGON, parse_wkb, parse_wkt, point_wkb, polygon_wkb,
    to_wkt, wkt_wkb,
)
from gdal_spark.sources.csvfile import (
    parse_csvt, read_csv_layer, write_csv_layer,
)

DATA = "/root/reference/autotest/ogr/data/csv"


# -------------------------------------------------- WKT text codec

def test_wkt_roundtrip_all_types():
    cases = [
        "POINT (1.5 -2.25)",
        "LINESTRING (0 0,1 1,2 0.5)",
        "POLYGON ((0 0,4 0,4 4,0 4,0 0),(1 1,2 1,2 2,1 2,1 1))",
        "MULTIPOINT (1 2,3 4)",
        "MULTIPOINT ((1 2),(3 4))",          # both RFC spellings
        "MULTILINESTRING ((0 0,1 1),(2 2,3 3))",
        "MULTIPOLYGON (((0 0,1 0,1 1,0 0)),"
        "((5 5,6 5,6 6,5 5),(5.2 5.2,5.4 5.2,5.3 5.4,5.2 5.2)))",
    ]
    for w in cases:
        b = wkt_wkb(w)
        assert wkt_wkb(to_wkt(parse_wkb(b), None)) == b

    assert wkt_wkb(None) is None
    assert wkt_wkb("POINT EMPTY") is None
    with pytest.raises(ValueError, match="out of scope"):
        parse_wkt("GEOMETRYCOLLECTION (POINT (1 2))")


def test_wkt_lossless_repr_floats():
    rng = np.random.default_rng(7)
    for _ in range(50):
        x, y = rng.standard_normal(2) * 1e3
        g = parse_wkt(to_wkt(parse_wkb(point_wkb(x, y)), None))
        assert g.parts[0][0][0] == x and g.parts[0][0][1] == y


def test_wkt_z_ordinates_drop():
    g = parse_wkt("POINT Z (1 2 3)")
    assert g.kind == POINT and tuple(g.parts[0][0]) == (1.0, 2.0)
    g = parse_wkt("LINESTRING (0 0 5,1 1 6)")
    assert g.parts[0].shape == (2, 2)


# ------------------------------------------------- .csvt sidecar

def test_csvt_reference_fixture():
    # testcsvt.csvt: width/precision qualifiers drop, incl. the
    # "Real (10.7)" spelling with an interior space
    types = parse_csvt(os.path.join(DATA, "testcsvt.csvt"))
    assert [t for _, t in types] == [
        "int", "double", "string", "int", "double", "string",
        "timestamp", "date", "string",
    ]


def test_csvt_subtypes(tmp_path):
    p = tmp_path / "s.csvt"
    p.write_text('"Integer(Boolean)","Integer(Int16)","Real(Float32)"\n')
    assert [t for _, t in parse_csvt(str(p))] == [
        "boolean", "short", "float"]
    p.write_text('"Frobnicate"\n')
    with pytest.raises(ValueError, match="unknown .csvt type"):
        parse_csvt(str(p))


def test_csvt_typed_read(spark):
    df = read_csv_layer(spark, os.path.join(DATA, "testcsvt.csv"),
                        dateFormat="yyyy/MM/dd")
    assert dict(df.dtypes) == {
        "INTCOL": "int", "REALCOL": "double", "STRINGCOL": "string",
        "INTCOL2": "int", "REALCOL2": "double",
        "STRINGCOL2": "string", "DATETIME": "timestamp",
        "DATE": "date", "TIME": "string",
    }
    rows = df.collect()
    r = rows[0]
    assert r.INTCOL == 12 and r.REALCOL == 5.7
    assert str(r.DATE) == "2008-12-25"
    assert str(r.DATETIME) == "2008-12-25 11:22:33"
    assert r.TIME == "11:22:33"
    assert all(v is None for v in rows[1][:3])


# ------------------------------------------- reference fixtures

def test_utf8_bom_and_lenient_geometry(spark):
    # header BOM strips; the WKT column's stray attribute value
    # ("LOC" row shape mismatch) nulls instead of erroring
    df = read_csv_layer(spark, os.path.join(DATA,
                                            "csv_with_utf8_bom.csv"))
    assert df.columns[1] == "id"
    rows = df.collect()
    assert rows[0]["name"] == "Colac Bay/\u014craka"
    assert all(r.geometry is None for r in rows)


def test_tsv_implies_tab(spark):
    df = read_csv_layer(spark, os.path.join(DATA,
                                            "test_eurostat.tsv"))
    assert len(df.columns) > 2
    assert df.count() >= 1


def test_autodetect_integer64(spark):
    df = read_csv_layer(
        spark, os.path.join(DATA, "testtypeautodetectinteger64.csv"),
        autodetect_types=True)
    dt = dict(df.dtypes)
    assert dt["col1"] == "bigint" and dt["col2"] == "bigint"
    assert dt["col4"] == "double"


# ----------------------------------------------- geometry reading

def test_geom_cell_detection(spark, tmp_path):
    # WKT, hex-WKB and GeoJSON cells in one GEOM column, per-value
    hexwkb = point_wkb(7.0, 8.0).hex()
    p = tmp_path / "mix.csv"
    p.write_text(
        "id,geom_col,v\n"
        '1,"POINT (1 2)",a\n'
        f"2,{hexwkb},b\n"
        '3,"{""type"": ""Point"", ""coordinates"": [5.0, 6.0]}",c\n'
        "4,,d\n"
        '5,"not a geometry",e\n')
    df = read_csv_layer(spark, str(p),
                        geom_possible_names=("geom_*",),
                        keep_geom_columns=False)
    assert "geom_col" not in df.columns
    got = {r.id: r.geometry and bytes(r.geometry)
           for r in df.collect()}
    assert got["1"] == point_wkb(1.0, 2.0)
    assert got["2"] == point_wkb(7.0, 8.0)
    assert got["3"] == point_wkb(5.0, 6.0)
    assert got["4"] is None and got["5"] is None


def test_xy_assembly_and_csvt_roles(spark, tmp_path):
    p = tmp_path / "pts.csv"
    p.write_text("name,easting,northing,pop\n"
                 "alpha,1.5,2.5,100\n"
                 "beta,-3.25,4.75,200\n"
                 "gamma,,,300\n")
    (tmp_path / "pts.csvt").write_text(
        '"String","CoordX","CoordY","Integer64"\n')
    df = read_csv_layer(spark, str(p))
    rows = {r["name"]: r for r in df.collect()}
    assert bytes(rows["alpha"].geometry) == point_wkb(1.5, 2.5)
    assert rows["gamma"].geometry is None
    assert rows["beta"].pop == 200
    assert dict(df.dtypes)["pop"] == "bigint"


def test_xy_possible_names_untyped(spark, tmp_path):
    # no csvt: lon/lat sniffed by name from all-string columns
    p = tmp_path / "ll.csv"
    p.write_text("city,lon,lat\nx,10.5,20.5\n")
    df = read_csv_layer(spark, str(p))
    r = df.collect()[0]
    assert bytes(r.geometry) == point_wkb(10.5, 20.5)


def test_separator_sniffing(spark, tmp_path):
    for sep, name in ((";", "semi.csv"), ("|", "pipe.csv")):
        p = tmp_path / name
        p.write_text(f"a{sep}b{sep}c\n1{sep}2{sep}3\n")
        df = read_csv_layer(spark, str(p))
        assert df.columns == ["a", "b", "c"]
        assert df.collect()[0].b == "2"


# ----------------------------------------------------- round trips

def _square_layer(spark, tmp_path):
    p = tmp_path / "src.csv"
    p.write_text(
        "id;WKT;val\n"
        '1;"POINT (1 2)";a\n'
        '2;"POLYGON ((0 0,1 0,1 1,0 0))";b\n'
        "3;;c\n")
    return read_csv_layer(spark, str(p), keep_geom_columns=False)


def test_roundtrip_parts_as_wkt(spark, tmp_path):
    src = _square_layer(spark, tmp_path)
    out = str(tmp_path / "layer_out")
    assert write_csv_layer(src, out, create_csvt=True) is None
    assert os.path.exists(os.path.join(out, "layer.csvt"))
    assert parse_csvt(os.path.join(out, "layer.csvt"))[0][0] == "wkt"
    back = read_csv_layer(spark, out)
    a = {r.id: r for r in src.collect()}
    b = {r.id: r for r in back.collect()}
    assert set(a) == set(b)
    for k in a:
        ga, gb = a[k].geometry, b[k].geometry
        assert (ga is None) == (gb is None)
        if ga is not None:
            assert bytes(ga) == bytes(gb)
        assert a[k].val == b[k].val


def test_roundtrip_single_as_xy(spark, tmp_path):
    p = tmp_path / "pts.csv"
    p.write_text("name,lon,lat\nu,1.25,2.5\nv,-3.5,4.0\n")
    df = read_csv_layer(spark, str(p), keep_geom_columns=False)
    out = str(tmp_path / "single.csv")
    n = write_csv_layer(df, out, geometry="AS_XY",
                        create_csvt=True, mode="single")
    assert n == 2
    assert os.path.exists(str(tmp_path / "single.csvt"))
    back = read_csv_layer(spark, out)
    r = {x["name"]: x for x in back.collect()}
    assert bytes(r["v"].geometry) == point_wkb(-3.5, 4.0)


def test_as_xy_rejects_non_points(spark, tmp_path):
    src = _square_layer(spark, tmp_path)
    with pytest.raises(Exception, match="pure point"):
        write_csv_layer(src, str(tmp_path / "xy_out"),
                        geometry="AS_XY")


def test_as_yx_and_none(spark, tmp_path):
    p = tmp_path / "pts.csv"
    p.write_text("name,lon,lat\nu,1.25,2.5\n")
    df = read_csv_layer(spark, str(p), keep_geom_columns=False)
    out = str(tmp_path / "yx.csv")
    write_csv_layer(df, out, geometry="AS_YX", mode="single")
    assert open(out).readline().strip() == "Y,X,name"
    out2 = str(tmp_path / "none.csv")
    write_csv_layer(df, out2, geometry="NONE", mode="single")
    assert open(out2).readline().strip() == "name"


def test_lossless_float_roundtrip(spark, tmp_path):
    # AS_WKT writes repr floats: exact binary equality after a trip
    x = 0.1 + 0.2
    from pyspark.sql.types import (
        BinaryType, StringType, StructField, StructType,
    )
    df = spark.createDataFrame(
        [(point_wkb(x, -x), "r")],
        StructType([StructField("geometry", BinaryType()),
                    StructField("t", StringType())]))
    out = str(tmp_path / "ll_out")
    write_csv_layer(df, out)
    back = read_csv_layer(spark, out)
    assert bytes(back.collect()[0].geometry) == point_wkb(x, -x)


def test_object_store_paths_rejected(spark):
    with pytest.raises(ValueError, match="shared-filesystem"):
        read_csv_layer(spark, "s3a://bucket/x.csv")
