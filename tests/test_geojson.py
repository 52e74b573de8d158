"""GeoJSON / GeoJSONSeq driver tests.

Golden strategy: the reference's own autotest fixture corpus
(autotest/ogr/data/geojson/ — the files ogr_geojson.py anchors on)
must decode with the documented semantics: bare-geometry docs wrap
into one feature (ogr_geojson.py point/linestring/... cases), the
type-promotion matrix promotes bool -> long -> double -> string
(test_type_promotion.json vs its _ref companion), sparse fields
union in first-seen order with nulls (sparse_fields.geojson), a
UTF-8 BOM is tolerated, and a feature-level ``id`` becomes fid
(grenada.geojson id 550727).  The writer is checked as
read(write(x)) == x through both the distributed GeoJSONSeq parts
layout and the single-document FeatureCollection stream, plus an
RFC 8142 RS-delimited read.
"""

import json
import os

import numpy as np
import pandas as pd
import pytest

from gdal_spark.geometry.wkb import (
    LINESTRING, MULTILINESTRING, MULTIPOINT, MULTIPOLYGON, POINT,
    POLYGON, parse_wkb, point_wkb, polygon_wkb,
)
from gdal_spark.sources.geojson import (
    geojson_to_wkb, read_geojson, wkb_to_geojson, write_geojson,
)

DATA = "/root/reference/autotest/ogr/data/geojson"


# ------------------------------------------------- geometry codec

def test_geometry_codec_roundtrip():
    objs = [
        {"type": "Point", "coordinates": [100.0, 0.5]},
        {"type": "MultiPoint", "coordinates": [[1.0, 2.0], [3.0, 4.0]]},
        {"type": "LineString", "coordinates": [[0.0, 0.0], [1.0, 1.0]]},
        {"type": "MultiLineString",
         "coordinates": [[[0.0, 0.0], [1.0, 0.0]],
                         [[0.0, 1.0], [1.0, 1.0]]]},
        {"type": "Polygon",
         "coordinates": [[[0.0, 0.0], [4.0, 0.0], [4.0, 4.0],
                          [0.0, 0.0]],
                         [[1.0, 1.0], [2.0, 1.0], [1.0, 2.0],
                          [1.0, 1.0]]]},
        {"type": "MultiPolygon",
         "coordinates": [
             [[[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 0.0]]],
             [[[5.0, 5.0], [6.0, 5.0], [6.0, 6.0], [5.0, 5.0]],
              [[5.2, 5.2], [5.8, 5.3], [5.5, 5.7], [5.2, 5.2]]]]},
    ]
    for obj in objs:
        assert wkb_to_geojson(geojson_to_wkb(obj)) == obj
    assert geojson_to_wkb(None) is None
    assert wkb_to_geojson(None) is None
    with pytest.raises(ValueError, match="out of scope"):
        geojson_to_wkb({"type": "GeometryCollection",
                        "geometries": []})


# ------------------------------------ reference fixture goldens

def test_bare_geometry_docs(spark):
    kinds = {"point": POINT, "linestring": LINESTRING,
             "polygon": POLYGON, "multipoint": MULTIPOINT,
             "multilinestring": MULTILINESTRING,
             "multipolygon": MULTIPOLYGON}
    for name, kind in kinds.items():
        pdf = read_geojson(spark, f"{DATA}/{name}.geojson").toPandas()
        assert len(pdf) == 1, name
        g = parse_wkb(bytes(pdf.geometry[0]))
        assert g.kind == kind, name
    # ogr_geojson.py point golden: coordinates [100.0, 0.0]
    pdf = read_geojson(spark, f"{DATA}/point.geojson").toPandas()
    g = parse_wkb(bytes(pdf.geometry[0]))
    assert tuple(g.parts[0][0]) == (100.0, 0.0)


def test_type_promotion_matrix(spark):
    df = read_geojson(spark, f"{DATA}/test_type_promotion.json")
    t = dict(df.dtypes)
    # the reference's promotion lattice (ogrgeojsonreader.cpp),
    # scalar rows of test_type_promotion_ref.json
    assert t["bool_then_bool"] == "boolean"
    assert t["bool_then_int"] == "bigint"
    assert t["bool_then_real"] == "double"
    assert t["bool_then_string"] == "string"
    assert t["int_then_bool"] == "bigint"
    assert t["int_then_int64"] == "bigint"
    assert t["int_then_real"] == "double"
    assert t["int_then_string"] == "string"
    assert t["real_then_string"] == "string"
    # declared simplification: list/object values -> JSON strings
    assert t["bool_then_intlist"] == "string"
    assert t["int_then_intlist"] == "string"
    pdf = df.toPandas()
    assert len(pdf) == 2
    assert pdf["bool_then_int"].tolist() == [1, 1]
    assert pdf["int_then_real"].tolist() == [1.0, 1.25] or \
        pdf["int_then_real"].iloc[0] == 1.0
    assert pdf["int_then_intlist"].iloc[1] == "[1]"


def test_sparse_fields_first_seen_order(spark):
    df = read_geojson(spark, f"{DATA}/sparse_fields.geojson")
    cols = df.columns
    assert cols[:2] == ["fid", "geometry"]
    assert cols[2:4] == ["B", "C"]     # first-seen order
    pdf = df.toPandas()
    assert pdf.B.iloc[0] == "b" and pd.isna(pdf.C.iloc[0])
    assert pd.isna(pdf.B.iloc[1]) and pdf.C.iloc[1] == "c"


def test_nullvalues_keep_declared_types(spark):
    df = read_geojson(spark, f"{DATA}/nullvalues.geojson")
    t = dict(df.dtypes)
    assert t["int"] == "bigint" and t["double"] == "double" \
        and t["string"] == "string"
    pdf = df.orderBy("int").toPandas()
    assert pdf["int"].tolist()[-1] == 168
    assert pd.isna(pdf["int"].iloc[0])


def test_bom_and_feature_id(spark):
    pdf = read_geojson(spark,
                       f"{DATA}/point_with_utf8bom.json").toPandas()
    assert len(pdf) == 1 and pdf.geometry[0] is not None
    pdf = read_geojson(spark, f"{DATA}/grenada.geojson").toPandas()
    assert pdf.fid.tolist() == [550727]
    assert pdf["name"].iloc[0] == "Grenada"
    assert pdf["name:ru"].iloc[0] == "Гренада"
    g = parse_wkb(bytes(pdf.geometry[0]))
    assert g.kind == MULTIPOLYGON


def test_null_properties_member(spark):
    # featurecollection_point.json: "properties": null
    pdf = read_geojson(
        spark, f"{DATA}/featurecollection_point.json").toPandas()
    assert len(pdf) == 1
    g = parse_wkb(bytes(pdf.geometry[0]))
    assert tuple(g.parts[0][0]) == (1.0, 2.0)


# --------------------------------------------------- round trips

def _sample_df(spark):
    rows = [
        (0, point_wkb(1.5, 2.5), 10, 0.5, "alpha", True),
        (1, polygon_wkb([[(0.0, 0.0), (2.0, 0.0), (2.0, 2.0),
                          (0.0, 0.0)]]), 20, None, "béta", False),
        (2, None, None, 3.25, None, None),
    ]
    from pyspark.sql.types import (
        BinaryType, BooleanType, DoubleType, LongType, StringType,
        StructField, StructType,
    )
    schema = StructType([
        StructField("fid", LongType()),
        StructField("geometry", BinaryType()),
        StructField("n", LongType()),
        StructField("x", DoubleType()),
        StructField("s", StringType()),
        StructField("b", BooleanType()),
    ])
    return spark.createDataFrame(rows, schema)


def _assert_matches(pdf, want=3):
    assert len(pdf) == want
    pdf = pdf.sort_values("fid").reset_index(drop=True)
    assert pdf.fid.tolist() == [0, 1, 2]
    assert pdf.n.tolist()[:2] == [10, 20] and pd.isna(pdf.n.iloc[2])
    assert pdf.x.iloc[0] == 0.5 and pd.isna(pdf.x.iloc[1]) \
        and pdf.x.iloc[2] == 3.25
    assert pdf.s.iloc[1] == "béta" and pd.isna(pdf.s.iloc[2])
    assert pdf.b.tolist()[:2] == [True, False]
    g = parse_wkb(bytes(pdf.geometry[0]))
    assert tuple(g.parts[0][0]) == (1.5, 2.5)
    assert parse_wkb(bytes(pdf.geometry[1])).kind == POLYGON
    assert pdf.geometry[2] is None


def test_roundtrip_parts_distributed(spark, tmp_path):
    df = _sample_df(spark).repartition(3)
    out = str(tmp_path / "layer")
    assert write_geojson(df, out) == 3
    parts = [f for f in os.listdir(out)
             if f.startswith("part-") and f.endswith(".geojsonl")]
    assert len(parts) >= 1
    back = read_geojson(spark, out)
    assert dict(back.dtypes)["n"] == "bigint"
    assert dict(back.dtypes)["b"] == "boolean"
    _assert_matches(back.toPandas())


def test_roundtrip_single_document(spark, tmp_path):
    out = str(tmp_path / "fc.geojson")
    assert write_geojson(_sample_df(spark), out, mode="single") == 3
    doc = json.load(open(out))
    assert doc["type"] == "FeatureCollection"
    assert len(doc["features"]) == 3
    _assert_matches(read_geojson(spark, out).toPandas())


def test_rs_delimited_sequence(spark, tmp_path):
    # RFC 8142: RS-prefixed records that may contain pretty-printed
    # newlines
    recs = [json.dumps(
        {"type": "Feature", "id": i,
         "geometry": {"type": "Point",
                      "coordinates": [float(i), float(-i)]},
         "properties": {"v": i * 10}}, indent=1) for i in range(7)]
    p = tmp_path / "seq.geojsons"
    p.write_text("\x1e" + "\x1e".join(recs), encoding="utf-8")
    pdf = read_geojson(spark, str(p)).orderBy("fid").toPandas()
    assert pdf.fid.tolist() == list(range(7))
    assert pdf.v.tolist() == [i * 10 for i in range(7)]
    g = parse_wkb(bytes(pdf.geometry[3]))
    assert tuple(g.parts[0][0]) == (3.0, -3.0)


def test_schema_sampling_vs_full_scan(spark, tmp_path):
    # sequence schema comes from a bounded head sample: a huge file
    # still reads, with later rows coerced to the sampled types
    p = tmp_path / "big.geojsonl"
    with open(p, "w") as fh:
        for i in range(5000):
            fh.write(json.dumps(
                {"type": "Feature", "geometry": None,
                 "properties": {"k": i, "tag": f"t{i % 13}"}})
                + "\n")
    df = read_geojson(spark, str(p))
    assert dict(df.dtypes)["k"] == "bigint"
    from pyspark.sql import functions as F
    agg = df.agg(F.count("*").alias("n"),
                 F.sum("k").alias("s")).first()
    assert agg.n == 5000 and agg.s == 5000 * 4999 // 2


def test_uri_paths_rejected(spark):
    df = None
    with pytest.raises(ValueError, match="object-store"):
        read_geojson(spark, "s3a://bucket/x.geojsonl")
    with pytest.raises(ValueError, match="object-store"):
        write_geojson(df, "hdfs://nn/x")
