"""TopoJSON reader vs the reference's own fixtures + expectations
(autotest/ogr/ogr_topojson.py; EMPTY-geometry placeholders are a
declared drop — this engine's WKB model has no EMPTYs)."""

import numpy as np

from gdal_spark.geometry.wkb import parse_wkb, to_wkt
from gdal_spark.sources.topojson import read_topojson

TD = "/root/reference/autotest/ogr/data/topojson"


def _canon(w):
    import re

    return re.sub(r"(\d)\.0\b", r"\1", w).replace(", ", ",")


def _wkts(df, layer):
    pdf = df.filter(df.layer == layer).orderBy("fid").toPandas()
    return [_canon(to_wkt(parse_wkb(bytes(b)), None))
            for b in pdf["geometry"]], pdf


def test_topojson1_objects_array(spark):
    df = read_topojson(spark, f"{TD}/topojson1.topojson")
    # the named GeometryCollection is its own layer
    wkts, _ = _wkts(df, "a_layer")
    assert wkts == ["LINESTRING (100 1000,110 1000,110 1100)"]
    # catch-all layer: the reference's non-EMPTY expectations, in
    # document order (EMPTY placeholders dropped by declaration)
    wkts, pdf = _wkts(df, "TopoJSON")
    assert "POINT (100 1010)" in wkts
    i = wkts.index("POINT (100 1010)")
    # forward arc then ~reversed arc
    assert "LINESTRING (100 1000,110 1000,110 1100)" in wkts[i:]
    assert "LINESTRING (110 1100,110 1000,100 1000)" in wkts
    # polygon with hole: ring arcs stitch closed, transform applied
    assert ("POLYGON ((100 1000,110 1000,110 1100,100 1100,"
            "100 1000),(101 1010,101 1090,109 1090,109 1010,"
            "101 1010))") in wkts
    # and the ~reversed-arc variant
    assert ("POLYGON ((110 1100,110 1000,100 1000,100 1100,"
            "110 1100),(101 1010,109 1010,109 1090,101 1090,"
            "101 1010))") in wkts
    assert "MULTIPOINT (100 1010,101 1020)" in wkts
    # properties surface as string columns; ids ride the two valid
    # linestrings (reference expectations ("1", ...) / ("2", ...)).
    # NOTE the fixture's name="foo"/"0" properties sit on
    # EMPTY-geometry placeholders, which this engine DROPS by
    # declaration — so the column exists but those rows don't.
    assert "name" in pdf.columns
    assert {"1", "2"} <= set(pdf["id"].dropna())


def test_topojson2_objects_dict(spark):
    df = read_topojson(spark, f"{TD}/topojson2.topojson")
    wkts, pdf = _wkts(df, "a_layer")
    assert wkts == ["LINESTRING (100 1000,110 1000,110 1100)"]
    assert pdf.iloc[0]["id"] == "foo"
    assert pdf.iloc[0]["name"] == "line"
    wkts2, _ = _wkts(df, "foo")
    assert wkts2 == ["LINESTRING (100 1000,110 1000,110 1100)"]


def test_topojson3_no_transform(spark):
    """topojson3 has no transform: arcs are absolute positions."""
    df = read_topojson(spark, f"{TD}/topojson3.topojson")
    pdf = df.toPandas()
    assert len(pdf) >= 1
    g = parse_wkb(bytes(pdf.iloc[0]["geometry"]))
    assert np.isfinite(np.vstack(g.parts)).all()


def test_registry_sniffs_topojson(spark):
    from gdal_spark.sources.registry import (
        open_vector, sniff_vector_driver,
    )

    p = f"{TD}/topojson2.topojson"
    assert sniff_vector_driver(p) == "TopoJSON"
    assert open_vector(spark, p).count() == 2
