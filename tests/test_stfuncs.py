"""SQLITE-dialect ST_* function surface (sql/stfuncs.py).

Parity model: doc/source/user/sql_sqlite_dialect.rst's function
table.  Everything is exercised THROUGH spark.sql — the same path
a dialect user takes — with closed-form expected values (exact
where the math is exact, tolerance only where the kernel is an
approximation by design, e.g. buffer arc segments).
"""

import numpy as np
import pandas as pd
import pytest

from gdal_spark.geometry.wkb import (
    linestring_wkb, multipolygon_wkb, parse_wkb, point_wkb,
    polygon_wkb,
)
from gdal_spark.sql.stfuncs import register_st_functions


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    register_st_functions(spark)


def _sql1(spark, expr, **frames):
    for name, pdf in frames.items():
        spark.createDataFrame(pdf).createOrReplaceTempView(name)
    return spark.sql(expr).collect()[0][0]


def test_constructors_accessors_roundtrip(spark):
    v = spark.sql(
        "SELECT st_x(g) AS x, st_y(g) AS y, st_astext(g) AS t,"
        " st_x(st_geomfromwkb(st_asbinary(g))) AS x2 FROM"
        " (SELECT st_geomfromtext('POINT (2.5 -3.25)') AS g)"
    ).collect()[0]
    assert v.x == 2.5 and v.y == -3.25 and v.x2 == 2.5
    assert v.t == "POINT (2.5 -3.25)"
    v2 = spark.sql("SELECT st_astext(st_makepoint(CAST(7 AS DOUBLE),"
                   " CAST(8 AS DOUBLE)))").collect()[0][0]
    assert v2 == "POINT (7.0 8.0)"


def test_envelope_bbox_and_measures(spark):
    row = spark.sql(
        "SELECT st_area(e) AS a, st_perimeter(e) AS p,"
        " st_minx(e) AS x0, st_maxy(e) AS y1,"
        " st_isempty(e) AS emp FROM (SELECT st_makeenvelope("
        "CAST(1 AS DOUBLE), CAST(2 AS DOUBLE),"
        "CAST(4 AS DOUBLE), CAST(6 AS DOUBLE)) AS e)"
    ).collect()[0]
    assert row.a == 12.0 and row.p == 14.0
    assert row.x0 == 1.0 and row.y1 == 6.0 and row.emp is False


def test_envelope_of_geometry(spark):
    pdf = pd.DataFrame({"g": [linestring_wkb(
        np.array([[0.0, 5.0], [3.0, 1.0], [2.0, 8.0]]))]})
    got = _sql1(spark, "SELECT st_astext(st_envelope(g)) FROM t",
                t=pdf)
    assert got == ("POLYGON ((0.0 1.0,3.0 1.0,3.0 8.0,"
                   "0.0 8.0,0.0 1.0))")


def test_distance_point_point_matches_sql_sqrt(spark):
    # same sqrt(dx*dx+dy*dy) form a plain-SQL oracle computes
    rng = np.random.default_rng(5)
    xy = rng.uniform(-100, 100, (50, 2))
    pdf = pd.DataFrame({"x": xy[:, 0], "y": xy[:, 1]})
    rows = spark.createDataFrame(pdf).selectExpr(
        "st_distance(st_makepoint(x, y),"
        " st_makepoint(CAST(0 AS DOUBLE), CAST(0 AS DOUBLE)))"
        " AS d", "SQRT(x*x + y*y) AS e").collect()
    for r in rows:
        assert r.d == r.e


def test_distance_polygon_polygon_and_touching(spark):
    a = polygon_wkb([np.array([[0, 0], [1, 0], [1, 1], [0, 1],
                               [0, 0]], float)])
    b = polygon_wkb([np.array([[3, 0], [4, 0], [4, 1], [3, 1],
                               [3, 0]], float)])
    pdf = pd.DataFrame({"a": [a], "b": [b]})
    assert _sql1(spark, "SELECT st_distance(a, b) FROM t",
                 t=pdf) == 2.0
    assert _sql1(spark, "SELECT st_distance(a, a) FROM t",
                 t=pdf) == 0.0
    assert _sql1(spark, "SELECT st_disjoint(a, b) FROM t",
                 t=pdf) is True
    assert _sql1(spark, "SELECT st_disjoint(a, a) FROM t",
                 t=pdf) is False


def test_overlay_set_on_known_squares(spark):
    a = polygon_wkb([np.array([[0, 0], [2, 0], [2, 2], [0, 2],
                               [0, 0]], float)])
    b = polygon_wkb([np.array([[1, 1], [3, 1], [3, 3], [1, 3],
                               [1, 1]], float)])
    pdf = pd.DataFrame({"a": [a], "b": [b]})
    q = ("SELECT st_area(st_intersection(a, b)) AS i,"
         " st_area(st_union(a, b)) AS u,"
         " st_area(st_difference(a, b)) AS d,"
         " st_area(st_symdifference(a, b)) AS s FROM t")
    spark.createDataFrame(pdf).createOrReplaceTempView("t")
    r = spark.sql(q).collect()[0]
    assert r.i == pytest.approx(1.0, abs=1e-9)
    assert r.u == pytest.approx(7.0, abs=1e-9)
    assert r.d == pytest.approx(3.0, abs=1e-9)
    assert r.s == pytest.approx(6.0, abs=1e-9)
    # non-polygon input -> NULL by declaration
    pdf2 = pd.DataFrame({"a": [point_wkb(0.0, 0.0)], "b": [b]})
    assert _sql1(spark, "SELECT st_intersection(a, b) FROM t",
                 t=pdf2) is None


def test_buffer_centroid_hulls(spark):
    pdf = pd.DataFrame({"g": [point_wkb(3.0, 4.0)]})
    a = _sql1(spark,
              "SELECT st_area(st_buffer(g, CAST(2 AS DOUBLE)))"
              " FROM t", t=pdf)
    # 8 quad segs -> inscribed 32-gon of the r=2 circle
    assert a == pytest.approx(
        32 * 0.5 * 4.0 * np.sin(2 * np.pi / 32), rel=1e-9)
    sq = polygon_wkb([np.array([[0, 0], [4, 0], [4, 2], [0, 2],
                                [0, 0]], float)])
    pdf2 = pd.DataFrame({"g": [sq]})
    assert _sql1(spark, "SELECT st_astext(st_centroid(g)) FROM t",
                 t=pdf2) == "POINT (2.0 1.0)"
    # convex hull of a concave L returns the bounding triangle-ish
    ell = polygon_wkb([np.array([[0, 0], [4, 0], [4, 1], [1, 1],
                                 [1, 4], [0, 4], [0, 0]], float)])
    pdf3 = pd.DataFrame({"g": [ell]})
    hull_area = _sql1(spark,
                      "SELECT st_area(st_convexhull(g)) FROM t",
                      t=pdf3)
    assert hull_area == pytest.approx(11.5, abs=1e-9)


def test_simplify_and_makevalid(spark):
    line = linestring_wkb(np.array(
        [[0, 0], [1, 0.001], [2, 0], [4, 0.002], [5, 0]], float))
    pdf = pd.DataFrame({"g": [line]})
    n = _sql1(spark, "SELECT st_numpoints(st_simplify(g,"
              " CAST(0.1 AS DOUBLE))) FROM t", t=pdf)
    assert n == 2
    bow = polygon_wkb([np.array([[0, 0], [2, 2], [2, 0], [0, 2],
                                 [0, 0]], float)])
    pdf2 = pd.DataFrame({"g": [bow]})
    r = spark.createDataFrame(pdf2).selectExpr(
        "st_isvalid(g) AS v0",
        "st_isvalid(st_makevalid(g)) AS v1",
        "st_area(st_makevalid(g)) AS a").collect()[0]
    assert r.v0 is False and r.v1 is True
    # the bowtie resolves to two area-1 triangles
    assert r.a == pytest.approx(2.0, abs=1e-9)


def test_multi_geometry_accessors(spark):
    mp = multipolygon_wkb([
        [np.array([[0, 0], [1, 0], [1, 1], [0, 1], [0, 0]], float)],
        [np.array([[5, 5], [7, 5], [7, 7], [5, 7], [5, 5]], float)],
    ])
    pdf = pd.DataFrame({"g": [mp]})
    spark.createDataFrame(pdf).createOrReplaceTempView("t")
    r = spark.sql(
        "SELECT st_numgeometries(g) AS n, st_numpoints(g) AS np,"
        " st_area(st_geometryn(g, 2)) AS a2,"
        " st_geometryn(g, 3) AS missing FROM t").collect()[0]
    assert r.n == 2 and r.np == 10
    assert r.a2 == pytest.approx(4.0, abs=1e-12)
    assert r.missing is None


def test_transform_roundtrip_and_known_point(spark):
    pdf = pd.DataFrame({"g": [point_wkb(0.0, 0.0)]})
    x = _sql1(spark, "SELECT st_x(st_transform(g, 4326, 3857))"
              " FROM t", t=pdf)
    assert x == 0.0
    pdf2 = pd.DataFrame({"g": [point_wkb(10.0, 45.0)]})
    back = _sql1(spark, "SELECT st_y(st_transform(st_transform(g,"
                 " 4326, 3857), 3857, 4326)) FROM t", t=pdf2)
    assert back == pytest.approx(45.0, abs=1e-9)


def test_hilbert_matches_kernel(spark):
    from gdal_spark.functions.hilbert import hilbert_code_u16

    rng = np.random.default_rng(9)
    pdf = pd.DataFrame({"x": rng.uniform(0, 100, 40),
                        "y": rng.uniform(0, 100, 40)})
    rows = spark.createDataFrame(pdf).selectExpr(
        "x", "y",
        "st_hilbert(x, y, CAST(0 AS DOUBLE), CAST(0 AS DOUBLE),"
        " CAST(100 AS DOUBLE), CAST(100 AS DOUBLE)) AS h").collect()
    hm = (1 << 16) - 1
    for r in rows:
        gx = np.uint32(min(np.floor(hm * r.x / 100), hm))
        gy = np.uint32(min(np.floor(hm * r.y / 100), hm))
        assert r.h == int(hilbert_code_u16(
            np.array([gx]), np.array([gy]))[0])


def test_null_propagation(spark):
    pdf = pd.DataFrame({"g": [None], "h": [point_wkb(1.0, 2.0)]})
    from pyspark.sql.types import (
        BinaryType, StructField, StructType,
    )
    spark.createDataFrame(pdf, StructType(
        [StructField("g", BinaryType()),
         StructField("h", BinaryType())])
    ).createOrReplaceTempView("t")
    r = spark.sql(
        "SELECT st_x(g) AS x, st_distance(g, h) AS d,"
        " st_buffer(g, CAST(1 AS DOUBLE)) AS b,"
        " st_astext(g) AS t FROM t").collect()[0]
    assert r.x is None and r.d is None
    assert r.b is None and r.t is None
