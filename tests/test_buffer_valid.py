"""Buffer + MakeValid goldens (ogrgeometry.cpp:4949 Buffer, :4183
MakeValid — GDAL-docs bowtie golden, analytic round-join areas)."""

import numpy as np
import pytest

from gdal_spark.geometry.buffer import (
    buffer_line, buffer_point, buffer_polygon,
)
from gdal_spark.geometry.packed import ring_signed_area
from gdal_spark.geometry.valid import make_valid, resolve_rings


def sq(x0, y0, x1, y1):
    return np.array([(x0, y0), (x1, y0), (x1, y1), (x0, y1), (x0, y0)],
                    dtype=np.float64)


def area(polys):
    return sum(ring_signed_area(r) for p in polys for r in p)


FAN = 16 * np.sin(np.pi / 16)  # 4 corner fans, quad_segs=8, r=1


def test_makevalid_bowtie_gdal_docs_golden():
    """GDAL MakeValid docs: POLYGON((0 0,10 10,0 10,10 0,0 0)) ->
    two triangles meeting at (5 5)."""
    bow = np.array([(0, 0), (10, 10), (0, 10), (10, 0), (0, 0)],
                   dtype=np.float64)
    polys = make_valid([bow])
    assert len(polys) == 2
    areas = sorted(ring_signed_area(p[0]) for p in polys)
    assert areas == pytest.approx([25.0, 25.0], abs=1e-6)
    vsets = [set(map(tuple, np.round(p[0][:-1]).astype(int)))
             for p in polys]
    assert {(0, 0), (5, 5), (10, 0)} in vsets
    assert {(5, 5), (0, 10), (10, 10)} in vsets


def test_makevalid_passthrough_and_holes():
    polys = make_valid([sq(0, 0, 10, 10)])
    assert len(polys) == 1
    assert area(polys) == pytest.approx(100, abs=1e-6)
    polys = make_valid([sq(0, 0, 10, 10), sq(3, 3, 7, 7)[::-1]])
    assert len(polys) == 1 and len(polys[0]) == 2
    assert area(polys) == pytest.approx(84, abs=1e-6)


def test_resolve_rules():
    r1, r2 = sq(0, 0, 10, 10), sq(5, 5, 15, 15)
    assert area(resolve_rings([r1, r2], "evenodd")) == \
        pytest.approx(150, abs=1e-6)
    assert area(resolve_rings([r1, r2], "nonzero")) == \
        pytest.approx(175, abs=1e-6)


def test_buffer_square_round_joins():
    got = area(buffer_polygon([sq(0, 0, 1, 1)], 1.0))
    assert got == pytest.approx(1 + 4 + FAN, abs=1e-6)


def test_buffer_negative_exact_and_collapse():
    assert area(buffer_polygon([sq(0, 0, 10, 10)], -2.0)) == \
        pytest.approx(36, abs=1e-6)
    assert buffer_polygon([sq(0, 0, 10, 10)], -6.0) == []


def test_buffer_hole_shrinks_then_collapses():
    rings = [sq(0, 0, 10, 10), sq(3, 3, 7, 7)[::-1]]
    polys = buffer_polygon(rings, 1.0)
    assert len(polys) == 1 and len(polys[0]) == 2
    assert area(polys) == pytest.approx(100 + 40 + FAN - 4, abs=1e-6)
    polys = buffer_polygon(rings, 3.0)  # hole inradius 2 < 3
    assert len(polys) == 1 and len(polys[0]) == 1
    assert area(polys) == pytest.approx(100 + 120 + 9 * FAN, abs=1e-6)


def test_buffer_erosion_splits_dumbbell():
    ring = np.array([(0, 0), (10, 0), (10, 4), (16, 4), (16, 0),
                     (26, 0), (26, 10), (16, 10), (16, 6), (10, 6),
                     (10, 10), (0, 10), (0, 0)], dtype=np.float64)
    polys = buffer_polygon([ring], -2.0)
    assert len(polys) == 2
    # 6x6 cores plus the corner-distance lenses at the bridge mouths
    for p in polys:
        a = ring_signed_area(p[0])
        assert 36.0 < a < 36.5


def test_buffer_point_and_line():
    got = area(buffer_point(0.0, 0.0, 2.0))
    assert got == pytest.approx(0.5 * 32 * 4 * np.sin(2 * np.pi / 32),
                                abs=1e-6)
    got = area(buffer_line(np.array([(0.0, 0.0), (10.0, 0.0)]), 1.0))
    assert got == pytest.approx(20 + FAN, abs=1e-6)


def test_buffer_sql_udfs(spark):
    from gdal_spark.geometry.wkb import parse_wkb, polygon_wkb
    from gdal_spark.geometry.packed import geom_area
    from gdal_spark.sql.ogrsql import _register_geom_udfs

    import pandas as pd

    _register_geom_udfs(spark)
    bow = np.array([(0, 0), (10, 10), (0, 10), (10, 0), (0, 0)],
                   dtype=np.float64)
    df = spark.createDataFrame(pd.DataFrame({
        "fid": np.array([1, 2], dtype=np.int64),
        "geometry": [polygon_wkb([sq(0, 0, 1, 1)]),
                     polygon_wkb([bow])],
    }))
    df.createOrReplaceTempView("geoms")
    out = spark.sql(
        "SELECT fid, st_buffer(geometry, CAST(1.0 AS DOUBLE)) AS buf,"
        " st_makevalid(geometry) AS fixed FROM geoms ORDER BY fid"
    ).toPandas()
    assert geom_area(parse_wkb(bytes(out["buf"][0]))) == \
        pytest.approx(1 + 4 + FAN, abs=1e-6)
    assert geom_area(parse_wkb(bytes(out["fixed"][1]))) == \
        pytest.approx(50, abs=1e-6)
