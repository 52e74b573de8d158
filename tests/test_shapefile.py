"""Shapefile driver tests.

Golden strategy: the reference's canonical poly.shp fixture
(autotest/ogr/data/poly.shp — the file ogr_shape.py itself anchors
on) must decode to its documented attributes (eas_id < 170 in file
order == [168, 169, 166, 158, 165], autotest/ogr/ogr_shape.py:91)
and every feature's shoelace area must equal its AREA attribute; the
full autotest shp fixture corpus is a decode smoke matrix (every
valid file decodes, the intentionally-corrupt buggy* files raise the
truncation error, MultiPatch raises out-of-scope).  The writer is
checked as read(write(x)) == x byte-for-byte on geometry.
"""

import glob
import struct
from datetime import date

import numpy as np
import pandas as pd
import pytest

from gdal_spark.geometry.packed import geom_area
from gdal_spark.geometry.wkb import (
    MULTILINESTRING, MULTIPOLYGON, POLYGON, linestring_wkb,
    multilinestring_wkb, multipoint_wkb, multipolygon_wkb,
    parse_wkb, point_wkb, polygon_wkb,
)
from gdal_spark.sources.shapefile import (
    _shp_record_to_wkb, read_shapefile, write_shapefile,
)

DATA = "/root/reference/autotest/ogr/data"


def _iter_records(path: str):
    with open(path, "rb") as fh:
        buf = fh.read()
    off = 100
    while off + 8 <= len(buf):
        _, ln = struct.unpack_from(">2i", buf, off)
        content = buf[off + 8:off + 8 + ln * 2]
        if len(content) < ln * 2:
            raise ValueError("truncated shapefile record")
        yield content
        off += 8 + ln * 2


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


# ------------------------------------------------------- poly.shp

def test_poly_shp_golden(spark):
    df = read_shapefile(spark, f"{DATA}/poly.shp")
    assert df.schema.simpleString() == (
        "struct<fid:bigint,geometry:binary,AREA:double,"
        "EAS_ID:bigint,PRFEDEA:string>")
    pdf = df.orderBy("fid").toPandas()
    assert len(pdf) == 10
    # ogr_shape.py:91 — attribute filter order golden
    assert [int(v) for v in pdf[pdf.EAS_ID < 170].EAS_ID] == \
        [168, 169, 166, 158, 165]
    assert sorted(pdf.EAS_ID) == [158, 165, 166, 168, 169, 170,
                                  171, 172, 173, 179]
    # every feature's geometry area equals its AREA attribute
    # (record 8 stores the attribute negative in the fixture)
    for _, r in pdf.iterrows():
        g = parse_wkb(bytes(r.geometry))
        assert _ring_area(g) == pytest.approx(abs(r.AREA), abs=0.05)


def test_poly_shp_split_read_matches_single(spark):
    one = read_shapefile(spark, f"{DATA}/poly.shp") \
        .orderBy("fid").toPandas()
    df4 = read_shapefile(spark, f"{DATA}/poly.shp",
                         records_per_split=3)
    assert df4.rdd.getNumPartitions() == 4
    assert one.equals(df4.orderBy("fid").toPandas())


# ------------------------------------------- fixture decode matrix

def test_all_reference_fixtures_decode():
    ok = oos = trunc = 0
    for shp in sorted(glob.glob(f"{DATA}/shp/*.shp")
                      + [f"{DATA}/poly.shp"]):
        try:
            with open(shp, "rb") as fh:
                if len(fh.read(100)) < 100:
                    continue
            for content in _iter_records(shp):
                wkb = _shp_record_to_wkb(content)
                if wkb is not None:
                    parse_wkb(wkb)
            ok += 1
        except ValueError as e:
            if "out of scope" in str(e):
                oos += 1          # MultiPatch
            elif "truncated" in str(e):
                trunc += 1        # the buggy* corrupt fixtures
            else:
                raise
    assert ok >= 42 and oos >= 1 and trunc == 3


def test_ring_grouping_fixtures():
    """Winding-order ring grouping: a county polygon with a hole
    stays POLYGON(shell+hole); two-shell records become
    MULTIPOLYGON (organizePolygons semantics)."""
    county = [parse_wkb(_shp_record_to_wkb(c))
              for c in _iter_records(
                  f"{DATA}/shp/cb_2022_us_county_20m_extract.shp")]
    assert [g.kind for g in county] == [POLYGON]
    assert len(county[0].parts) == 2      # shell + hole
    kinds = [parse_wkb(_shp_record_to_wkb(c)).kind
             for c in _iter_records(
                 f"{DATA}/shp/multipolygon_as_invalid_polygon.shp")]
    assert kinds == [MULTIPOLYGON, MULTIPOLYGON]


@pytest.mark.parametrize("name", [
    "pointz_without_m.shp",       # PointZ (11)
    "testpointm.shp",             # PointM (21)
    "arcm_with_m.shp",            # PolyLineM (23)
    "polygonm_with_m.shp",        # PolygonM (25)
    "multipointz_without_m.shp",  # MultiPointZ (18)
])
def test_zm_variants_decode_as_xy(name):
    for content in _iter_records(f"{DATA}/shp/{name}"):
        wkb = _shp_record_to_wkb(content)
        if wkb is not None:
            g = parse_wkb(wkb)
            assert all(p.shape[1] == 2 for p in g.parts)


# ------------------------------------------------------ round trip

def _geom_frame(spark):
    rows = [
        ("pt", point_wkb(1.5, -2.25)),
        ("ls", linestring_wkb([(0, 0), (1, 1), (2, 0.5)])),
        ("mls", multilinestring_wkb(
            [[(0, 0), (1, 0)], [(0, 1), (1, 1), (2, 2)]])),
        ("poly", polygon_wkb(
            [[(0, 0), (4, 0), (4, 4), (0, 4), (0, 0)],
             [(1, 1), (1, 2), (2, 2), (2, 1), (1, 1)]])),
        ("mpoly", multipolygon_wkb(
            [[[(0, 0), (1, 0), (1, 1), (0, 1), (0, 0)]],
             [[(5, 5), (8, 5), (8, 8), (5, 8), (5, 5)],
              [(6, 6), (6, 7), (7, 7), (7, 6), (6, 6)]]])),
        ("mpt", multipoint_wkb([(0.5, 0.5), (-3, 7)])),
        ("null", None),
    ]
    return rows


@pytest.mark.parametrize("kind", ["pt", "ls", "mls", "poly",
                                  "mpoly", "mpt"])
def test_geometry_roundtrip(spark, tmp_path, kind):
    wkb = dict(_geom_frame(spark))[kind]
    df = spark.createDataFrame(
        pd.DataFrame({"geometry": [wkb, None],
                      "tag": [kind, "null"]}))
    n = write_shapefile(df, str(tmp_path / "rt"), mode="single")
    assert n == 2
    back = read_shapefile(spark, str(tmp_path / "rt.shp")) \
        .orderBy("fid").toPandas()
    got = {t: (None if g is None else bytes(g))
           for t, g in zip(back.tag, back.geometry)}
    assert got["null"] is None
    src, out = parse_wkb(wkb), parse_wkb(got[kind])
    # single-member multis may round-trip as the simple kind (a
    # shapefile has no multi/single distinction); geometry must be
    # coordinate-identical
    assert len(src.parts) == len(out.parts)
    for a, b in zip(src.parts, out.parts):
        np.testing.assert_allclose(a, b)


def test_attribute_types_roundtrip(spark, tmp_path):
    pdf = pd.DataFrame({
        "geometry": [point_wkb(float(i), float(-i))
                     for i in range(4)],
        "name": ["alpha", "bé", None, "delta"],
        "n_int": pd.array([7, -42, None, 2 ** 40], dtype="Int64"),
        "x_real": [1.5, -0.25, float("nan"), 1e12],
        "flag": pd.array([True, False, None, True],
                         dtype="boolean"),
        "day": [date(2024, 2, 29), None, date(1999, 12, 31),
                date(2026, 1, 1)],
    })
    df = spark.createDataFrame(pdf)
    write_shapefile(df, str(tmp_path / "attrs"), mode="single")
    back = read_shapefile(spark, str(tmp_path / "attrs.shp")) \
        .orderBy("fid").toPandas()
    assert list(back["name"]) == ["alpha", "bé", None, "delta"]
    ni = back["n_int"]      # Spark nullable bigint -> float64 NaN
    assert pd.isna(ni[2])
    assert [int(v) for v in ni[[0, 1, 3]]] == [7, -42, 2 ** 40]
    assert back["x_real"][0] == 1.5 and back["x_real"][3] == 1e12
    assert np.isnan(back["x_real"][2])
    fl = back["flag"]
    assert pd.isna(fl[2]) and list(fl[[0, 1, 3]]) == \
        [True, False, True]
    dy = back["day"]
    assert pd.isna(dy[1])
    assert [d for d in dy[[0, 2, 3]]] == [date(2024, 2, 29),
                                          date(1999, 12, 31),
                                          date(2026, 1, 1)]


def test_parts_mode_distributed_write(spark, tmp_path):
    pdf = pd.DataFrame({
        "geometry": [point_wkb(float(i), float(i % 7))
                     for i in range(500)],
        "k": pd.array(range(500), dtype="Int64"),
    })
    df = spark.createDataFrame(pdf).repartition(4)
    out = tmp_path / "parts"
    n = write_shapefile(df, str(out), mode="parts")
    assert n == 500
    files = sorted(glob.glob(str(out / "part-*.shp")))
    assert len(files) == 4
    back = pd.concat([read_shapefile(spark, p).toPandas()
                      for p in files])
    assert sorted(back.k) == list(range(500))


def test_writer_guards(spark, tmp_path):
    mixed = spark.createDataFrame(pd.DataFrame({
        "geometry": [point_wkb(0, 0),
                     linestring_wkb([(0, 0), (1, 1)])]}))
    with pytest.raises(Exception, match="ONE geometry family"):
        write_shapefile(mixed, str(tmp_path / "mx"), mode="single")
    with pytest.raises(ValueError, match="shared-filesystem"):
        write_shapefile(mixed, "s3a://bucket/x")
    big = spark.createDataFrame(pd.DataFrame({
        "geometry": [point_wkb(0, 0)],
        "n": pd.array([10 ** 19], dtype="float64")}))
    # 10^19 as N 24.15 fits; an int column overflowing N 18 raises
    from gdal_spark.sources.shapefile import _dbf_format
    with pytest.raises(ValueError, match="overflows"):
        _dbf_format(10 ** 19, "N", 18, 0)


def test_fid_attribute_collision_dedupes(spark, tmp_path):
    df = spark.createDataFrame(pd.DataFrame({
        "geometry": [point_wkb(1, 2)],
        "fid": pd.array([99], dtype="Int64")}))
    write_shapefile(df, str(tmp_path / "fidcol"), mode="single")
    back = read_shapefile(spark, str(tmp_path / "fidcol.shp"))
    assert [f.name for f in back.schema.fields] == \
        ["fid", "geometry", "fid_1"]
    assert back.toPandas().fid_1[0] == 99
