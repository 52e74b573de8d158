"""GML driver: reference-fixture decode matrix, axis-order rule,
round-trips through the distributed byte-range reader, registry.

Anchors are the reference's OWN autotest corpus
(/root/reference/autotest/ogr/data/gml/): archsites
(featureMembers-plural + gml:id + pos, projected urn keeps
document order), gnis_pop (GML2 coordinates with cs/ts + fid
attr), expected_gml_gml3/32 (urn 4326 -> axis swap: pos "49 2"
reads as (2, 49) — the values GDAL itself expects).
"""

import os

import numpy as np
import pandas as pd
import pytest

from gdal_spark.geometry import wkb as W
from gdal_spark.sources.gml import read_gml, write_gml

REF = "/root/reference/autotest/ogr/data/gml"


def _one(df):
    rows = df.collect()
    assert len(rows) == 1
    return rows[0]


# --------------------------------------------- reference fixtures

def test_archsites_plural_members(spark):
    # featureMembers container: the feature element is the split
    # unit; gml:id surfaces as gml_id; projected urn -> no swap
    df = read_gml(spark, f"{REF}/archsites.gml")
    r = _one(df)
    assert r["gml_id"] == "archsites.3951"
    assert r["cat"] == 1
    assert r["str1"] == "Signature Rock"
    g = W.parse_wkb(bytes(r["geometry"]))
    np.testing.assert_allclose(g.parts[0][0], [593493.0, 4914730.0])


def test_gnis_gml2_coordinates(spark):
    df = read_gml(spark, f"{REF}/gnis_pop_100.gml")
    rows = {r["gml_id"]: r for r in df.collect()}
    assert len(rows) == 20
    r = rows["gnis_pop.148604"]
    assert r["population"] == 84683
    assert r["country"] == "Algeria"
    g = W.parse_wkb(bytes(r["geometry"]))
    np.testing.assert_allclose(g.parts[0][0], [2.09, 34.12])


@pytest.mark.parametrize("f", ["expected_gml_gml3.gml",
                               "expected_gml_gml32.gml"])
def test_urn_4326_axis_swap(spark, f):
    # the reference's own GML3 expected output: <gml:pos>49 2</>
    # under urn ...4326 means (x=2, y=49)
    df = read_gml(spark, f"{REF}/{f}")
    pts = sorted(
        tuple(W.parse_wkb(bytes(r["geometry"])).parts[0][0])
        for r in df.collect())
    assert pts == [(2.0, 49.0), (3.0, 48.0)]


# --------------------------------------------------- round-trips

def _geom_set(df):
    return sorted(bytes(r["geometry"]) for r in df.collect())


def test_point_roundtrip_typed_fields(spark, tmp_path):
    rng = np.random.default_rng(6)
    n = 50
    pdf = pd.DataFrame({
        "fid": np.arange(1, n + 1, dtype=np.int64),
        "geometry": [W.point_wkb(float(x), float(y))
                     for x, y in rng.uniform(-80, 80, (n, 2))],
        "name": [f"s{i}" for i in range(n)],
        "cnt": np.arange(n, dtype=np.int64) * 7,
        "score": rng.uniform(0, 1, n),
    })
    df = spark.createDataFrame(pdf)
    p = str(tmp_path / "pts")
    write_gml(df, p, layer="sites")
    back = read_gml(spark, p).toPandas()
    assert len(back) == n
    got = back.set_index("gml_id")
    for _, row in pdf.iterrows():
        r = got.loc[f"sites.{row.fid}"]
        assert bytes(r["geometry"]) == bytes(row["geometry"])
        assert r["name"] == row["name"]
        assert int(r["cnt"]) == int(row["cnt"])
        assert float(r["score"]) == float(row["score"])  # repr-exact


def test_geometry_kinds_roundtrip(spark, tmp_path):
    shell = np.array([[0.0, 0.0], [4.0, 0.0], [4.0, 4.0],
                      [0.0, 4.0], [0.0, 0.0]])
    hole = shell * 0.25 + 1.0
    geoms = [
        W.point_wkb(1.5, -2.5),
        W.linestring_wkb(np.array([[0.0, 0.0], [1.0, 2.0],
                                   [3.0, 2.5]])),
        W.polygon_wkb([shell, hole]),
        W.multipoint_wkb([(0.0, 1.0), (2.0, 3.0)]),
        W.multilinestring_wkb([np.array([[0.0, 0.0], [1.0, 1.0]]),
                               np.array([[2.0, 2.0], [3.0, 3.0]])]),
        W.multipolygon_wkb([[shell], [shell + 10.0]]),
    ]
    pdf = pd.DataFrame({
        "fid": np.arange(1, len(geoms) + 1, dtype=np.int64),
        "geometry": geoms,
    })
    df = spark.createDataFrame(pdf)
    p = str(tmp_path / "kinds")
    write_gml(df, p, mode="single")
    back = read_gml(spark, p)
    assert _geom_set(back) == sorted(geoms)


def test_split_reader_many_tasks(spark, tmp_path):
    # force multiple byte-range tasks over one single-mode file and
    # prove no feature is lost or duplicated at range boundaries
    n = 300
    pdf = pd.DataFrame({
        "fid": np.arange(n, dtype=np.int64),
        "geometry": [W.point_wkb(float(i % 360 - 180),
                                 float(i % 160 - 80))
                     for i in range(n)],
        "tag": [f"x{i}" * 3 for i in range(n)],
    })
    df = spark.createDataFrame(pdf)
    p = str(tmp_path / "many")
    write_gml(df, p, mode="single")
    f = p if os.path.isfile(p) else os.path.join(p)
    sz = os.path.getsize(f)
    back = read_gml(spark, p, bytes_per_task=max(sz // 7, 1))
    got = back.toPandas()
    assert len(got) == n
    assert sorted(got["gml_id"]) == sorted(f"layer.{i}"
                                           for i in range(n))


def test_registry_dispatch(spark, tmp_path):
    from gdal_spark.sources.registry import (
        open_vector, sniff_vector_driver, write_vector,
    )
    pdf = pd.DataFrame({
        "fid": np.arange(1, 9, dtype=np.int64),
        "geometry": [W.point_wkb(float(i), float(i))
                     for i in range(8)],
    })
    df = spark.createDataFrame(pdf)
    p = str(tmp_path / "r.gml")
    write_vector(df, p, mode="single")
    assert sniff_vector_driver(p) == "GML"
    assert open_vector(spark, p).count() == 8
    # extensionless content sniff
    import shutil
    q = str(tmp_path / "noext")
    shutil.copy(p, q)
    assert sniff_vector_driver(q) == "GML"


def test_null_and_missing_fields(spark, tmp_path):
    pdf = pd.DataFrame({
        "fid": np.array([1, 2], dtype=np.int64),
        "geometry": [W.point_wkb(0.0, 0.0), W.point_wkb(1.0, 1.0)],
        "opt": ["here", None],
    })
    df = spark.createDataFrame(pdf)
    p = str(tmp_path / "nulls")
    write_gml(df, p, mode="single")
    back = read_gml(spark, p).toPandas().set_index("gml_id")
    assert back.loc["layer.1"]["opt"] == "here"
    assert back.loc["layer.2"]["opt"] is None or \
        pd.isna(back.loc["layer.2"]["opt"])
