"""OSM PBF driver vs the reference's own autotest expectations
(autotest/ogr/ogr_osm.py test_ogr_osm_1 over data/osm/test.pbf)."""

import numpy as np
import pandas as pd
import pytest

from gdal_spark.geometry import wkb as W
from gdal_spark.sources.osm import (
    LAYERS, osm_elements, read_osm, scan_blobs,
)

PBF = "/root/reference/autotest/ogr/data/osm/test.pbf"


def test_blob_index_framing():
    blobs = scan_blobs(PBF)
    assert [b[2] for b in blobs] == ["OSMHeader", "OSMData"]


def test_elements_decode(spark):
    el = osm_elements(spark, PBF).toPandas()
    kinds = el["kind"].value_counts().to_dict()
    assert kinds == {0: 9, 1: 8, 2: 5}
    n3 = el[(el["kind"] == 0) & (el["id"] == 3)].iloc[0]
    assert n3["lon"] == pytest.approx(3.0)
    assert n3["lat"] == pytest.approx(49.5)
    assert dict(n3["tags"]) == {
        "name": "Some interesting point", "foo": "bar",
        "bar": "baz"}


def test_points_layer_matches_reference(spark):
    pts = read_osm(spark, PBF, "points").toPandas()
    # ogr_osm.py: exactly one point, osm_id 3, the name field
    # promoted, foo/bar left in other_tags hstore
    assert len(pts) == 1
    r = pts.iloc[0]
    assert r["osm_id"] == 3
    assert r["name"] == "Some interesting point"
    assert r["other_tags"] == '"foo"=>"bar","bar"=>"baz"'
    g = W.parse_wkb(bytes(r["geometry"]))
    assert tuple(g.parts[0][0]) == (3.0, 49.5)


def test_lines_layer_matches_reference(spark):
    lines = read_osm(spark, PBF, "lines").toPandas() \
        .sort_values("osm_id").reset_index(drop=True)
    # ogr_osm.py: ways 1 and 6 (closed but name-only tag -> line;
    # missing ref 900 silently drops; way 4 all-missing drops;
    # way 5 single node drops; untagged way 7 drops)
    assert lines["osm_id"].tolist() == [1, 6]
    w1 = lines.iloc[0]
    assert w1["highway"] == "motorway"
    assert w1["z_order"] == 9
    assert w1["other_tags"] == '"foo"=>"bar"'
    g1 = W.parse_wkb(bytes(w1["geometry"]))
    np.testing.assert_allclose(g1.parts[0], [[2, 49], [3, 50]])
    g6 = W.parse_wkb(bytes(lines.iloc[1]["geometry"]))
    np.testing.assert_allclose(
        g6.parts[0],
        [[2, 49], [3, 49], [3, 50], [2, 50], [2, 49]])


def test_multipolygons_layer_matches_reference(spark):
    mp = read_osm(spark, PBF, "multipolygons").toPandas()
    by_rel = mp[mp["osm_id"].notna()].sort_values("osm_id") \
        .reset_index(drop=True)
    by_way = mp[mp["osm_way_id"].notna()].reset_index(drop=True)
    # relations 1 and 5 survive (2 has no resolvable inner but its
    # outer still closes; the reference keeps 1 and 5 with tags,
    # 2 resolves too with inherited tags)
    assert 1 in by_rel["osm_id"].tolist()
    assert 5 in by_rel["osm_id"].tolist()
    r1 = by_rel[by_rel["osm_id"] == 1].iloc[0]
    assert r1["type"] == "multipolygon"
    assert r1["natural"] == "forest"
    g = W.parse_wkb(bytes(r1["geometry"]))
    assert g.kind == W.MULTIPOLYGON
    # outer 1x1 degree square with a 0.1x0.1 hole
    areas = []
    for ring in g.parts:
        xs, ys = ring[:, 0], ring[:, 1]
        areas.append(0.5 * abs(np.sum(
            xs[:-1] * ys[1:] - xs[1:] * ys[:-1])))
    assert max(areas) == pytest.approx(1.0)
    assert min(areas) == pytest.approx(0.01)
    # old-style inheritance: relation 5 carries only type ->
    # natural=wood inherited from outer way 2
    r5 = by_rel[by_rel["osm_id"] == 5].iloc[0]
    assert r5["natural"] == "wood"
    # standalone closed area way 8 keys on osm_way_id
    assert by_way["osm_way_id"].tolist() == [8]
    assert by_way.iloc[0]["name"] == "standalone_polygon"


def test_multilinestrings_layer_matches_reference(spark):
    ml = read_osm(spark, PBF, "multilinestrings").toPandas()
    assert ml["osm_id"].tolist() == [3]
    assert ml.iloc[0]["type"] == "route"
    g = W.parse_wkb(bytes(ml.iloc[0]["geometry"]))
    assert g.kind == W.MULTILINESTRING
    np.testing.assert_allclose(g.parts[0], [[2, 49], [3, 50]])


def test_uncompressed_and_nondense_variants(spark):
    """The reference's uncompressed / non-dense fixtures decode to
    the same two points."""
    for name in ("two_points.pbf",
                 "test_uncompressed_dense_false.pbf",
                 "test_uncompressed_dense_true_nometadata.pbf"):
        path = f"/root/reference/autotest/ogr/data/osm/{name}"
        el = osm_elements(spark, path).toPandas()
        assert (el["kind"] == 0).sum() >= 1, name


def test_unknown_layer_raises(spark):
    with pytest.raises(ValueError, match="other_relations"):
        read_osm(spark, PBF, "other_relations")
    assert set(LAYERS) == {"points", "lines", "multipolygons",
                           "multilinestrings"}


def test_osm_xml_matches_pbf(spark):
    """test.osm (the XML twin of test.pbf) yields identical layers
    through the byte-range XML split path."""
    xml = "/root/reference/autotest/ogr/data/osm/test.osm"
    pts = read_osm(spark, xml, "points").toPandas()
    assert len(pts) == 1 and pts.iloc[0]["osm_id"] == 3
    assert pts.iloc[0]["other_tags"] == '"foo"=>"bar","bar"=>"baz"'
    lines = read_osm(spark, xml, "lines").toPandas() \
        .sort_values("osm_id")
    assert lines["osm_id"].tolist() == [1, 6]
    assert lines.iloc[0]["z_order"] == 9
    mp = read_osm(spark, xml, "multipolygons").toPandas()
    assert sorted(mp[mp["osm_id"].notna()]["osm_id"].tolist()) \
        == [1, 2, 5]
    assert mp[mp["osm_way_id"].notna()]["osm_way_id"].tolist() \
        == [8]
