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


def test_multipolygon_two_outers_and_segment_stitch(spark, tmp_path):
    """Synthesized relation: two separate outer squares (one built
    from TWO open way segments that must stitch end-to-end), an
    inner hole that belongs to the FIRST outer only."""
    from gdal_spark.sources.osm import read_osm, write_osm_pbf

    # square A (0..4), hole (1..2), square B (10..12)
    nodes = []
    nid = 0
    coords = {}

    def add(x, y):
        nonlocal nid
        nid += 1
        coords[nid] = (x, y)
        nodes.append((nid, float(x), float(y), {}))
        return nid

    a1, a2, a3, a4 = add(0, 0), add(4, 0), add(4, 4), add(0, 4)
    h1, h2, h3, h4 = add(1, 1), add(2, 1), add(2, 2), add(1, 2)
    b1, b2, b3, b4 = add(10, 0), add(12, 0), add(12, 2), add(10, 2)
    ways = [
        # outer A split into two OPEN segments
        (101, [a1, a2, a3], {}),
        (102, [a3, a4, a1], {}),
        (103, [h1, h2, h3, h4, h1], {}),
        (104, [b1, b2, b3, b4, b1], {}),
    ]
    rels = [(500, [("outer", 101, 1), ("outer", 102, 1),
                   ("inner", 103, 1), ("outer", 104, 1)],
             {"type": "multipolygon", "landuse": "forest"})]
    p = str(tmp_path / "mp.osm.pbf")
    write_osm_pbf(p, nodes, ways, rels)
    mp = read_osm(spark, p, "multipolygons").toPandas()
    assert len(mp) == 1
    g = W.parse_wkb(bytes(mp.iloc[0]["geometry"]))
    assert g.kind == W.MULTIPOLYGON
    areas = sorted(round(abs(
        0.5 * np.sum(r[:-1, 0] * r[1:, 1] - r[1:, 0] * r[:-1, 1])), 6)
        for r in g.parts)
    assert areas == [1.0, 4.0, 16.0]
    assert mp.iloc[0]["landuse"] == "forest"
    # hole grouped under outer A: the multipolygon has 2 parts,
    # the first carrying 2 rings
    po = W.parse_wkb(bytes(mp.iloc[0]["geometry"])).part_offsets
    ring_counts = sorted(po[i + 1] - po[i]
                         for i in range(len(po) - 1))
    assert ring_counts == [1, 2]
