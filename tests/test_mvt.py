"""MVT driver: protobuf wire, geometry commands, round-trips,
multi-tile clipping conservation, registry dispatch.

Reference parity target: ogr/ogrsf_frmts/mvt/ (defaults in
mvtutils.h:43-52); semantics re-derived from the public Mapbox
vector-tile-spec 2.1.
"""

import gzip
import json
import os

import numpy as np
import pandas as pd
import pytest

from gdal_spark.functions.geo import ORIGIN
from gdal_spark.geometry import wkb as W
from gdal_spark.sources.mvt import (
    _cmds_paths, _cmds_points, _decode_cmds, _int_ring_area2,
    _merc_xy, _unzz, _uvarint, _read_uvarint, _zz,
    read_mvt, write_mvt,
)


# ---------------------------------------------------------------- pure

def test_varint_roundtrip():
    mvals = [0, 1, 127, 128, 300, 2 ** 32, 2 ** 56 + 17]
    buf = b"".join(_uvarint(v) for v in mvals)
    i, out = 0, []
    while i < len(buf):
        v, i = _read_uvarint(memoryview(buf), i)
        out.append(v)
    assert out == mvals


def test_zigzag_roundtrip():
    for v in [0, 1, -1, 2, -2, 4095, -4096, 2 ** 40, -(2 ** 40)]:
        assert _unzz(_zz(v)) == v


def test_cmds_roundtrip_paths():
    parts = [np.array([[2, 2], [10, 2], [10, 10]], dtype=np.int64),
             np.array([[0, 0], [5, 7]], dtype=np.int64)]
    cmds = _cmds_paths(parts, close=False)
    back = _decode_cmds(2, cmds)
    assert len(back) == 2
    np.testing.assert_array_equal(back[0], parts[0])
    np.testing.assert_array_equal(back[1], parts[1])


def test_cmds_roundtrip_polygon_closed():
    ring = np.array([[0, 0], [8, 0], [8, 8], [0, 8]], dtype=np.int64)
    cmds = _cmds_paths([ring], close=True)
    back = _decode_cmds(3, cmds)
    assert len(back) == 1
    np.testing.assert_array_equal(back[0][:-1], ring)
    np.testing.assert_array_equal(back[0][-1], ring[0])
    # surveyor's formula straight on the stored coords (spec
    # 4.3.4.4): this ring computes positive -> valid exterior
    assert _int_ring_area2(back[0]) > 0


def test_cmds_points_multi():
    pts = np.array([[3, 3], [100, 7]], dtype=np.int64)
    cmds = _cmds_points(pts)
    assert cmds[0] == (2 << 3) | 1          # one MoveTo, count 2
    back = _decode_cmds(1, cmds)
    assert len(back) == 2
    np.testing.assert_array_equal(np.vstack(back), pts)


# ------------------------------------------------------------ fixtures

def _pts_df(spark, n=60, seed=5):
    rng = np.random.default_rng(seed)
    lon = rng.uniform(-170, 170, n)
    lat = rng.uniform(-80, 80, n)
    pdf = pd.DataFrame({
        "fid": np.arange(1, n + 1, dtype=np.int64),
        "geometry": [W.point_wkb(float(x), float(y))
                     for x, y in zip(lon, lat)],
        "name": [f"p{i}" for i in range(n)],
        "cnt": pd.array(
            [None if i % 7 == 0 else i * 3 for i in range(n)],
            dtype="Int64").astype(object),
        "score": rng.uniform(0, 1, n),
        "flag": (np.arange(n) % 2 == 0),
    })
    df = spark.createDataFrame(pdf)
    return df, pdf


def _merc_area(lonlat_ring: np.ndarray) -> float:
    m = _merc_xy(lonlat_ring)
    x, y = m[:, 0], m[:, 1]
    return 0.5 * abs(np.sum(x[:-1] * y[1:] - x[1:] * y[:-1]))


# ----------------------------------------------------------- roundtrip

def test_point_roundtrip_props_fid(spark, tmp_path):
    df, pdf = _pts_df(spark, n=60)
    out = str(tmp_path / "pts.mvt")
    stats = write_mvt(df, out, minzoom=4, maxzoom=4, buffer=0)
    assert stats["features"] == 60
    back = read_mvt(spark, out).toPandas()
    assert len(back) == 60
    got = back.set_index("fid")
    span = 2.0 * ORIGIN / (1 << 4)
    tol_merc = span / 4096 * 0.75
    for _, row in pdf.iterrows():
        r = got.loc[row.fid]
        g = W.parse_wkb(bytes(r.geometry))
        m = _merc_xy(g.parts[0])
        m0 = _merc_xy(np.array(
            [[*W.parse_wkb(bytes(row.geometry)).parts[0][0]]]))
        assert abs(m[0, 0] - m0[0, 0]) <= tol_merc
        assert abs(m[0, 1] - m0[0, 1]) <= tol_merc
        assert r["name"] == row["name"]
        assert r["flag"] == row["flag"]
        assert abs(r["score"] - row["score"]) < 1e-12
        if pd.isna(row["cnt"]):
            assert pd.isna(r["cnt"])
        else:
            assert int(r["cnt"]) == int(row["cnt"])


def test_point_buffer_duplicates_near_edges(spark, tmp_path):
    # a point 1 tile-unit inside a tile edge must also land in the
    # neighbor tile when buffer=80 (the reference default)
    span = 2.0 * ORIGIN / (1 << 3)
    eps = span / 4096            # one tile unit at z=3
    mx = (-ORIGIN + 3 * span) - eps   # just left of boundary x=3
    lon = mx / ORIGIN * 180.0
    pdf = pd.DataFrame({"fid": np.array([1], dtype=np.int64),
                        "geometry": [W.point_wkb(lon, 10.0)]})
    df = spark.createDataFrame(pdf)
    out = str(tmp_path / "edge.mvt")
    write_mvt(df, out, minzoom=3, maxzoom=3, buffer=80)
    back = read_mvt(spark, out).toPandas()
    assert sorted(back["tile_x"]) == [2, 3]
    out2 = str(tmp_path / "edge0.mvt")
    write_mvt(df, out2, minzoom=3, maxzoom=3, buffer=0)
    assert len(read_mvt(spark, out2).toPandas()) == 1


def test_polygon_hole_roundtrip(spark, tmp_path):
    shell = np.array([[10.0, 10.0], [30.0, 10.0], [30.0, 30.0],
                      [10.0, 30.0], [10.0, 10.0]])
    hole = np.array([[18.0, 18.0], [18.0, 22.0], [22.0, 22.0],
                     [22.0, 18.0], [18.0, 18.0]])
    pdf = pd.DataFrame({"fid": np.array([7], dtype=np.int64),
                        "geometry": [W.polygon_wkb([shell, hole])]})
    df = spark.createDataFrame(pdf)
    out = str(tmp_path / "holed.mvt")
    write_mvt(df, out, minzoom=2, maxzoom=2, buffer=80)
    back = read_mvt(spark, out).toPandas()
    assert len(back) == 1
    g = W.parse_wkb(bytes(back.iloc[0].geometry))
    assert g.kind == W.POLYGON and len(g.parts) == 2
    span = 2.0 * ORIGIN / (1 << 2)
    tol = (span / 4096) * 4 * (
        _merc_xy(shell)[:, 0].ptp() + _merc_xy(shell)[:, 1].ptp())
    want = _merc_area(shell) - _merc_area(hole)
    got = _merc_area(g.parts[0]) - _merc_area(g.parts[1])
    assert abs(got - want) <= tol


def test_polygon_multi_tile_area_conservation(spark, tmp_path):
    # spans several z=3 tiles; with buffer=0 the clipped pieces
    # partition the polygon: mercator areas must sum back
    shell = np.array([[-60.0, -40.0], [70.0, -35.0], [65.0, 45.0],
                      [-55.0, 50.0], [-60.0, -40.0]])
    pdf = pd.DataFrame({"fid": np.array([1], dtype=np.int64),
                        "geometry": [W.polygon_wkb([shell])]})
    df = spark.createDataFrame(pdf)
    out = str(tmp_path / "big.mvt")
    stats = write_mvt(df, out, minzoom=3, maxzoom=3, buffer=0)
    assert stats["tiles"] >= 4
    back = read_mvt(spark, out).toPandas()
    got = 0.0
    for _, r in back.iterrows():
        g = W.parse_wkb(bytes(r.geometry))
        po = g.part_offsets
        for gi in range(len(po) - 1):
            grp = g.parts[po[gi]:po[gi + 1]]
            got += _merc_area(grp[0])
            got -= sum(_merc_area(h) for h in grp[1:])
    want = _merc_area(shell)
    # quantization moves each boundary vertex <= 1 tile unit
    span = 2.0 * ORIGIN / (1 << 3)
    tol = (span / 4096) * 8 * 4 * (2 * ORIGIN)   # unit * edges-ish
    assert abs(got - want) <= tol
    assert got > 0.9 * want


def test_line_multi_tile_length_conservation(spark, tmp_path):
    line = np.array([[-120.0, -50.0], [-30.0, 10.0], [60.0, 55.0]])
    pdf = pd.DataFrame({"fid": np.array([1], dtype=np.int64),
                        "geometry": [W.linestring_wkb(line)]})
    df = spark.createDataFrame(pdf)
    out = str(tmp_path / "line.mvt")
    write_mvt(df, out, minzoom=3, maxzoom=3, buffer=0)
    back = read_mvt(spark, out).toPandas()

    def merc_len(coords):
        m = _merc_xy(coords)
        return float(np.sum(np.hypot(*(m[1:] - m[:-1]).T)))

    got = 0.0
    for _, r in back.iterrows():
        g = W.parse_wkb(bytes(r.geometry))
        got += sum(merc_len(p) for p in g.parts)
    want = merc_len(line)
    span = 2.0 * ORIGIN / (1 << 3)
    assert abs(got - want) <= (span / 4096) * 4 * (len(back) + 2) * 2
    assert got > 0.95 * want


def test_gzip_flag_and_metadata(spark, tmp_path):
    df, _ = _pts_df(spark, n=10)
    raw = str(tmp_path / "raw.mvt")
    write_mvt(df, raw, minzoom=1, maxzoom=2, buffer=0,
              compress=False, layer="pages")
    gz = str(tmp_path / "gz.mvt")
    write_mvt(df, gz, minzoom=1, maxzoom=2, buffer=0, layer="pages")
    f_raw = next(p for p in
                 sorted(os.listdir(os.path.join(raw, "1")))
                 for p in [os.path.join(raw, "1", p)]
                 if os.path.isdir(p))
    tile_raw = os.path.join(
        f_raw, sorted(os.listdir(f_raw))[0])
    with open(tile_raw, "rb") as fh:
        head = fh.read(2)
    assert head[0] == 0x1A                  # Tile.layers field tag
    with open(os.path.join(gz, "metadata.json")) as fh:
        meta = json.load(fh)
    assert meta["format"] == "pbf"
    j = json.loads(meta["json"])
    assert j["vector_layers"][0]["id"] == "pages"
    assert j["vector_layers"][0]["fields"]["name"] == "String"
    assert j["field_types"]["pages"]["cnt"] == "Integer64"
    zdir = os.path.join(gz, "2")
    xd = os.path.join(zdir, sorted(os.listdir(zdir))[0])
    with open(os.path.join(xd, sorted(os.listdir(xd))[0]), "rb") as fh:
        assert fh.read(2) == b"\x1f\x8b"


def test_registry_dispatch(spark, tmp_path):
    from gdal_spark.sources.registry import (
        open_vector, sniff_vector_driver, write_vector,
    )

    df, _ = _pts_df(spark, n=15)
    out = str(tmp_path / "reg.mvt")
    write_vector(df, out, minzoom=2, maxzoom=2, buffer=0)
    assert sniff_vector_driver(out) == "MVT"
    back = open_vector(spark, out)
    assert back.count() == 15
    assert "geometry" in back.columns and "fid" in back.columns


def test_simplification_reduces_vertices(spark, tmp_path):
    t = np.linspace(0, 2 * np.pi, 400)
    ring = np.stack([10 + 5 * np.cos(t), 10 + 5 * np.sin(t)], 1)
    ring[-1] = ring[0]
    pdf = pd.DataFrame({"fid": np.array([1], dtype=np.int64),
                        "geometry": [W.polygon_wkb([ring])]})
    df = spark.createDataFrame(pdf)
    full = str(tmp_path / "full.mvt")
    write_mvt(df, full, minzoom=2, maxzoom=2, buffer=0)
    simp = str(tmp_path / "simp.mvt")
    write_mvt(df, simp, minzoom=2, maxzoom=2, buffer=0,
              simplification=8.0)
    n_full = len(W.parse_wkb(bytes(
        read_mvt(spark, full).toPandas().iloc[0].geometry)).parts[0])
    n_simp = len(W.parse_wkb(bytes(
        read_mvt(spark, simp).toPandas().iloc[0].geometry)).parts[0])
    assert n_simp < n_full


def test_bad_property_type_raises(spark, tmp_path):
    pdf = pd.DataFrame({"geometry": [W.point_wkb(0.0, 0.0)],
                        "arr": [bytearray(b"ab")]})
    df = spark.createDataFrame(pdf)
    with pytest.raises(ValueError, match="properties"):
        write_mvt(df, str(tmp_path / "bad.mvt"))


def test_single_tile_pbf_sniff_and_open(spark, tmp_path):
    """A standalone tile named *.pbf must be identified by CONTENT
    (no OSMHeader blob -> MVT, the reference's OGROSMDriverIdentify
    vs standalone-MVT-tile open path) and decode with z/x/y guessed
    from the trailing path components (ogrmvtdataset.cpp)."""
    import shutil

    from gdal_spark.sources.registry import (
        open_vector, sniff_vector_driver, write_vector,
    )

    df, _ = _pts_df(spark, n=15)
    out = str(tmp_path / "std.mvt")
    write_vector(df, out, minzoom=2, maxzoom=2, buffer=0)
    # lift one z/x/y.pbf file out of the directory dataset, keeping
    # the z/x/y path shape a tile server would expose
    src = None
    for root, _dirs, files in os.walk(os.path.join(out, "2")):
        for f in files:
            if f.endswith(".pbf"):
                src = os.path.join(root, f)
                break
        if src:
            break
    rel = os.path.relpath(src, out)
    single = tmp_path / "tiles" / rel
    single.parent.mkdir(parents=True)
    shutil.copy(src, single)

    assert sniff_vector_driver(str(single)) == "MVT"
    back = open_vector(spark, str(single))
    assert back.count() >= 1
    row = back.toPandas().iloc[0]
    assert int(row["zoom"]) == 2
    # geometry decodes to a real lon/lat point
    g = W.parse_wkb(bytes(row["geometry"]))
    x, y = g.parts[0][0]
    assert -180 <= x <= 180 and -90 <= y <= 90


def test_osm_pbf_still_sniffs_as_osm():
    from gdal_spark.sources.registry import sniff_vector_driver

    assert sniff_vector_driver(
        "/root/reference/autotest/ogr/data/osm/test.pbf") == "OSM"
