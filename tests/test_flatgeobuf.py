"""FlatGeobuf driver tests.

Golden strategy: the reference's own autotest fixtures decode with
the documented semantics (test_ogr_flatgeobuf_singlepart_mls_new.fgb
is the single-part MultiLineString special case — no ``ends``
vector, full-length part — and must read as
MULTILINESTRING ((0 0,1 1)), the value ogr_flatgeobuf.py asserts);
the packed Hilbert R-tree is checked structurally (level bounds ==
packedrtree.cpp generateLevelBounds; leaves stored last; features
in DESCENDING Hilbert order of bbox centers, the packedrtree.h
hilbertSort rule, same curve as the repo's bit-exact
hilbert_code_u16) and behaviorally (driver-side tree search ==
brute-force bbox scan on random data).  The writer is checked as
read(write(x)) == x through both the distributed parts layout and
the classic single-file layout, with byte-exact WKB geometry and
every property type.
"""

import os
import struct

import numpy as np
import pandas as pd
import pytest

from gdal_spark.geometry.wkb import (
    linestring_wkb, multipolygon_wkb, parse_wkb, point_wkb,
    polygon_wkb, to_wkt,
)
from gdal_spark.sources.flatgeobuf import (
    MAGIC, _Builder, _decode_geometry, _file_layout, _level_bounds,
    _root, _tree_search, build_header, parse_header,
    read_flatgeobuf, write_flatgeobuf,
)

DATA = "/root/reference/autotest/ogr/data/flatgeobuf"


# ------------------------------------------------ fixture corpus

def test_reference_singlepart_mls():
    p = os.path.join(DATA,
                     "test_ogr_flatgeobuf_singlepart_mls_new.fgb")
    hdr, idx_start, feat_start, fsize = _file_layout(p)
    assert hdr.geometry_type == 5           # MultiLineString
    with open(p, "rb") as fh:
        fh.seek(feat_start)
        raw = fh.read()
    sz = struct.unpack_from("<I", raw, 0)[0]
    ft = _root(raw[4:4 + sz])
    wkb = _decode_geometry(ft.table(4), hdr.geometry_type)
    assert to_wkt(parse_wkb(wkb), None) == \
        "MULTILINESTRING ((0.0 0.0,1.0 1.0))"


def test_reference_invalid_curve_rejected():
    # curve types are a declared out-of-scope boundary, not a crash
    p = os.path.join(
        DATA, "invalid_curvepolygon_linestring_three_points.fgb")
    hdr, _, feat_start, _ = _file_layout(p)
    with open(p, "rb") as fh:
        fh.seek(feat_start)
        raw = fh.read()
    sz = struct.unpack_from("<I", raw, 0)[0]
    ft = _root(raw[4:4 + sz])
    with pytest.raises(ValueError, match="out of scope"):
        _decode_geometry(ft.table(4), hdr.geometry_type)


# -------------------------------------------------- header codec

def test_header_roundtrip():
    h = build_header("lyr", [0.0, 1.0, 2.0, 3.0], 3,
                     [("a", 7), ("b", 11), ("c", 2)], 1234, 16,
                     crs_code=4326)
    hh = parse_header(h[4:])
    assert hh.name == "lyr"
    assert list(hh.envelope) == [0.0, 1.0, 2.0, 3.0]
    assert hh.geometry_type == 3
    assert hh.columns == [("a", 7), ("b", 11), ("c", 2)]
    assert hh.features_count == 1234
    assert hh.index_node_size == 16
    assert hh.crs_code == 4326
    # size prefix framing
    assert struct.unpack_from("<I", h, 0)[0] == len(h) - 4


def test_builder_alignment():
    # f64 vector payloads must land 8-aligned in the final buffer
    # (same convention as FinishSizePrefixed: prefix counted)
    b = _Builder(16)
    v = b.f64_vec(np.array([1.5, -2.5, 3.25]))
    t = b.table([(4, "o", v), (6, "<B", 7)])
    out = b.finish(t)
    root = _root(out[4:])
    got = root.vec(4, "<f8")
    assert list(got) == [1.5, -2.5, 3.25]
    assert root.scalar(6, "<B", 0) == 7
    assert (4 + out[4:].index(np.array([1.5]).tobytes())) % 8 == 0


# ---------------------------------------------------- packed tree

def test_level_bounds_matches_reference_formula():
    # packedrtree.cpp generateLevelBounds: leaf level first,
    # storage top-down with leaves last
    bounds, total = _level_bounds(179, 16)
    counts = [e - s for s, e in bounds]
    assert counts == [179, 12, 1]
    assert total == 192
    assert bounds[0] == (13, 192)           # leaves last
    assert bounds[-1] == (0, 1)             # root first
    # do-while: a single item still gets a root above it
    # (the reference's own 1-feature fixtures carry 2 nodes)
    b1, t1 = _level_bounds(1, 16)
    assert b1 == [(1, 2), (0, 1)] and t1 == 2


def test_tree_search_equals_bruteforce(spark, tmp_path):
    rng = np.random.default_rng(3)
    n = 700
    xy = rng.uniform(0, 100, (n, 2))
    pdf = pd.DataFrame({
        "geometry": [point_wkb(float(x), float(y)) for x, y in xy],
        "k": np.arange(n, dtype=np.int64)})
    from pyspark.sql.types import (
        BinaryType, LongType, StructField, StructType,
    )
    df = spark.createDataFrame(pdf, StructType(
        [StructField("geometry", BinaryType()),
         StructField("k", LongType())]))
    p = str(tmp_path / "pts.fgb")
    write_flatgeobuf(df, p, mode="single")
    hdr, idx_start, feat_start, fsize = _file_layout(p)
    assert hdr.features_count == n and hdr.index_node_size == 16

    for bbox in [(10, 10, 30, 30), (0, 0, 100, 100),
                 (99.5, 99.5, 99.9, 99.9), (200, 200, 300, 300)]:
        with open(p, "rb") as fh:
            hits = _tree_search(fh, idx_start, n, 16, bbox)
        got = len(hits)
        exp = int(np.sum((xy[:, 0] >= bbox[0]) & (xy[:, 0] <= bbox[2])
                         & (xy[:, 1] >= bbox[1])
                         & (xy[:, 1] <= bbox[3])))
        assert got == exp, bbox
        # hit offsets are sorted (leaf order == file order)
        offs = [o for _, o in hits]
        assert offs == sorted(offs)


def test_features_in_descending_hilbert_order(spark, tmp_path):
    from gdal_spark.functions.hilbert import hilbert_code_u16
    rng = np.random.default_rng(11)
    n = 257
    xy = rng.uniform(-50, 50, (n, 2))
    from pyspark.sql.types import (
        BinaryType, LongType, StructField, StructType,
    )
    df = spark.createDataFrame(
        pd.DataFrame({"geometry": [point_wkb(float(x), float(y))
                                   for x, y in xy],
                      "k": np.arange(n, dtype=np.int64)}),
        StructType([StructField("geometry", BinaryType()),
                    StructField("k", LongType())]))
    p = str(tmp_path / "h.fgb")
    write_flatgeobuf(df, p, mode="single")
    hdr, idx_start, feat_start, fsize = _file_layout(p)
    bounds, total = _level_bounds(n, 16)
    with open(p, "rb") as fh:
        fh.seek(idx_start + bounds[0][0] * 40)
        leaves = np.frombuffer(fh.read(n * 40),
                               dtype=[("minx", "<f8"),
                                      ("miny", "<f8"),
                                      ("maxx", "<f8"),
                                      ("maxy", "<f8"),
                                      ("off", "<u8")])
    ex = hdr.envelope
    w, h = ex[2] - ex[0], ex[3] - ex[1]
    cx = (leaves["minx"] + leaves["maxx"]) / 2
    cy = (leaves["miny"] + leaves["maxy"]) / 2
    gx = np.floor(65535 * (cx - ex[0]) / w).astype(np.uint32)
    gy = np.floor(65535 * (cy - ex[1]) / h).astype(np.uint32)
    hv = hilbert_code_u16(np.minimum(gx, 65535),
                          np.minimum(gy, 65535))
    assert np.all(np.diff(hv.astype(np.int64)) <= 0)
    assert np.all(np.diff(leaves["off"].astype(np.int64)) > 0)


# -------------------------------------------------- Spark surface

def _layer_df(spark, n=400, seed=5):
    rng = np.random.default_rng(seed)
    pdf = pd.DataFrame({
        "geometry": [point_wkb(float(x), float(y))
                     for x, y in rng.uniform(0, 10, (n, 2))],
        "k": np.arange(n, dtype=np.int64),
        "name": [f"f{i}" for i in range(n)],
        "score": rng.standard_normal(n),
        "flag": (np.arange(n) % 3 == 0),
    })
    from pyspark.sql.types import (
        BinaryType, BooleanType, DoubleType, LongType, StringType,
        StructField, StructType,
    )
    return spark.createDataFrame(pdf, StructType(
        [StructField("geometry", BinaryType()),
         StructField("k", LongType()),
         StructField("name", StringType()),
         StructField("score", DoubleType()),
         StructField("flag", BooleanType())])), pdf


def test_parts_roundtrip(spark, tmp_path):
    df, pdf = _layer_df(spark)
    out = str(tmp_path / "layer_parts")
    assert write_flatgeobuf(df.repartition(3), out,
                            crs_code=4326) is None
    files = sorted(os.listdir(out))
    assert len(files) == 3 and all(f.endswith(".fgb")
                                   for f in files)
    for f in files:                        # every part standalone
        hdr, *_ = _file_layout(os.path.join(out, f))
        assert hdr.crs_code == 4326 and hdr.index_node_size == 16
    back = read_flatgeobuf(spark, out)
    a = {r.k: (bytes(r.geometry), r["name"], round(r.score, 9),
               r.flag) for r in back.collect()}
    assert len(a) == len(pdf)
    for i, row in pdf.iterrows():
        g, nm, sc, fl = a[row.k]
        assert g == row.geometry and nm == row["name"]
        assert sc == round(row.score, 9) and fl == bool(row.flag)


def test_single_roundtrip_and_fid(spark, tmp_path):
    df, pdf = _layer_df(spark, n=300, seed=9)
    p = str(tmp_path / "layer.fgb")
    assert write_flatgeobuf(df, p, mode="single") == 300
    back = read_flatgeobuf(spark, p)
    rows = back.collect()
    assert sorted(r.fid for r in rows) == list(range(300))
    assert {r.k for r in rows} == set(range(300))
    # rereading yields identical fids (file order is defined)
    again = {r.k: r.fid for r in read_flatgeobuf(spark, p).collect()}
    assert all(again[r.k] == r.fid for r in rows)


def test_bbox_pushdown(spark, tmp_path):
    df, pdf = _layer_df(spark, n=600, seed=13)
    p = str(tmp_path / "layer.fgb")
    write_flatgeobuf(df, p, mode="single")
    bbox = (2.0, 2.0, 4.0, 4.0)
    got = {r.k for r in
           read_flatgeobuf(spark, p, bbox=bbox).collect()}
    xs = np.array([parse_wkb(g).parts[0][0] for g in pdf.geometry])
    exp = set(pdf.k[(xs[:, 0] >= 2) & (xs[:, 0] <= 4)
                    & (xs[:, 1] >= 2) & (xs[:, 1] <= 4)])
    assert got == exp and 0 < len(got) < 600


def test_column_pruning(spark, tmp_path):
    df, _ = _layer_df(spark, n=50)
    p = str(tmp_path / "l.fgb")
    write_flatgeobuf(df, p, mode="single")
    sel = read_flatgeobuf(spark, p, columns=["score"])
    assert sel.columns == ["fid", "geometry", "score"]
    assert sel.count() == 50


def test_mixed_geometries_and_null(spark, tmp_path):
    from pyspark.sql.types import (
        BinaryType, LongType, StructField, StructType,
    )
    sq = np.array([[0, 0], [4, 0], [4, 4], [0, 4], [0, 0]], float)
    hole = np.array([[1, 1], [2, 1], [2, 2], [1, 2], [1, 1]], float)
    tri = np.array([[0, 0], [1, 0], [1, 1], [0, 0]], float)
    shell2 = np.array([[5, 5], [6, 5], [6, 6], [5, 5]], float)
    hole2 = np.array([[5.2, 5.2], [5.4, 5.2], [5.3, 5.4],
                      [5.2, 5.2]], float)
    pdf = pd.DataFrame({
        "geometry": [polygon_wkb([sq, hole]),
                     multipolygon_wkb([[tri], [shell2, hole2]]),
                     linestring_wkb(np.array([[0, 0], [3, 4]],
                                             float)),
                     None],
        "id": np.array([1, 2, 3, 4], dtype=np.int64)})
    df = spark.createDataFrame(pdf, StructType(
        [StructField("geometry", BinaryType()),
         StructField("id", LongType())]))
    for mode in ("single", "parts"):
        p = str(tmp_path / f"m_{mode}.fgb")
        write_flatgeobuf(df.coalesce(1), p, mode=mode)
        back = {r.id: r.geometry
                for r in read_flatgeobuf(spark, p).collect()}
        for i in (1, 2, 3):
            assert bytes(back[i]) == bytes(pdf.geometry[i - 1]), \
                (mode, i)
        assert back[4] is None


def test_no_index_write_and_fallback_read(spark, tmp_path):
    df, pdf = _layer_df(spark, n=90, seed=21)
    p = str(tmp_path / "ni.fgb")
    write_flatgeobuf(df, p, mode="single", index=False)
    hdr, idx_start, feat_start, _ = _file_layout(p)
    assert hdr.index_node_size == 0 and feat_start == idx_start
    back = read_flatgeobuf(spark, p, rows_per_task=17)
    assert {r.k for r in back.collect()} == set(range(90))


def test_unsupported_column_type_rejected(spark):
    from pyspark.sql import functions as F
    df = spark.range(3).select(
        F.lit(b"").alias("geometry"),
        F.array(F.lit(1)).alias("bad"))
    with pytest.raises(ValueError, match="no ColumnType mapping"):
        write_flatgeobuf(df, "/tmp/never.fgb")


def test_object_store_paths_rejected(spark):
    with pytest.raises(ValueError, match="shared-filesystem"):
        read_flatgeobuf(spark, "s3a://bucket/x.fgb")


def test_magic_and_framing(spark, tmp_path):
    df, _ = _layer_df(spark, n=5)
    p = str(tmp_path / "m.fgb")
    write_flatgeobuf(df, p, mode="single")
    with open(p, "rb") as fh:
        assert fh.read(8) == MAGIC
    with pytest.raises(ValueError, match="not a FlatGeobuf"):
        bad = str(tmp_path / "bad.fgb")
        open(bad, "wb").write(b"NOPE1234")
        read_flatgeobuf(spark, bad)


def test_fid_column_preserved_not_duplicated(spark, tmp_path):
    """A written `fid` column comes back AS the fid (stored
    attribute wins over the positional one) — previously the read
    frame carried two `fid` columns and broke every downstream
    plan on AMBIGUOUS_REFERENCE."""
    import numpy as np
    import pandas as pd

    from gdal_spark.geometry.wkb import point_wkb

    pdf = pd.DataFrame({
        "fid": np.array([10, 20, 30], dtype=np.int64),
        "geometry": [point_wkb(float(i), float(i))
                     for i in range(3)],
    })
    df = spark.createDataFrame(pdf)
    p = str(tmp_path / "fidkeep.fgb")
    write_flatgeobuf(df, p, mode="single")
    back = read_flatgeobuf(spark, p)
    assert back.columns.count("fid") == 1
    assert sorted(r["fid"] for r in back.collect()) == [10, 20, 30]
