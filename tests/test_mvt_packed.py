"""Packed MVT sink (no-properties fast path): the vectorized
point-feature encoder must be byte-identical to the _encode_layer
loop, and the packed pipeline must emit the same per-tile feature
sets as the legacy row pipeline on every shape (points, mixed
geometries, null fids, buffers, multi-zoom)."""

import glob
import os

import numpy as np
import pandas as pd
import pytest

import gdal_spark.sources.mvt as mvt
from gdal_spark.geometry import wkb as W
from gdal_spark.sources.mvt import (
    _NOFID, _decode_tile, _encode_layer, _point_feature_bytes,
    _uvarint, _uvarint_arr, _wrap_layer, write_mvt,
)


# ---------------------------------------------------------------- pure

def test_uvarint_arr_matches_scalar():
    rng = np.random.default_rng(7)
    vals = np.concatenate([
        rng.integers(0, 2 ** 63, 500, dtype=np.int64).astype(np.uint64),
        np.array([0, 1, 127, 128, 300, 2 ** 32, 2 ** 56 + 17,
                  2 ** 64 - 1], dtype=np.uint64)])
    buf, offs, lens = _uvarint_arr(vals)
    assert buf.tobytes() == b"".join(_uvarint(int(v)) for v in vals)
    assert int(offs[-1] + lens[-1]) == len(buf)


@pytest.mark.parametrize("with_fid", [True, False])
def test_point_feature_bytes_matches_encode_layer(with_fid):
    rng = np.random.default_rng(13)
    n = 700
    ix = rng.integers(-5000, 10000, n, dtype=np.int64)
    iy = rng.integers(-5000, 10000, n, dtype=np.int64)
    zzx = (ix << 1) ^ (ix >> 63)
    zzy = (iy << 1) ^ (iy >> 63)
    if with_fid:
        fids = rng.integers(0, 2 ** 62, n, dtype=np.int64)
        fids[::17] = _NOFID          # null fids omit field 1
    else:
        fids = None
    fbuf, foffs = _point_feature_bytes(fids, zzx, zzy)
    feats = [((None if fids is None or fids[i] == _NOFID
               else int(fids[i])), 1,
              (9, int(zzx[i]), int(zzy[i])), {}) for i in range(n)]
    assert _wrap_layer("layer0", 4096, fbuf.tobytes()) == \
        _encode_layer("layer0", 4096, feats)


# ------------------------------------------------------- differential

def _tiles_feats(root):
    out = {}
    for p in glob.glob(os.path.join(root, "*", "*", "*.pbf")):
        z, x, y = p.split(os.sep)[-3:]
        _name, _lext, feats = _decode_tile(open(p, "rb").read(), None)
        fs = set()
        for fid, gtype, parts, _props in feats:
            coords = tuple(tuple(map(tuple, pt.tolist()))
                           for pt in parts)
            fs.add((fid, gtype, coords))
        out[(int(z), int(x), int(y[:-4]))] = fs
    return out


def _check_both_paths(df, tmp_path, name, **kw):
    a = str(tmp_path / f"{name}_packed.mvt")
    b = str(tmp_path / f"{name}_legacy.mvt")
    assert mvt._PACKED_ENABLED
    sa = write_mvt(df, a, **kw)
    mvt._PACKED_ENABLED = False
    try:
        sb = write_mvt(df, b, **kw)
    finally:
        mvt._PACKED_ENABLED = True
    ta, tb = _tiles_feats(a), _tiles_feats(b)
    assert set(ta) == set(tb)
    for k in ta:
        assert ta[k] == tb[k], k
    assert sa["features"] == sb["features"]
    assert sa["tiles"] == sb["tiles"]


def _mixed_pdf(n=400):
    rng = np.random.default_rng(11)
    lon = rng.uniform(-179, 179, n)
    lat = rng.uniform(-84, 84, n)
    geoms = [W.point_wkb(float(a), float(b))
             for a, b in zip(lon, lat)]
    for _ in range(25):
        cx, cy = rng.uniform(-150, 150), rng.uniform(-70, 70)
        ring = np.array([[cx, cy], [cx + 3, cy], [cx + 3, cy + 2],
                         [cx, cy + 2], [cx, cy]])
        geoms.append(W.polygon_wkb([ring]))
    for _ in range(25):
        cx, cy = rng.uniform(-150, 150), rng.uniform(-70, 70)
        geoms.append(W.linestring_wkb(np.array(
            [[cx, cy], [cx + 5, cy + 3], [cx + 2, cy + 6]])))
    return pd.DataFrame({
        "fid": np.arange(1, len(geoms) + 1, dtype=np.int64),
        "geometry": geoms,
    })


def test_packed_points_multizoom_buffer(spark, tmp_path):
    pdf = _mixed_pdf().iloc[:400]          # points only
    df = spark.createDataFrame(pdf)
    _check_both_paths(df, tmp_path, "pts", minzoom=3, maxzoom=5,
                      buffer=64)


def test_packed_mixed_geoms(spark, tmp_path):
    df = spark.createDataFrame(_mixed_pdf())
    _check_both_paths(df, tmp_path, "mixed", minzoom=2, maxzoom=4,
                      buffer=80)


def test_packed_null_fids_and_nofid(spark, tmp_path):
    from pyspark.sql.types import (
        BinaryType, LongType, StructField, StructType,
    )

    pdf = _mixed_pdf().iloc[:300]
    fid = pdf["fid"].astype(object)
    fid[::13] = None
    pdf = pdf.assign(fid=fid)
    schema = StructType([StructField("fid", LongType(), True),
                         StructField("geometry", BinaryType())])
    df = spark.createDataFrame(pdf, schema=schema)
    _check_both_paths(df, tmp_path, "nullfid", minzoom=4, maxzoom=4,
                      buffer=16)
    _check_both_paths(df.select("geometry"), tmp_path, "nofid",
                      minzoom=4, maxzoom=4, buffer=0)


def test_packed_empty_and_null_geoms(spark, tmp_path):
    from pyspark.sql.types import (
        BinaryType, LongType, StructField, StructType,
    )

    from gdal_spark.sources.mvt import write_mvt

    schema = StructType([StructField("fid", LongType()),
                         StructField("geometry", BinaryType())])
    empty = spark.createDataFrame([], schema)
    stats = write_mvt(empty, str(tmp_path / "e.mvt"),
                      minzoom=3, maxzoom=3)
    assert stats == {"tiles": 0, "features": 0, "nbytes": 0}

    pdf = pd.DataFrame({
        "fid": np.arange(5, dtype=np.int64),
        "geometry": [W.point_wkb(1.0, 2.0), None,
                     W.point_wkb(3.0, 4.0), None,
                     W.point_wkb(5.0, 6.0)],
    })
    df = spark.createDataFrame(pdf, schema=schema)
    s2 = write_mvt(df, str(tmp_path / "n.mvt"), minzoom=2,
                   maxzoom=2, buffer=0)
    assert s2["features"] == 3 and s2["tiles"] == 1
