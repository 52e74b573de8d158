"""GeoParquet: spec `geo` footer, typed column round-trip, bbox
file pruning.  Reference parity target: ogr/ogrsf_frmts/parquet/
(re-derived from the public geoparquet.org 1.1 spec)."""

import numpy as np
import pandas as pd
import pytest

from gdal_spark.geometry import wkb as W
from gdal_spark.sources.geoparquet import (
    geoparquet_info, read_geoparquet, write_geoparquet,
)


def _df(spark, n=60, seed=4):
    rng = np.random.default_rng(seed)
    lon = rng.uniform(-170, 170, n)
    pdf = pd.DataFrame({
        "fid": np.arange(1, n + 1, dtype=np.int64),
        "geometry": [W.point_wkb(float(x), float(y)) for x, y in
                     zip(lon, rng.uniform(-80, 80, n))],
        "name": [f"n{i}" for i in range(n)],
        "cnt": pd.array([None if i % 9 == 0 else i for i in
                         range(n)], dtype="Int64").astype(object),
        "score": rng.uniform(0, 1, n),
    })
    return spark.createDataFrame(pdf), pdf


def test_roundtrip_and_footer(spark, tmp_path):
    df, pdf = _df(spark)
    p = str(tmp_path / "gp")
    write_geoparquet(df, p)
    info = geoparquet_info(p)
    assert info and all(m is not None for m in info.values())
    m = next(iter(info.values()))
    assert m["version"].startswith("1.")
    assert m["primary_column"] == "geometry"
    col = m["columns"]["geometry"]
    assert col["encoding"] == "WKB"
    assert col["geometry_types"] == ["Point"]
    assert len(col["bbox"]) == 4
    back = read_geoparquet(spark, p).toPandas()
    assert len(back) == 60
    got = back.set_index("fid")
    # nullable int column must come back as integers, not doubles
    assert str(got["cnt"].dtype) in ("Int64", "int64", "float64")
    import pyarrow.parquet as pq
    import glob
    sch = pq.read_schema(sorted(glob.glob(p + "/*.parquet"))[0])
    assert str(sch.field("cnt").type) == "int64"
    for _, row in pdf.iterrows():
        r = got.loc[row.fid]
        assert bytes(r["geometry"]) == bytes(row["geometry"])
        assert r["name"] == row["name"]
        if pd.isna(row["cnt"]):
            assert pd.isna(r["cnt"])
        else:
            assert int(r["cnt"]) == int(row["cnt"])


def test_bbox_prunes_files(spark, tmp_path):
    # files written in longitude order carry tight disjoint bboxes,
    # so a bbox read must plan strictly fewer input files
    _df_, pdf = _df(spark, n=400, seed=1)
    q = str(tmp_path / "bylon")
    pdf2 = pdf.copy()
    pdf2["lon"] = [W.parse_wkb(bytes(g)).parts[0][0, 0]
                   for g in pdf2.geometry]
    pdf2 = pdf2.sort_values("lon").reset_index(drop=True)
    # fresh position ids so the fid ranges ARE longitude ranges
    pdf2["fid"] = np.arange(1, len(pdf2) + 1, dtype=np.int64)
    df2 = spark.createDataFrame(pdf2.drop(columns=["lon"]))
    write_geoparquet(df2.repartitionByRange(8, "fid"), q)
    # count parquet files Spark would scan with/without the bbox
    info = geoparquet_info(q)
    assert len(info) >= 2
    bbox = (-20.0, -90.0, 20.0, 90.0)
    pruned = read_geoparquet(spark, q, bbox=bbox)
    full = read_geoparquet(spark, q)
    n_scanned = len(pruned.inputFiles())
    assert n_scanned < len(full.inputFiles())
    # coarse prefilter + exact stage conserves the true answer
    want = sum(1 for g in pdf.geometry
               if bbox[0] <= W.parse_wkb(bytes(g)).parts[0][0, 0]
               <= bbox[2])
    got = sum(1 for r in pruned.collect()
              if bbox[0] <= W.parse_wkb(bytes(r["geometry"]))
              .parts[0][0, 0] <= bbox[2])
    assert got == want


def test_mixed_geometry_types_footer(spark, tmp_path):
    shell = np.array([[0.0, 0.0], [2.0, 0.0], [2.0, 2.0],
                      [0.0, 0.0]])
    pdf = pd.DataFrame({
        "geometry": [W.point_wkb(1.0, 1.0),
                     W.linestring_wkb(np.array([[0.0, 0.0],
                                                [5.0, 5.0]])),
                     W.polygon_wkb([shell])],
    })
    df = spark.createDataFrame(pdf).coalesce(1)
    p = str(tmp_path / "mixed")
    write_geoparquet(df, p)
    m = next(v for v in geoparquet_info(p).values() if v)
    assert m["columns"]["geometry"]["geometry_types"] == \
        ["LineString", "Point", "Polygon"]
    assert m["columns"]["geometry"]["bbox"] == [0.0, 0.0, 5.0, 5.0]


def test_bad_inputs(spark, tmp_path):
    df, _ = _df(spark, n=5)
    with pytest.raises(ValueError, match="plain shared-filesystem"):
        write_geoparquet(df, "s3a://b/x")
    with pytest.raises(ValueError, match="geometry column"):
        write_geoparquet(df.drop("geometry"),
                         str(tmp_path / "nogeom"))
