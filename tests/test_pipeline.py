"""Vector-pipeline read/write driver-registry dispatch."""


def test_pipeline_reads_and_writes_any_driver(spark, tmp_path):
    """`gdal vector pipeline read x.fgb ! ... ! write y.geojsonl`:
    the read/write steps dispatch through the driver registry."""
    import numpy as np
    import pandas as pd

    from gdal_spark.geometry.wkb import point_wkb
    from gdal_spark.plans.pipeline import run_vector_pipeline
    from gdal_spark.sources.registry import open_vector, write_vector

    pdf = pd.DataFrame({
        "fid": np.arange(1, 21, dtype=np.int64),
        "geometry": [point_wkb(float(i), float(i % 7))
                     for i in range(20)],
        "cat": np.arange(20, dtype=np.int64) % 3,
    })
    src = str(tmp_path / "src.fgb")
    write_vector(spark.createDataFrame(pdf), src, mode="single")
    dst = str(tmp_path / "out.geojsonl")
    run_vector_pipeline(
        spark, f"read {src} ! filter \"cat = 1\" ! write {dst}")
    back = open_vector(spark, dst)
    assert back.count() == len(pdf[pdf.cat == 1])


def _src_df(spark, n=12):
    import numpy as np
    import pandas as pd

    from gdal_spark.geometry.wkb import point_wkb

    pdf = pd.DataFrame({
        "fid": np.arange(1, n + 1, dtype=np.int64),
        "geometry": [point_wkb(float(i), float(i % 7))
                     for i in range(n)],
        "cat": np.arange(n, dtype=np.int64) % 3,
        "score": np.linspace(0.0, 1.0, n),
    })
    return spark.createDataFrame(pdf)


def test_set_field_type_by_name_and_by_type(spark):
    from gdal_spark.plans.pipeline import run_vector_pipeline

    df = _src_df(spark)
    out = run_vector_pipeline(
        spark, "read src ! set-field-type cat Real", {"src": df})
    assert dict(out.dtypes)["cat"] == "double"
    # by source type: every Real (double) field -> String
    out2 = run_vector_pipeline(
        spark, "read src ! set-field-type type:Real String",
        {"src": df})
    assert dict(out2.dtypes)["score"] == "string"
    assert dict(out2.dtypes)["cat"] == "bigint"  # untouched
    import pytest

    with pytest.raises(ValueError, match="no field"):
        run_vector_pipeline(
            spark, "read src ! set-field-type missing Real",
            {"src": df})


def test_rename_layer_reaches_writer(spark, tmp_path):
    import sqlite3

    from gdal_spark.plans.pipeline import run_vector_pipeline

    df = _src_df(spark)
    dst = str(tmp_path / "renamed.gpkg")
    run_vector_pipeline(
        spark, f"read src ! rename-layer pois ! write {dst}",
        {"src": df})
    # default gpkg mode writes one standalone part per partition;
    # the layer (table) name must reach every part
    import glob
    import os

    part = dst if os.path.isfile(dst) else \
        sorted(glob.glob(os.path.join(dst, "*.gpkg")))[0]
    con = sqlite3.connect(part)
    names = [r[0] for r in con.execute(
        "SELECT table_name FROM gpkg_contents")]
    con.close()
    assert names == ["pois"]


def test_edit_and_export_schema(spark):
    from gdal_spark.plans.pipeline import run_vector_pipeline

    df = _src_df(spark)
    out = run_vector_pipeline(
        spark,
        "read src ! edit crs=EPSG:3857 metadata source=unit-test",
        {"src": df})
    meta = out.schema["geometry"].metadata
    assert meta["crs"] == "EPSG:3857"
    assert meta["source"] == "unit-test"
    # unset-metadata removes a key
    out2 = run_vector_pipeline(
        spark, "read src ! edit unset-metadata source",
        {"src": out})
    assert "source" not in (out2.schema["geometry"].metadata or {})
    # export-schema is terminal: one row per field
    sch = run_vector_pipeline(
        spark, "read src ! export-schema", {"src": df}).toPandas()
    assert set(sch.columns) == {"name", "type", "nullable"}
    assert sch.set_index("name").loc["score", "type"] == "double"
    assert len(sch) == 4


def test_raster_unscale_and_edit(spark):
    import numpy as np

    from gdal_spark.operators.tiling import encode_tile
    from gdal_spark.plans.raster_pipeline import run_raster_pipeline

    import pandas as pd

    arrs = {(0, 0): np.arange(64, dtype=np.int32).reshape(8, 8),
            (1, 0): np.full((8, 8), 7, dtype=np.int32)}
    rows = []
    for (tx, ty), a in arrs.items():
        data, dt = encode_tile(a)
        rows.append({"zoom": 3, "tile_x": tx, "tile_y": ty,
                     "band": 1, "tile_size": 8, "dtype": dt,
                     "data": data})
    tiles = spark.createDataFrame(pd.DataFrame(rows))
    # edit stores scale/offset as band metadata; unscale applies and
    # clears them (value = raw*scale + offset, the reference law)
    out = run_raster_pipeline(
        spark, "read t ! edit scale=0.5 offset=10 ! unscale",
        {"t": tiles})
    assert "scale" not in (out.schema["data"].metadata or {})
    from gdal_spark.operators.tiling import decode_tile

    got = {(r["tile_x"], r["tile_y"]):
           decode_tile(r["data"], r["dtype"], 8)
           for r in out.collect()}
    assert np.allclose(got[(0, 0)],
                       np.arange(64).reshape(8, 8) * 0.5 + 10)
    assert np.allclose(got[(1, 0)], 7 * 0.5 + 10)


def test_dataset_identify_and_check(spark, tmp_path):
    from gdal_spark.sources.dataset_mgmt import (
        dataset_check, dataset_identify,
    )
    from gdal_spark.sources.registry import write_vector

    df = _src_df(spark)
    fgb = str(tmp_path / "a.fgb")
    write_vector(df, fgb, mode="single")
    (tmp_path / "noise.xyz").write_bytes(b"\x00\x01nota-dataset")

    ids = dataset_identify(str(tmp_path), recursive=True)
    by_name = {d["name"]: d["driver"] for d in ids}
    assert by_name[fgb] == "FlatGeobuf"
    assert by_name[str(tmp_path / "noise.xyz")] is None

    rep = dataset_check(spark, fgb)
    assert rep["driver"] == "FlatGeobuf"
    assert rep["n_features"] == 12 and rep["errors"] == []
    # a corrupt dataset reports an error instead of raising
    bad = tmp_path / "bad.fgb"
    bad.write_bytes(b"fgb\x03fgb\x00" + b"\x00" * 10)
    rep2 = dataset_check(spark, str(bad))
    assert rep2["errors"]


def test_raster_resize_verb(spark):
    """gdal raster resize: 2x downsample via the pipeline verb must
    equal the direct 2x2 block mean of the assembled raster."""
    import numpy as np
    import pandas as pd

    from gdal_spark.operators.tiling import decode_tile, encode_tile
    from gdal_spark.plans.raster_pipeline import run_raster_pipeline

    ts = 32
    rng = np.random.default_rng(11)
    arrs = {(tx, ty): rng.integers(0, 100, (ts, ts)).astype(np.float64)
            for tx in (0, 1) for ty in (0, 1)}
    rows = []
    for (tx, ty), a in arrs.items():
        data, dt = encode_tile(a)
        rows.append({"zoom": 0, "tile_x": tx, "tile_y": ty,
                     "band": 1, "tile_size": ts, "dtype": dt,
                     "data": data})
    tiles = spark.createDataFrame(pd.DataFrame(rows))
    out = run_raster_pipeline(
        spark, "read t ! resize 32 32 average", {"t": tiles})
    pdf = out.toPandas()
    got = np.zeros((32, 32))
    for _, r in pdf.iterrows():
        a = decode_tile(r["data"], r["dtype"], int(r["tile_size"]))
        x0 = int(r["tile_x"]) * int(r["tile_size"])
        y0 = int(r["tile_y"]) * int(r["tile_size"])
        got[y0:y0 + a.shape[0], x0:x0 + a.shape[1]] = a
    full = np.zeros((64, 64))
    for (tx, ty), a in arrs.items():
        full[ty * ts:(ty + 1) * ts, tx * ts:(tx + 1) * ts] = a
    want = full.reshape(32, 2, 32, 2).mean(axis=(1, 3))
    assert np.allclose(got, want)
