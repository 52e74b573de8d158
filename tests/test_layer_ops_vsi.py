"""vector update / combine verbs + the vsi filesystem surface."""

import numpy as np
import pandas as pd
import pytest

from gdal_spark.geometry.wkb import (
    linestring_wkb, parse_wkb, point_wkb, polygon_wkb,
)
from gdal_spark.operators.layer_ops import combine_features, update_layer


def _layer(spark, keys, vals):
    return spark.createDataFrame(pd.DataFrame({
        "fid": np.array(keys, dtype=np.int64),
        "v": np.array(vals, dtype=np.int64),
    }))


def test_update_replaces_and_appends(spark):
    existing = _layer(spark, [1, 2, 3, 4], [10, 20, 30, 40])
    incoming = _layer(spark, [2, 4, 9], [200, 400, 900])
    got = (update_layer(existing, incoming).orderBy("fid")
           .toPandas())
    assert got["fid"].tolist() == [1, 2, 3, 4, 9]
    assert got["v"].tolist() == [10, 200, 30, 400, 900]


def test_update_composite_key_and_validation(spark):
    existing = spark.createDataFrame(pd.DataFrame({
        "a": [1, 1, 2], "b": ["x", "y", "x"], "v": [1, 2, 3]}))
    incoming = spark.createDataFrame(pd.DataFrame({
        "a": [1], "b": ["y"], "v": [20]}))
    got = (update_layer(existing, incoming, key=["a", "b"])
           .orderBy("a", "b").toPandas())
    assert got["v"].tolist() == [1, 20, 3]
    with pytest.raises(ValueError, match="key field"):
        update_layer(existing, incoming, key="missing")


def test_combine_points_lines_polys(spark):
    ring = np.array([[0., 0.], [1., 0.], [1., 1.], [0., 0.]])
    pdf = pd.DataFrame({
        "grp": ["p", "p", "l", "g"],
        "geometry": [point_wkb(1.0, 2.0), point_wkb(3.0, 4.0),
                     linestring_wkb(np.array([[0., 0.], [1., 1.]])),
                     polygon_wkb([ring])],
    })
    got = (combine_features(spark.createDataFrame(pdf), "grp")
           .orderBy("grp").toPandas().set_index("grp"))
    mp = parse_wkb(bytes(got.loc["p", "geometry"]))
    assert mp.kind % 1000 == 4 and len(mp.parts) == 2
    ml = parse_wkb(bytes(got.loc["l", "geometry"]))
    assert ml.kind % 1000 == 5
    mg = parse_wkb(bytes(got.loc["g", "geometry"]))
    assert mg.kind % 1000 == 6
    assert int(got.loc["p", "n_features"]) == 2


def test_combine_mixed_types_raise(spark):
    pdf = pd.DataFrame({
        "grp": ["m", "m"],
        "geometry": [point_wkb(0.0, 0.0),
                     linestring_wkb(np.array([[0., 0.], [1., 1.]]))],
    })
    df = combine_features(spark.createDataFrame(pdf), "grp")
    with pytest.raises(Exception, match="mixed geometry"):
        df.collect()


def test_combine_multip_members_flatten(spark):
    """An already-multi member contributes its MEMBERS, not one
    nested blob."""
    from gdal_spark.geometry.wkb import multipoint_wkb

    pdf = pd.DataFrame({
        "grp": [1, 1],
        "geometry": [multipoint_wkb([(0.0, 0.0), (1.0, 1.0)]),
                     point_wkb(2.0, 2.0)],
    })
    got = combine_features(spark.createDataFrame(pdf), "grp") \
        .toPandas()
    g = parse_wkb(bytes(got.iloc[0]["geometry"]))
    assert len(g.parts) == 3


def test_vsi_surface(spark, tmp_path):
    from gdal_spark.sources.vsi import (
        vsi_copy, vsi_delete, vsi_list, vsi_move, vsi_sync,
    )

    src = tmp_path / "src"
    (src / "sub").mkdir(parents=True)
    (src / "a.txt").write_text("alpha")
    (src / "sub" / "b.txt").write_text("beta-longer")

    base = f"file:{src}"
    ls = vsi_list(spark, base)
    names = {e["name"].rsplit("/", 1)[-1]: e for e in ls}
    assert names["a.txt"]["size"] == 5
    assert names["sub"]["is_dir"]
    deep = vsi_list(spark, base, recursive=True)
    assert {e["name"].rsplit("/", 1)[-1] for e in deep} == \
        {"a.txt", "b.txt"}

    dst = f"file:{tmp_path}/dst"
    n = vsi_sync(spark, base, dst)
    assert n == 2
    assert vsi_sync(spark, base, dst) == 0    # idempotent
    (src / "a.txt").write_text("alpha-touched")
    assert vsi_sync(spark, base, dst) == 1    # size/mtime diff

    vsi_copy(spark, f"{dst}/a.txt", f"{dst}/a2.txt")
    vsi_move(spark, f"{dst}/a2.txt", f"{dst}/a3.txt")
    got = {e["name"].rsplit("/", 1)[-1]
           for e in vsi_list(spark, dst)}
    assert "a3.txt" in got and "a2.txt" not in got
    vsi_delete(spark, f"{dst}/a3.txt")
    with pytest.raises(FileNotFoundError):
        vsi_list(spark, f"{dst}/a3.txt")
    vsi_delete(spark, dst, recursive=True)


def test_pipeline_update_combine_tee_materialize(spark, tmp_path):
    from gdal_spark.plans.pipeline import run_vector_pipeline

    existing = _layer(spark, [1, 2, 3], [10, 20, 30])
    incoming = _layer(spark, [2, 7], [200, 700])
    got = run_vector_pipeline(
        spark, "read inc ! update base fid ! sort fid",
        {"base": existing, "inc": incoming}).toPandas()
    assert got["v"].tolist() == [10, 200, 30, 700]

    tee_path = str(tmp_path / "tee.parquet")
    out = run_vector_pipeline(
        spark,
        f"read inc ! materialize ! tee {tee_path} ! filter \"v > 300\"",
        {"inc": incoming})
    assert out.count() == 1
    assert spark.read.parquet(tee_path).count() == 2
