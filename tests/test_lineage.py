"""Checkpointed pipeline: idempotent resume, fingerprint
invalidation, per-partition metrics."""

from pyspark.sql import functions as F

from gdal_spark.plans.lineage import Pipeline

def test_run_and_resume(spark, tmp_path):
    base = str(tmp_path / "ckpt")
    p = Pipeline(spark, base)
    p.stage("pts", lambda s, n, mult: _gen(s, n, mult),
            params={"n": 1000, "mult": 3})
    p.stage("agg", lambda s, d: _agg(d), deps=["pts"])
    outs = p.run()
    assert outs["agg"].count() == 97
    assert p.executed == ["pts", "agg"]

    # resume: nothing recomputed
    p2 = Pipeline(spark, base)
    p2.stage("pts", lambda s, n, mult: _gen(s, n, mult),
             params={"n": 1000, "mult": 3})
    p2.stage("agg", lambda s, d: _agg(d), deps=["pts"])
    outs2 = p2.run()
    assert p2.executed == []
    assert outs2["agg"].count() == 97

    # param change invalidates pts AND downstream agg
    p3 = Pipeline(spark, base)
    p3.stage("pts", lambda s, n, mult: _gen(s, n, mult),
             params={"n": 1000, "mult": 5})
    p3.stage("agg", lambda s, d: _agg(d), deps=["pts"])
    p3.run()
    assert p3.executed == ["pts", "agg"]


def _gen(spark, n, mult):
    return spark.range(0, n, 1, 4).withColumn(
        "v", (F.col("id") * mult) % 97)


def _agg(df):
    return df.groupBy("v").count()


def test_per_partition_metrics(spark, tmp_path):
    base = str(tmp_path / "ckpt2")
    p = Pipeline(spark, base)
    p.stage("pts", lambda s, n, mult: _gen(s, n, mult),
            params={"n": 800, "mult": 7})
    p.run()
    m = p.metrics("pts").toPandas()
    assert m["rows"].sum() == 800
    assert len(m) == 4  # one row per input partition
    assert (m["wall_ms"] >= 0).all()
    lin = p.lineage()
    assert set(lin["stage"]) == {"pts"}
    assert lin.iloc[0]["rows"] == 800


def test_partial_resume_after_corruption(spark, tmp_path):
    """Deleting a downstream stage's manifest forces only that stage
    to recompute."""
    import os
    import shutil

    base = str(tmp_path / "ckpt3")
    p = Pipeline(spark, base)
    p.stage("pts", lambda s, n, mult: _gen(s, n, mult),
            params={"n": 500, "mult": 3})
    p.stage("agg", lambda s, d: _agg(d), deps=["pts"])
    p.run()
    shutil.rmtree(os.path.join(base, "agg"))
    p2 = Pipeline(spark, base)
    p2.stage("pts", lambda s, n, mult: _gen(s, n, mult),
             params={"n": 500, "mult": 3})
    p2.stage("agg", lambda s, d: _agg(d), deps=["pts"])
    outs = p2.run()
    assert p2.executed == ["agg"]
    assert outs["agg"].count() == 97
