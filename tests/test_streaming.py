"""Structured Streaming wrappers: stream == batch parity, resume."""

import pandas as pd

from gdal_spark.operators.spatial_join import (
    spatial_join_points_in_polygons,
)
from gdal_spark.sources.pages import pages_df
from gdal_spark.sources.polygons import poly_fixture_pdf
from gdal_spark.streaming.events import (
    spatial_join_stream, stream_parquet_source, windowed_counts,
)


def test_stream_spatial_join_matches_batch(spark, tmp_path):
    src = str(tmp_path / "pages_in")
    out = str(tmp_path / "joined_out")
    ckpt = str(tmp_path / "ckpt")
    pts = pages_df(spark, 2000, partitions=4).select("i", "lon", "lat")
    pts.write.parquet(src)
    polys = poly_fixture_pdf()

    stream = stream_parquet_source(spark, src, pts.schema,
                                   max_files_per_trigger=2)
    q = spatial_join_stream(stream, polys, out, ckpt, res=6)
    q.awaitTermination(120)

    got = (
        spark.read.parquet(out).select("i", "fid").toPandas()
        .sort_values(["i", "fid"]).reset_index(drop=True)
    )
    want = (
        spatial_join_points_in_polygons(spark, pts, polys, res=6)
        .select("i", "fid").toPandas()
        .sort_values(["i", "fid"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)

    # resume: re-running with the same checkpoint adds nothing
    stream2 = stream_parquet_source(spark, src, pts.schema)
    q2 = spatial_join_stream(stream2, polys, out, ckpt, res=6)
    q2.awaitTermination(120)
    again = spark.read.parquet(out).count()
    assert again == len(want)


def test_windowed_counts_matches_batch(spark, tmp_path, sf_dir):
    from pyspark.sql import functions as F

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    src = str(tmp_path / "events_in")
    ev.write.parquet(src)
    stream = stream_parquet_source(spark, src, ev.schema)
    agg = windowed_counts(stream, "ts", "1 hour", "2 hours",
                          ["event_type"])
    out = str(tmp_path / "win_out")
    ckpt = str(tmp_path / "win_ckpt")
    q = (
        agg.writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .format("parquet").option("path", out).start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    want = (
        ev.groupBy(F.window("ts", "1 hour"), "event_type").count()
    )
    # append mode emits only windows closed by the watermark; every
    # emitted row must match the batch count for its window
    w = want.select(
        F.col("window.start").alias("w_start"),
        "event_type", F.col("count").alias("want_n"),
    )
    j = got.join(w, ["w_start", "event_type"], "left")
    assert j.filter("want_n IS NULL OR want_n <> n").count() == 0
    assert got.count() > 0
