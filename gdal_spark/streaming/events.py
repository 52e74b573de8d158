"""Structured Streaming wrappers over the batch kernels.

The reference is batch-only (SURVEY §2.6): its closest constructs are
pull-iterator pipelines (apps/gdalalg_vector_pipeline.cpp:374-441) and
async raster reads.  This module gives the engine the streaming
surface GDAL lacks, reusing the *same* operators:

* ``stream_parquet_source`` — incremental page/event batches from a
  directory (the "streamed_dataset" analog,
  apps/gdalalg_abstract_pipeline.cpp:805)
* ``windowed_counts`` — event-time tumbling windows + watermark for
  late data
* ``spatial_join_stream`` — foreachBatch reuse of the two-stage
  spatial join; each micro-batch is checkpointed by the sink, so the
  stream resumes idempotently (same guarantee the lineage Pipeline
  gives batch stages).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.types import StructType


def stream_parquet_source(spark: SparkSession, path: str,
                          schema: StructType,
                          max_files_per_trigger: int = 8) -> DataFrame:
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(path)
    )


def windowed_counts(stream: DataFrame, ts_col: str = "ts",
                    window: str = "1 hour", watermark: str = "2 hours",
                    group_cols: list[str] | None = None) -> DataFrame:
    group_cols = group_cols or []
    # watermarks require TIMESTAMP (with tz); parquet NTZ cols cast up
    stream = stream.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("w"), *group_cols)
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("w_start"),
                F.col("w.end").alias("w_end"), *group_cols, "n")
    )


def spatial_join_stream(
    stream: DataFrame, polys_pdf: pd.DataFrame, out_path: str,
    checkpoint: str, res: int = 6, lon: str = "lon", lat: str = "lat",
    trigger_available_now: bool = True,
) -> StreamingQuery:
    """Run the two-stage spatial join per micro-batch, appending
    (input columns + fid) parquet under ``out_path``."""
    from gdal_spark.operators.spatial_join import (
        spatial_join_points_in_polygons,
    )

    def handle(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        joined = spatial_join_points_in_polygons(
            spark, batch, polys_pdf, res=res, lon=lon, lat=lat)
        joined.write.mode("append").parquet(out_path)

    writer = (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint)
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
