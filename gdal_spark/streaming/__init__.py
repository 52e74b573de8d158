from gdal_spark.streaming.events import (  # noqa: F401
    spatial_join_stream, stream_parquet_source, windowed_counts,
)
