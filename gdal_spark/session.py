"""SparkSession factory with scale-oriented defaults.

Defaults mirror the reference engine's tuning knobs where a Spark
equivalent exists:

* Arrow batch size 65536 == OGR's MAX_FEATURES_IN_BATCH default
  (ogr/ogrsf_frmts/generic/ogrlayerarrow.cpp:2079)
* AQE on (runtime re-planning, skew-join handling) — replaces GDAL's
  static chunking (alg/gdalwarpoperation.cpp:611 64MB chunks)
"""

from __future__ import annotations

import os
import zipfile

from pyspark.sql import SparkSession

_SHIPPED: set[int] = set()


def ship_package(spark: SparkSession) -> None:
    """Ship gdal_spark to executors (the local-mode equivalent of
    ``spark-submit --py-files gdal_spark.zip``).

    Idempotent per SparkContext; safe to call from every entry point
    so the engine works regardless of who built the session.
    """
    sc = spark.sparkContext
    key = id(sc)
    if key in _SHIPPED:
        return
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    root = os.path.dirname(pkg_dir)
    zip_path = os.path.join(
        os.environ.get("TMPDIR", "/tmp"), "gdal_spark_pyfiles.zip"
    )
    with zipfile.ZipFile(zip_path, "w") as zf:
        for dirpath, _dirnames, filenames in os.walk(pkg_dir):
            for fn in filenames:
                if fn.endswith(".py"):
                    full = os.path.join(dirpath, fn)
                    zf.write(full, os.path.relpath(full, root))
    sc.addPyFile(zip_path)
    _SHIPPED.add(key)


def spread_for_kernel(df):
    """Repartition a single-partition DataFrame to
    defaultParallelism.  CPU-bound python kernels (format encoders)
    otherwise serialize on a one-split scan — a single small parquet
    file reads as ONE partition regardless of row count.  Inputs
    with >1 partition are left alone: parts-mode writers emit one
    file per partition, so an explicit user repartition(N) keeps
    producing exactly N parts."""
    par = df.sparkSession.sparkContext.defaultParallelism
    if par > 1 and df.rdd.getNumPartitions() == 1:
        return df.repartition(par)
    return df


def get_spark(
    app_name: str = "gdal_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or int(cpus)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.python.worker.reuse", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    spark = builder.getOrCreate()
    ship_package(spark)
    return spark
