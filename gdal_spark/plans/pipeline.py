"""gdal-style vector pipeline: ``read ... ! step ... ! write ...``.

Mirrors the reference's pipeline algorithm surface
(``gdal vector pipeline read ... ! filter ... ! reproject ... !
write ...``, apps/gdalalg_vector_pipeline.cpp) with the same
validation rules: exactly one read-like first step, one write-like
last step, composable middle steps
(apps/gdalalg_abstract_pipeline.cpp:87-160).

Steps:
  read <path>[.parquet]         — parquet scan
  filter "<ogr sql expr>"       — OGR SQL WHERE semantics
  select col[,col...]           — projection
  sql "<OGR SQL>"               — full statement; input layer = input
  reproject 4326->3857          — adds x/y mercator columns from
                                  lon/lat (or the inverse)
  sort col [asc|desc]           — ORDER BY
  limit N / offset N
  partition col                 — hive-partitioned write key
  write <path>                  — parquet sink

Each step is a DataFrame transformation; Catalyst fuses the chain
exactly as the reference streams features through decorated layers.
"""

from __future__ import annotations

import shlex

from pyspark.sql import DataFrame, SparkSession, functions as F

from gdal_spark.functions import geo


def run_vector_pipeline(spark: SparkSession, pipeline: str,
                        layers: dict[str, DataFrame] | None = None
                        ) -> DataFrame | None:
    steps = [s.strip() for s in pipeline.split("!")]
    if not steps or not steps[0].startswith("read"):
        raise ValueError("pipeline must start with a read step")
    writes = [i for i, s in enumerate(steps) if s.startswith("write")]
    if writes and writes != [len(steps) - 1]:
        raise ValueError("write must be the last step")
    for s in steps[1:-1]:
        if s.startswith("read"):
            raise ValueError("read must be the first step")

    df: DataFrame | None = None
    partition_col: str | None = None
    for step in steps:
        argv = shlex.split(step)
        verb, args = argv[0], argv[1:]
        if verb == "read":
            src = args[0]
            if layers and src in layers:
                df = layers[src]
            else:
                df = spark.read.parquet(src)
        elif verb == "filter":
            df = df.filter(_ogr_expr(args[0]))
        elif verb == "select":
            cols = [c.strip() for c in " ".join(args).split(",")]
            df = df.select(*cols)
        elif verb == "sql":
            from gdal_spark.sql.ogrsql import execute_ogr_sql

            df = execute_ogr_sql(spark, args[0], {"input": df})
        elif verb == "reproject":
            spec = args[0].replace(" ", "")
            if spec == "4326->3857":
                df = df.withColumn("x", geo.merc_x("lon")) \
                       .withColumn("y", geo.merc_y("lat"))
            elif spec == "3857->4326":
                df = df.withColumn("lon", geo.inv_merc_lon("x")) \
                       .withColumn("lat", geo.inv_merc_lat("y"))
            else:
                raise ValueError(f"unsupported reprojection {spec}")
        elif verb == "sort":
            col = args[0]
            desc = len(args) > 1 and args[1].lower() == "desc"
            df = df.orderBy(F.desc(col) if desc else F.asc(col))
        elif verb == "limit":
            df = df.limit(int(args[0]))
        elif verb == "offset":
            df = df.offset(int(args[0]))
        elif verb == "partition":
            partition_col = args[0]
        elif verb == "write":
            writer = df.write.mode("overwrite")
            if partition_col:
                writer = writer.partitionBy(partition_col)
            writer.parquet(args[0])
            return None
        else:
            raise ValueError(f"unknown pipeline step {verb}")
    return df


def _ogr_expr(expr: str):
    """OGR SQL expression -> Spark Column (shared expression parser)."""
    from gdal_spark.sql.ogrsql import _Parser, _tokenize

    parsed = _Parser(_tokenize(expr)).parse_expr()
    return F.expr(parsed)
