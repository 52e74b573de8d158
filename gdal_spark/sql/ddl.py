"""Dataset DDL surface over the Spark catalog.

The reference's dataset-management verbs (GDALDataset::Create /
Delete / Rename and the driver CreateLayer/DeleteLayer family,
gcore/gdaldataset.cpp:6984-7284) map onto catalog DDL in a
Spark-first engine: a raster/tile dataset IS a partitioned table,
creating a dataset is CREATE TABLE, deleting is DROP TABLE, renaming
is ALTER TABLE RENAME.

This module issues plain Spark SQL DDL against the session catalog
with ``USING parquet`` storage.  On a deployment with an Iceberg (or
Delta) catalog the SAME statements run with ``table_format=
"iceberg"`` — the sandbox ships no Iceberg runtime jars, so parquet
is the tested default and the iceberg path is format pass-through
(COVERAGE.md records the scope).  Partitioning follows the tile
sinks: zoom is the partition column, so partition pruning serves
z/x/y reads the way the reference's overview selection does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

# column spec shared with operators/tiling.py TILE_SCHEMA
_TILE_COLS = ("zoom INT, tile_x INT, tile_y INT, band INT, "
              "data BINARY, dtype STRING, tile_size INT")

_IDENT = __import__("re").compile(r"^[A-Za-z_][A-Za-z_0-9]*$")


def _check_ident(name: str) -> str:
    for part in name.split("."):
        if not _IDENT.match(part):
            raise ValueError(f"bad table identifier {name!r}")
    return name


def _loc_clause(location: str | None) -> str:
    if not location:
        return ""
    if any(ord(ch) < 0x20 for ch in location):
        raise ValueError("control characters in LOCATION path")
    # Spark SQL interprets BACKSLASH escapes inside string literals
    # (CLAUDE.md pitfall): a lone backslash would corrupt the path
    # and a trailing one would swallow the closing quote — escape
    # backslashes first, then double the quotes
    location = location.replace("\\", "\\\\").replace("'", "''")
    return f" LOCATION '{location}'"


def _check_format(table_format: str) -> str:
    if not _IDENT.match(table_format):
        raise ValueError(f"bad table format {table_format!r}")
    return table_format


def create_tile_table(spark: SparkSession, name: str,
                      location: str | None = None,
                      table_format: str = "parquet",
                      if_not_exists: bool = False) -> None:
    """CREATE TABLE for a z/x/y tile dataset, partitioned by zoom."""
    _check_ident(name)
    _check_format(table_format)
    ine = "IF NOT EXISTS " if if_not_exists else ""
    spark.sql(
        f"CREATE TABLE {ine}{name} ({_TILE_COLS}) "
        f"USING {table_format} PARTITIONED BY (zoom)"
        f"{_loc_clause(location)}")


def create_feature_table(spark: SparkSession, name: str,
                         columns: str,
                         partition_by: str | None = None,
                         location: str | None = None,
                         table_format: str = "parquet",
                         if_not_exists: bool = False) -> None:
    """CREATE TABLE for a vector layer (CreateLayer analog).

    ``columns`` is a SQL column spec, e.g.
    ``"fid BIGINT, geometry BINARY, name STRING"``.
    """
    _check_ident(name)
    _check_format(table_format)
    ine = "IF NOT EXISTS " if if_not_exists else ""
    part = f" PARTITIONED BY ({partition_by})" if partition_by else ""
    spark.sql(f"CREATE TABLE {ine}{name} ({columns}) "
              f"USING {table_format}{part}{_loc_clause(location)}")


def drop_table(spark: SparkSession, name: str,
               if_exists: bool = True) -> None:
    """DROP TABLE (GDALDriver::Delete analog)."""
    _check_ident(name)
    spark.sql(f"DROP TABLE {'IF EXISTS ' if if_exists else ''}{name}")


def rename_table(spark: SparkSession, old: str, new: str) -> None:
    """ALTER TABLE RENAME (GDALDriver::Rename analog)."""
    _check_ident(old)
    _check_ident(new)
    spark.sql(f"ALTER TABLE {old} RENAME TO {new}")


def add_column(spark: SparkSession, name: str, col: str,
               sql_type: str) -> None:
    """ALTER TABLE ADD COLUMNS (OGRLayer::CreateField analog)."""
    _check_ident(name)
    _check_ident(col)
    spark.sql(f"ALTER TABLE {name} ADD COLUMNS ({col} {sql_type})")


def insert_tiles(tiles: DataFrame, name: str,
                 mode: str = "append") -> None:
    """Insert a tile DataFrame into a created tile table.

    mode="overwrite" replaces ONLY the zoom partitions present in
    ``tiles`` (dynamic partition overwrite — forced here for the
    call's duration, because Spark's default static mode would
    truncate EVERY partition of the table)."""
    _check_ident(name)
    cols = ["tile_x", "tile_y", "band", "data", "dtype",
            "tile_size", "zoom"]  # partition col last for insertInto
    spark = tiles.sparkSession
    key = "spark.sql.sources.partitionOverwriteMode"
    prev = spark.conf.get(key, "static")
    try:
        spark.conf.set(key, "dynamic")
        tiles.select(*cols).write.insertInto(
            name, overwrite=(mode == "overwrite"))
    finally:
        spark.conf.set(key, prev)


def table_partitions(spark: SparkSession, name: str) -> list[str]:
    """SHOW PARTITIONS, as plain strings."""
    _check_ident(name)
    return [r[0] for r in spark.sql(f"SHOW PARTITIONS {name}")
            .collect()]
