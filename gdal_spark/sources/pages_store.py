"""Cell-partitioned pages storage — the Iceberg-style spatial layout.

The reference's spatial indexes (GPKG R-tree, FlatGeobuf packed
Hilbert R-tree — ogr/ogrsf_frmts/flatgeobuf/packedrtree.cpp) exist so
a spatial filter touches only relevant pages of the file.  At 100 TB
the equivalent is TABLE LAYOUT: pages are written partitioned by a
coarse quadtree cell (Hive scheme; Iceberg partition transform in a
real catalog), with rows within each partition sorted by Hilbert code
for parquet row-group locality (the FlatGeobuf hilbertSort,
ogrflatgeobuflayer.cpp:610).

``read_pages_region`` pushes the cell list into the scan as a
partition filter — Spark prunes directories before reading a byte,
the distributed analog of the R-tree descent.  The plan is asserted
in tests (PartitionFilters must appear in the scan node).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession, functions as F

from gdal_spark.functions import geo
from gdal_spark.functions.hilbert import hilbert_col


def write_pages_partitioned(pages: DataFrame, path: str,
                            res: int = 4,
                            lon: str = "lon", lat: str = "lat",
                            mode: str = "overwrite") -> None:
    """Write pages partitioned by cell at ``res``, Hilbert-sorted
    within partitions."""
    df = pages.withColumn("cell", geo.cell_id(lon, lat, res))
    df = df.withColumn(
        "hilbert",
        hilbert_col(
            geo.merc_x(lon), geo.merc_y(lat),
            -geo.ORIGIN, -geo.ORIGIN, geo.ORIGIN, geo.ORIGIN,
        ),
    )
    (
        df.repartition("cell")
        .sortWithinPartitions("cell", "hilbert")
        .drop("hilbert")
        .write.partitionBy("cell").mode(mode).parquet(path)
    )


def cells_covering_bbox(minx: float, miny: float, maxx: float,
                        maxy: float, res: int) -> list[int]:
    """Cells intersecting a lon/lat bbox (same GetTileIndices math as
    the join prefilter)."""
    n = 1 << res
    span = geo.tile_span(res)

    def mx(lon):
        return lon * geo.ORIGIN / 180.0

    def my(lat):
        la = min(max(lat, -geo.MERC_LAT_MAX), geo.MERC_LAT_MAX)
        return float(np.log(np.tan((90.0 + la) * np.pi / 360.0))
                     / np.pi * geo.ORIGIN)

    tx0 = int(np.clip(np.floor((mx(minx) + geo.ORIGIN) / span + 1e-3),
                      0, n - 1))
    tx1 = int(np.clip(np.floor((mx(maxx) + geo.ORIGIN) / span + 1e-3),
                      0, n - 1))
    ty0 = int(np.clip(np.floor((geo.ORIGIN - my(maxy)) / span + 1e-3),
                      0, n - 1))
    ty1 = int(np.clip(np.floor((geo.ORIGIN - my(miny)) / span + 1e-3),
                      0, n - 1))
    return [tx * n + ty for tx in range(tx0, tx1 + 1)
            for ty in range(ty0, ty1 + 1)]


def read_pages_region(spark: SparkSession, path: str,
                      minx: float, miny: float, maxx: float, maxy: float,
                      res: int = 4) -> DataFrame:
    """Scan only the partitions whose cells intersect the bbox —
    partition pruning replaces the R-tree descent."""
    cells = cells_covering_bbox(minx, miny, maxx, maxy, res)
    return spark.read.parquet(path).filter(F.col("cell").isin(cells))
