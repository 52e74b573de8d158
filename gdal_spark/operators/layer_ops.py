"""Layer-level relational verbs: update (keyed upsert) and combine
(features -> collections).

Reference: apps/gdalalg_vector_update.cpp — "Update an existing
vector dataset with an input vector dataset": features whose key
field(s) match an existing feature REPLACE it, new keys append
(key defaults to FID).  apps/gdalalg_vector_combine.cpp — "Combine
features into collections": group by field(s), members merge into
one MULTI geometry per group (this engine is homogeneous-WKB, so
mixed base types in one group raise — the reference emits a
GeometryCollection there, declared out in COVERAGE.md).

Spark shapes: update is ONE left-anti join on the key (existing
rows whose key is absent from the incoming layer survive) plus a
unionByName — a single hash shuffle, no driver materialization, the
scalable upsert plan.  combine is ONE groupBy with collect_list of
WKB blobs and an Arrow-batched assembly kernel; per-group memory is
bounded by the group's own geometry bytes (same contract as
dissolve).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from gdal_spark.geometry import wkb as W


def update_layer(existing: DataFrame, incoming: DataFrame,
                 key: list[str] | str = "fid") -> DataFrame:
    """gdal vector update: keyed upsert.  Rows of ``existing`` whose
    key matches a row of ``incoming`` are replaced; unmatched
    incoming rows append.  ``key`` defaults to the FID, like the
    reference (gdalalg_vector_update.cpp:154)."""
    keys = [key] if isinstance(key, str) else list(key)
    for k in keys:
        for df, side in ((existing, "existing"), (incoming, "input")):
            if k not in df.columns:
                raise ValueError(
                    f"update: key field {k!r} not in {side} layer")
    kept = existing.join(incoming.select(*keys).distinct(),
                         on=keys, how="left_anti")
    return kept.unionByName(incoming, allowMissingColumns=True)


def combine_features(df: DataFrame, group_by: list[str] | str,
                     geometry_col: str = "geometry") -> DataFrame:
    """gdal vector combine: one row per group, members merged into a
    MULTI geometry (points->multipoint, lines->multilinestring,
    polygons->multipolygon; already-multi members contribute their
    parts).  Mixed base types in one group raise."""
    keys = [group_by] if isinstance(group_by, str) else list(group_by)
    grouped = (df.groupBy(*keys)
               .agg(F.collect_list(geometry_col).alias("_geoms"),
                    F.count("*").alias("n_features")))

    out_fields = [f for f in grouped.schema.fields
                  if f.name != "_geoms"]
    from pyspark.sql.types import BinaryType, StructField, StructType
    schema = StructType(list(out_fields)
                        + [StructField(geometry_col, BinaryType())])

    def kernel(batches: Iterator[pd.DataFrame]
               ) -> Iterator[pd.DataFrame]:
        for b in batches:
            geoms = []
            for blobs in b["_geoms"]:
                parts: list[np.ndarray] = []
                offsets = [0]
                base = None
                for blob in blobs:
                    g = W.parse_wkb(bytes(blob))
                    k = g.kind % 1000
                    k = k - 3 if k in (4, 5, 6) else k
                    if base is None:
                        base = k
                    elif base != k:
                        raise ValueError(
                            "combine: mixed geometry types in one "
                            "group (GeometryCollection is out of "
                            "scope, COVERAGE.md)")
                    if k == 3 or (g.kind % 1000) in (4, 5, 6):
                        # polygons keep ring grouping; multis keep
                        # member grouping
                        po = g.part_offsets
                        for i in range(len(po) - 1):
                            parts.extend(g.parts[po[i]:po[i + 1]])
                            offsets.append(len(parts))
                    else:
                        parts.extend(g.parts)
                        offsets.append(len(parts))
                if base == 1:
                    geoms.append(W.multipoint_wkb(
                        [(float(p[0][0]), float(p[0][1]))
                         for p in parts]))
                elif base == 2:
                    geoms.append(W.multilinestring_wkb(parts))
                else:
                    geoms.append(W.multipolygon_wkb(
                        [parts[offsets[i]:offsets[i + 1]]
                         for i in range(len(offsets) - 1)]))
            out = b.drop(columns=["_geoms"])
            out[geometry_col] = geoms
            yield out

    return grouped.mapInPandas(kernel, schema)
