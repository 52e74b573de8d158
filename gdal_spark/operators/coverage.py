"""``gdal vector check-coverage`` — polygonal-coverage validity.

Reference: apps/gdalalg_vector_check_coverage.cpp, which calls
GEOS ``GEOSCoverageIsValid`` and emits one feature per input with
the invalid portion of its boundary.  A valid coverage requires
that every shared boundary is IDENTICAL in both polygons — same
vertices, opposite orientation; T-vertices, slivers, gaps and
overlaps all surface as boundary segments that fail to pair up.

Spark-first shape: the pairing rule is a pure groupBy —

  1. every polygon explodes into directed boundary edges (one
     Arrow kernel, no shuffle);
  2. edges key on their canonical endpoint pair (optionally snapped
     to a tolerance grid) and ONE hash shuffle counts, per key, how
     many times each direction appears;
  3. an edge is MATCHED when its key carries exactly one edge in
     each direction (the interior case).  Unmatched edges lying on
     the declared coverage extent frame are the legitimate outer
     boundary and are excluded when ``extent`` is given.

The result is a per-feature defect report: edge counts, unmatched
counts and unmatched length — nonzero means the feature
participates in a gap, overlap or vertex-mismatch.  maximum-gap-width
classification of the GEOS checker is declared out (it requires the
gap polygons themselves; the edge report localizes the same
defects).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    DoubleType, IntegerType, LongType, StructField, StructType,
)

_EDGE_SCHEMA = StructType([
    StructField("fid", LongType()),
    StructField("ax", DoubleType()),
    StructField("ay", DoubleType()),
    StructField("bx", DoubleType()),
    StructField("by", DoubleType()),
    StructField("fwd", IntegerType()),     # 1 canonical, 0 reversed
    StructField("length", DoubleType()),
])

REPORT_SCHEMA = ["fid", "n_edges", "n_unmatched", "unmatched_len"]


def _edges_frame(df: DataFrame, geometry_col: str, fid_col: str,
                 snap: float) -> DataFrame:
    def kernel(batches: Iterator[pd.DataFrame]
               ) -> Iterator[pd.DataFrame]:
        from gdal_spark.geometry.wkb import parse_wkb

        for b in batches:
            rows = {f.name: [] for f in _EDGE_SCHEMA.fields}
            for fid, wkb in zip(b[fid_col], b[geometry_col]):
                if wkb is None:
                    continue
                g = parse_wkb(bytes(wkb))
                for ring in g.parts:
                    r = np.asarray(ring, dtype=np.float64)
                    if len(r) < 2:
                        continue
                    if not np.array_equal(r[0], r[-1]):
                        r = np.vstack([r, r[:1]])
                    a, bpt = r[:-1], r[1:]
                    ln = np.hypot(bpt[:, 0] - a[:, 0],
                                  bpt[:, 1] - a[:, 1])
                    if snap > 0.0:
                        qa = np.round(a / snap) * snap
                        qb = np.round(bpt / snap) * snap
                    else:
                        qa, qb = a, bpt
                    # canonical key: lexicographically smaller
                    # endpoint first; fwd records the original
                    # direction relative to the key
                    swapmask = (qa[:, 0] > qb[:, 0]) | (
                        (qa[:, 0] == qb[:, 0])
                        & (qa[:, 1] > qb[:, 1]))
                    lo = np.where(swapmask[:, None], qb, qa)
                    hi = np.where(swapmask[:, None], qa, qb)
                    n = len(a)
                    rows["fid"].extend([int(fid)] * n)
                    rows["ax"].extend(lo[:, 0].tolist())
                    rows["ay"].extend(lo[:, 1].tolist())
                    rows["bx"].extend(hi[:, 0].tolist())
                    rows["by"].extend(hi[:, 1].tolist())
                    rows["fwd"].extend(
                        (~swapmask).astype(np.int32).tolist())
                    rows["length"].extend(ln.tolist())
            yield pd.DataFrame(rows)

    return df.mapInPandas(kernel, _EDGE_SCHEMA)


def check_coverage(df: DataFrame, *, geometry_col: str = "geometry",
                   fid_col: str = "fid", snap: float = 0.0,
                   extent: tuple[float, float, float, float] | None
                   = None) -> DataFrame:
    """Per-feature coverage-defect report: (fid, n_edges,
    n_unmatched, unmatched_len).  Zero unmatched everywhere ==
    valid coverage (given ``extent``, the declared outer frame)."""
    edges = _edges_frame(df, geometry_col, fid_col, snap)

    key = ["ax", "ay", "bx", "by"]
    # per canonical segment: how many edges in each direction
    counts = (edges.groupBy(*key)
              .agg(F.sum("fwd").alias("n_fwd"),
                   F.count("*").alias("n_all")))
    # matched interior edge: exactly one forward + one reverse
    matched = (F.col("n_all") == 2) & (F.col("n_fwd") == 1)
    joined = edges.join(F.broadcast(counts.filter(~matched))
                        .select(*key, F.lit(1).alias("bad")),
                        on=key, how="left")

    unmatched = F.coalesce(F.col("bad"), F.lit(0))
    if extent is not None:
        x0, y0, x1, y1 = (float(v) for v in extent)
        on_frame = (
            ((F.col("ax") == x0) & (F.col("bx") == x0))
            | ((F.col("ax") == x1) & (F.col("bx") == x1))
            | ((F.col("ay") == y0) & (F.col("by") == y0))
            | ((F.col("ay") == y1) & (F.col("by") == y1)))
        unmatched = F.when(on_frame, F.lit(0)).otherwise(unmatched)

    return (joined
            .withColumn("u", unmatched)
            .groupBy("fid")
            .agg(F.count("*").cast("long").alias("n_edges"),
                 F.sum("u").cast("long").alias("n_unmatched"),
                 F.sum(F.col("u") * F.col("length"))
                 .alias("unmatched_len")))
