"""GeoParquet writer/reader — spec `geo` file metadata + pruning.

The reference's Parquet driver (/root/reference/ogr/ogrsf_frmts/
parquet/) reads and writes the PUBLIC GeoParquet spec (geoparquet.
org, v1.1): standard parquet files whose footer carries a ``geo``
key-value entry — WKB encoding, per-file bbox, geometry types,
default CRS OGC:CRS84 (lon/lat, the engine convention).

Spark-first shape:
* ``write_geoparquet`` runs one mapInPandas kernel: each partition
  computes ITS OWN bbox + geometry-type set from the WKB column
  (vectorized for point layers) and writes one
  ``part-NNNNN.parquet`` through pyarrow with the ``geo`` footer —
  per-file bboxes are exactly what the spec intends for scan
  pruning, and no stats ever centralize on the driver.
* ``read_geoparquet`` loads the dataset with Spark's native
  parquet source; with ``bbox=`` it first reads ONLY FOOTERS
  driver-side (one small read per file) and hands Spark the
  surviving file list — a coarse prefilter exactly like the
  two-stage spatial-join convention; the exact predicate stays the
  caller's second stage.
* ``geoparquet_info`` -> the parsed ``geo`` metadata of a file or
  of every part in a dataset directory.

Columns other than geometry keep their Spark types (nullable ints
are rebuilt as int64-with-nulls — the pandas float64+NaN arrival
must not leak into the file schema).
"""

from __future__ import annotations

import glob as _glob
import json
import os
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

_GEO_VERSION = "1.1.0"

_KIND_NAMES = {1: "Point", 2: "LineString", 3: "Polygon",
               4: "MultiPoint", 5: "MultiLineString",
               6: "MultiPolygon"}

_SPARK_TO_PA = {
    "bigint": "int64", "int": "int32", "smallint": "int16",
    "double": "float64", "float": "float32", "boolean": "bool",
    "string": "string", "binary": "binary",
    "date": "date32", "timestamp": "timestamp[us]",
}


def _geom_stats(wkbs: list) -> tuple[list[float] | None, set]:
    """(bbox, geometry-type names) of a WKB list — vectorized for
    pure little-endian point batches."""
    from gdal_spark.geometry.wkb import parse_wkb

    vals = [bytes(v) for v in wkbs if v is not None]
    if not vals:
        return None, set()
    if all(len(v) == 21 and v[:5] == b"\x01\x01\x00\x00\x00"
           for v in vals):
        a = np.frombuffer(b"".join(vals),
                          dtype=[("hdr", "S5"), ("x", "<f8"),
                                 ("y", "<f8")])
        return [float(a["x"].min()), float(a["y"].min()),
                float(a["x"].max()), float(a["y"].max())], {"Point"}
    bbox = [np.inf, np.inf, -np.inf, -np.inf]
    kinds = set()
    for v in vals:
        g = parse_wkb(v)
        kinds.add(_KIND_NAMES.get(g.kind, "GeometryCollection"))
        b = g.bbox()
        bbox = [min(bbox[0], b[0]), min(bbox[1], b[1]),
                max(bbox[2], b[2]), max(bbox[3], b[3])]
    if not np.isfinite(bbox[0]):
        return None, kinds
    return [float(x) for x in bbox], kinds


def _geo_meta(geometry_col: str, bbox, kinds) -> bytes:
    col = {"encoding": "WKB",
           "geometry_types": sorted(kinds)}
    if bbox is not None:
        col["bbox"] = bbox
    return json.dumps({
        "version": _GEO_VERSION,
        "primary_column": geometry_col,
        "columns": {geometry_col: col},
    }).encode("utf-8")


def write_geoparquet(df: DataFrame, path: str, *,
                     geometry_col: str = "geometry") -> None:
    """Write a WKB DataFrame as a GeoParquet dataset: one
    part-NNNNN.parquet per partition, each with its own spec
    ``geo`` footer (per-file bbox + geometry types)."""
    if "://" in str(path):
        raise ValueError(
            "write_geoparquet needs a plain shared-filesystem path "
            f"(got {path!r}); the plain parquet sink handles URIs")
    if geometry_col not in df.columns:
        raise ValueError(f"no geometry column {geometry_col!r}")
    dt = dict(df.dtypes)
    bad = [c for c in df.columns if dt[c] not in _SPARK_TO_PA]
    if bad:
        raise ValueError(
            f"geoparquet: unsupported column types "
            f"{[(c, dt[c]) for c in bad]}")
    pa_types = {c: _SPARK_TO_PA[dt[c]] for c in df.columns}
    cols = list(df.columns)
    gcol = geometry_col

    import shutil

    shutil.rmtree(path, ignore_errors=True)
    os.makedirs(path, exist_ok=True)

    from pyspark.sql.types import (
        LongType, StringType, StructField, StructType,
    )
    out_schema = StructType([StructField("file", StringType()),
                             StructField("n", LongType())])

    def kernel(batches: Iterator[pd.DataFrame]
               ) -> Iterator[pd.DataFrame]:
        import pyarrow as pa
        import pyarrow.parquet as pq
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        chunks = [b for b in batches if len(b)]
        if not chunks:
            return
        pdf = pd.concat(chunks, ignore_index=True)
        arrays = []
        for c in cols:
            # rebuild from the DECLARED type: a nullable int column
            # arrives as float64+NaN and must not write as double
            arrays.append(pa.array(pdf[c],
                                   type=pa.type_for_alias(
                                       pa_types[c]),
                                   from_pandas=True))
        table = pa.Table.from_arrays(arrays, names=cols)
        bbox, kinds = _geom_stats(list(pdf[gcol]))
        table = table.replace_schema_metadata(
            {b"geo": _geo_meta(gcol, bbox, kinds)})
        out = os.path.join(path, f"part-{pid:05d}.parquet")
        pq.write_table(table, out)
        yield pd.DataFrame({"file": [out], "n": [len(pdf)]})

    df.mapInPandas(kernel, out_schema).collect()


def geoparquet_info(path: str) -> dict:
    """Parsed ``geo`` metadata: {file: meta} for a dataset
    directory, or the single file's meta."""
    import pyarrow.parquet as pq

    files = (sorted(_glob.glob(os.path.join(path, "*.parquet")))
             if os.path.isdir(path) else [path])
    out = {}
    for f in files:
        md = pq.read_schema(f).metadata or {}
        raw = md.get(b"geo")
        out[f] = json.loads(raw.decode("utf-8")) if raw else None
    return out if os.path.isdir(path) else out[path]


def read_geoparquet(spark: SparkSession, path: str, *,
                    bbox: tuple | None = None,
                    geometry_col: str = "geometry") -> DataFrame:
    """GeoParquet dataset -> DataFrame.

    ``bbox=(minx, miny, maxx, maxy)`` prunes FILES by their footer
    bbox before Spark plans the scan (footer-only driver reads) —
    a coarse prefilter; apply the exact predicate downstream, same
    two-stage convention as the spatial join."""
    if bbox is None:
        return spark.read.parquet(path)
    info = geoparquet_info(path)
    if not isinstance(info, dict) or not info:
        return spark.read.parquet(path)
    keep = []
    for f, meta in sorted(info.items()):
        if meta is None:
            keep.append(f)            # no geo footer: cannot prune
            continue
        col = meta["columns"].get(meta.get("primary_column",
                                           geometry_col), {})
        fb = col.get("bbox")
        if fb is None or not (fb[0] > bbox[2] or fb[2] < bbox[0]
                              or fb[1] > bbox[3] or fb[3] < bbox[1]):
            keep.append(f)
    if not keep:
        return spark.read.parquet(path).limit(0)
    return spark.read.parquet(*keep)
