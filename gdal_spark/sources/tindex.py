"""Tile-index builders — ``gdaltindex`` / ``gdal raster index`` and
``ogrtindex`` / ``gdal vector index``.

Reference: apps/gdaltindex_lib.cpp (one polygon feature per raster:
the extent footprint from the geotransform, a ``location`` path
field, min/max-pixel-size filters) and apps/ogrtindex.cpp /
apps/gdalalg_vector_index.cpp (same idea per vector dataset).

Spark-first shape: the index build reads HEADERS ONLY wherever the
format stores its extent up front —

- GeoTIFF: mmap IFD probe (sources/vrt.tiff_meta), no pixel I/O;
- Shapefile: the .shp 100-byte header's bbox words (spec bytes
  36..68);
- FlatGeobuf: the header table's envelope;
- GeoPackage: ``gpkg_contents`` min/max columns;
- GeoParquet: the parquet ``geo`` footer (per part file).

Paths fan out over executors (one task probes many files), so a
100 TB catalog indexes at listing speed.  Formats without a stored
extent (GeoJSON/CSV/GPX/KML/GML) fall back to ONE distributed scan:
every such file opens through the driver registry, tags rows with
its location, and a single groupBy(location) agg computes all
extents — never a per-file driver loop.

The output frame is the reference's index layer: ``location``,
extent ``geometry`` (WKB polygon) plus typed minx/miny/maxx/maxy
columns so Catalyst can prune index probes without parsing WKB.
"""

from __future__ import annotations

import os
import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    DoubleType, IntegerType, LongType, StringType, StructField,
    StructType,
)

RASTER_INDEX_SCHEMA = StructType([
    StructField("location", StringType()),
    StructField("minx", DoubleType()),
    StructField("miny", DoubleType()),
    StructField("maxx", DoubleType()),
    StructField("maxy", DoubleType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("bands", IntegerType()),
    StructField("epsg", IntegerType()),
    StructField("xres", DoubleType()),
    StructField("yres", DoubleType()),
])

VECTOR_INDEX_SCHEMA = StructType([
    StructField("location", StringType()),
    StructField("minx", DoubleType()),
    StructField("miny", DoubleType()),
    StructField("maxx", DoubleType()),
    StructField("maxy", DoubleType()),
    StructField("n_features", LongType()),
])


def _list_files(inputs, suffixes: tuple[str, ...],
                recursive: bool = True,
                filename_filter: str | None = None) -> list[str]:
    """Resolve files/directories to a file list (metadata only)."""
    import fnmatch

    if isinstance(inputs, (str, os.PathLike)):
        inputs = [inputs]
    out: list[str] = []
    for p in inputs:
        p = str(p)
        if os.path.isdir(p):
            if recursive:
                for root, _dirs, names in os.walk(p):
                    for n in sorted(names):
                        if n.lower().endswith(suffixes):
                            out.append(os.path.join(root, n))
            else:
                for n in sorted(os.listdir(p)):
                    if n.lower().endswith(suffixes):
                        out.append(os.path.join(p, n))
        else:
            out.append(p)
    if filename_filter:
        out = [f for f in out
               if fnmatch.fnmatch(os.path.basename(f),
                                  filename_filter)]
    return out


def _extent_polygon_wkb(minx, miny, maxx, maxy) -> bytes:
    from gdal_spark.geometry.wkb import polygon_wkb

    ring = [(minx, miny), (maxx, miny), (maxx, maxy), (minx, maxy),
            (minx, miny)]
    return polygon_wkb([ring])


def raster_index(spark: SparkSession, inputs, *,
                 recursive: bool = True,
                 filename_filter: str | None = None,
                 min_pixel_size: float | None = None,
                 max_pixel_size: float | None = None,
                 with_geometry: bool = False) -> DataFrame:
    """gdaltindex: one row per GeoTIFF with its georeferenced
    extent.  Headers probe distributed (tasks own path ranges);
    pixel-size filters apply as JVM predicates over the typed
    columns.  with_geometry adds the extent polygon WKB column."""
    files = _list_files(inputs, (".tif", ".tiff"), recursive,
                        filename_filter)
    if not files:
        return spark.createDataFrame([], RASTER_INDEX_SCHEMA)
    paths = spark.createDataFrame(
        pd.DataFrame({"location": files}))
    n_slices = min(len(files), 64)

    def probe(batches: Iterator[pd.DataFrame]
              ) -> Iterator[pd.DataFrame]:
        from gdal_spark.sources.vrt import tiff_meta

        for b in batches:
            rows = {f.name: [] for f in RASTER_INDEX_SCHEMA.fields}
            for loc in b["location"]:
                m = tiff_meta(loc)
                gt = m["geotransform"]
                if gt is None:
                    # ungeoreferenced: pixel-space extent, the
                    # reference's default identity transform
                    gt = (0.0, 1.0, 0.0, 0.0, 0.0, 1.0)
                w, h = m["width"], m["height"]
                xs = (gt[0], gt[0] + w * gt[1])
                ys = (gt[3], gt[3] + h * gt[5])
                rows["location"].append(loc)
                rows["minx"].append(min(xs))
                rows["miny"].append(min(ys))
                rows["maxx"].append(max(xs))
                rows["maxy"].append(max(ys))
                rows["width"].append(w)
                rows["height"].append(h)
                rows["bands"].append(m["bands"])
                rows["epsg"].append(m["epsg"])
                rows["xres"].append(abs(gt[1]))
                rows["yres"].append(abs(gt[5]))
            yield pd.DataFrame(rows)

    idx = paths.repartition(n_slices).mapInPandas(
        probe, RASTER_INDEX_SCHEMA)
    if min_pixel_size is not None:
        idx = idx.filter(
            (F.col("xres") >= F.lit(float(min_pixel_size)))
            & (F.col("yres") >= F.lit(float(min_pixel_size))))
    if max_pixel_size is not None:
        idx = idx.filter(
            (F.col("xres") <= F.lit(float(max_pixel_size)))
            & (F.col("yres") <= F.lit(float(max_pixel_size))))
    if with_geometry:
        idx = _add_geometry(idx)
    return idx


def _add_geometry(idx: DataFrame) -> DataFrame:
    from pyspark.sql.types import BinaryType

    out_schema = StructType(
        list(idx.schema.fields)
        + [StructField("geometry", BinaryType())])

    def kern(batches: Iterator[pd.DataFrame]
             ) -> Iterator[pd.DataFrame]:
        for b in batches:
            b = b.copy()
            b["geometry"] = [
                _extent_polygon_wkb(mnx, mny, mxx, mxy)
                for mnx, mny, mxx, mxy in zip(
                    b["minx"], b["miny"], b["maxx"], b["maxy"])]
            yield b

    return idx.mapInPandas(kern, out_schema)


# --------------------------------------------------- vector index

def _shp_header_bbox(path: str) -> tuple[float, float, float, float]:
    """Shapefile main-file header bbox (spec bytes 36..68)."""
    with open(path, "rb") as fh:
        hdr = fh.read(100)
    if len(hdr) < 100 or struct.unpack(">i", hdr[:4])[0] != 9994:
        raise ValueError(f"{path}: not a shapefile")
    minx, miny, maxx, maxy = struct.unpack("<4d", hdr[36:68])
    n = -1
    dbf = os.path.splitext(path)[0] + ".dbf"
    if os.path.exists(dbf):          # dBASE header word 4..8
        with open(dbf, "rb") as fh:
            dh = fh.read(8)
        if len(dh) == 8:
            n = struct.unpack("<I", dh[4:8])[0]
    return (minx, miny, maxx, maxy), n


def _fgb_header_bbox(path: str):
    from gdal_spark.sources.flatgeobuf import parse_header

    with open(path, "rb") as fh:
        magic = fh.read(8)
        if magic[:3] != b"fgb":
            raise ValueError(f"{path}: not a FlatGeobuf")
        (hdr_len,) = struct.unpack("<I", fh.read(4))
        hdr = parse_header(fh.read(hdr_len))
    env = hdr.envelope
    n = hdr.features_count
    if env is not None and len(env) >= 4:
        return (env[0], env[1], env[2], env[3]), n
    return None, n


def _gpkg_contents_bbox(path: str):
    import sqlite3

    con = sqlite3.connect(path)
    try:
        rows = con.execute(
            "SELECT min_x, min_y, max_x, max_y FROM gpkg_contents "
            "WHERE data_type = 'features'").fetchall()
    finally:
        con.close()
    boxes = [r for r in rows if all(v is not None for v in r)]
    if not boxes:
        return None
    return (min(r[0] for r in boxes), min(r[1] for r in boxes),
            max(r[2] for r in boxes), max(r[3] for r in boxes))


def _geoparquet_footer_bbox(path: str):
    import json

    import pyarrow.parquet as pq

    md = pq.read_metadata(path).metadata or {}
    geo = md.get(b"geo")
    if geo is None:
        return None, None
    meta = json.loads(geo)
    col = meta.get("primary_column")
    cmeta = meta.get("columns", {}).get(col, {})
    bbox = cmeta.get("bbox")
    n = pq.read_metadata(path).num_rows
    if bbox and len(bbox) >= 4:
        return tuple(float(v) for v in bbox[:4]), int(n)
    return None, int(n)


_HEADER_SUFFIXES = (".shp", ".fgb", ".gpkg", ".parquet")
_SCAN_SUFFIXES = (".geojson", ".geojsonl", ".json", ".csv", ".gpx",
                  ".kml", ".gml")


def vector_index(spark: SparkSession, inputs, *,
                 recursive: bool = True,
                 filename_filter: str | None = None,
                 with_geometry: bool = False) -> DataFrame:
    """ogrtindex: one row per vector dataset with its extent.
    Header-only for shp/fgb/gpkg/geoparquet; other formats merge
    into ONE distributed scan-and-agg pass."""
    files = _list_files(inputs, _HEADER_SUFFIXES + _SCAN_SUFFIXES,
                        recursive, filename_filter)
    header_files = [f for f in files
                    if f.lower().endswith(_HEADER_SUFFIXES)]
    scan_files = [f for f in files
                  if not f.lower().endswith(_HEADER_SUFFIXES)]

    parts: list[DataFrame] = []
    if header_files:
        paths = spark.createDataFrame(
            pd.DataFrame({"location": header_files}))

        def probe(batches: Iterator[pd.DataFrame]
                  ) -> Iterator[pd.DataFrame]:
            for b in batches:
                rows = {f.name: []
                        for f in VECTOR_INDEX_SCHEMA.fields}
                for loc in b["location"]:
                    low = loc.lower()
                    n = -1
                    if low.endswith(".shp"):
                        box, n = _shp_header_bbox(loc)
                    elif low.endswith(".fgb"):
                        box, n = _fgb_header_bbox(loc)
                    elif low.endswith(".gpkg"):
                        box = _gpkg_contents_bbox(loc)
                    else:
                        box, n = _geoparquet_footer_bbox(loc)
                    if box is None:
                        continue
                    rows["location"].append(loc)
                    rows["minx"].append(float(box[0]))
                    rows["miny"].append(float(box[1]))
                    rows["maxx"].append(float(box[2]))
                    rows["maxy"].append(float(box[3]))
                    rows["n_features"].append(int(n))
                yield pd.DataFrame(rows)

        parts.append(
            paths.repartition(min(len(header_files), 64))
            .mapInPandas(probe, VECTOR_INDEX_SCHEMA))

    if scan_files:
        from gdal_spark.geometry.wkb import parse_wkb
        from gdal_spark.sources.registry import open_vector

        tagged = None
        for f in scan_files:
            df = open_vector(spark, f).select(
                F.lit(f).alias("location"), "geometry")
            tagged = df if tagged is None else tagged.unionByName(df)

        box_schema = StructType([
            StructField("location", StringType()),
            StructField("minx", DoubleType()),
            StructField("miny", DoubleType()),
            StructField("maxx", DoubleType()),
            StructField("maxy", DoubleType()),
            StructField("n", LongType()),
        ])

        def boxes(batches: Iterator[pd.DataFrame]
                  ) -> Iterator[pd.DataFrame]:
            for b in batches:
                agg: dict = {}
                for loc, g in zip(b["location"], b["geometry"]):
                    if g is None:
                        box = (np.inf, np.inf, -np.inf, -np.inf)
                    else:
                        gm = parse_wkb(bytes(g))
                        xs = np.concatenate(
                            [p[:, 0] for p in gm.parts])
                        ys = np.concatenate(
                            [p[:, 1] for p in gm.parts])
                        box = (xs.min(), ys.min(),
                               xs.max(), ys.max())
                    cur = agg.get(loc)
                    if cur is None:
                        agg[loc] = [box[0], box[1], box[2],
                                    box[3], 1]
                    else:
                        cur[0] = min(cur[0], box[0])
                        cur[1] = min(cur[1], box[1])
                        cur[2] = max(cur[2], box[2])
                        cur[3] = max(cur[3], box[3])
                        cur[4] += 1
                yield pd.DataFrame({
                    "location": list(agg.keys()),
                    "minx": [v[0] for v in agg.values()],
                    "miny": [v[1] for v in agg.values()],
                    "maxx": [v[2] for v in agg.values()],
                    "maxy": [v[3] for v in agg.values()],
                    "n": [v[4] for v in agg.values()],
                })

        scanned = (tagged.mapInPandas(boxes, box_schema)
                   .groupBy("location")
                   .agg(F.min("minx").alias("minx"),
                        F.min("miny").alias("miny"),
                        F.max("maxx").alias("maxx"),
                        F.max("maxy").alias("maxy"),
                        F.sum("n").alias("n_features")))
        parts.append(scanned.select(
            *[f.name for f in VECTOR_INDEX_SCHEMA.fields]))

    if not parts:
        return spark.createDataFrame([], VECTOR_INDEX_SCHEMA)
    idx = parts[0]
    for p in parts[1:]:
        idx = idx.unionByName(p)
    if with_geometry:
        idx = _add_geometry(idx)
    return idx
