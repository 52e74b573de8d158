"""Unified open + info surface: the ``ogr.Open()`` / ``gdalinfo``
/ ``ogrinfo`` analogs.

The reference opens any vector dataset through one entry point
(``GDALOpenEx`` / ``ogr.Open``, gcore/gdaldataset.cpp) by probing
registered drivers, and ships ``ogrinfo`` / ``gdalinfo``
(apps/ogrinfo_lib.cpp, apps/gdalinfo_lib.cpp) as the universal
metadata tools.  This module re-creates that:

* ``open_vector(spark, path)`` sniffs the format (extension first,
  magic bytes for extensionless files) and dispatches to the
  matching driver — every driver returns the same
  ``DataFrame(fid long, geometry WKB binary, fields...)`` shape,
  so downstream operators compose regardless of source format.
* ``vector_info(spark, path)`` -> dict like ogrinfo -json:
  driver, feature count, extent, geometry types, field schema.
  Count/extent compute DISTRIBUTED in one Spark agg over the
  opened frame (the reference scans sequentially; same numbers).
* ``raster_info(path)`` -> dict like gdalinfo -json for a GeoTIFF
  or a z/x/y tile pyramid directory: driver, size, bands, dtype,
  geotransform, CRS — header-only probes, no pixel I/O.
"""

from __future__ import annotations

import glob as _glob
import os

_VECTOR_EXT = {
    ".shp": "ESRI Shapefile",
    ".geojson": "GeoJSON",
    ".topojson": "TopoJSON",
    ".json": "GeoJSON",
    ".geojsonl": "GeoJSONSeq",
    ".ndjson": "GeoJSONSeq",
    ".csv": "CSV",
    ".tsv": "CSV",
    ".fgb": "FlatGeobuf",
    ".gpkg": "GPKG",
    ".gpx": "GPX",
    ".kml": "KML",
    ".gml": "GML",
    ".parquet": "Parquet",
    ".mvt": "MVT",
    ".mbtiles": "MBTiles",
    # NOTE: ".pbf" is deliberately absent — it is ambiguous between
    # OSM PBF and a single Mapbox vector tile, so it is identified
    # by CONTENT (first BlobHeader type == "OSMHeader"), mirroring
    # the reference's OGROSMDriverIdentify (ogr/ogrsf_frmts/osm).
    ".osm": "OSM",
}


def _sniff_pbf(head: bytes) -> str:
    """Disambiguate *.pbf by content: an OSM PBF starts with a
    4-byte big-endian BlobHeader length followed by a BlobHeader
    protobuf whose type field (tag 1, string) is "OSMHeader"
    (reference: ogrosmdriver.cpp OGROSMDriverIdentify reads the
    first blob header).  Anything else is treated as a single
    Mapbox vector tile (raw or gzipped Tile message)."""
    if len(head) >= 4:
        hlen = int.from_bytes(head[:4], "big")
        if 0 < hlen <= 64 * 1024 and b"OSMHeader" in head[4:4 + hlen]:
            return "OSM"
    return "MVT"

_MAGIC = [
    (b"fgb\x03fgb\x00", "FlatGeobuf"),
    (b"SQLite format 3\x00", "GPKG"),
    (b"PAR1", "Parquet"),
    (b"\x00\x00\x27\x0a", "ESRI Shapefile"),     # .shp big-endian 9994
]


def sniff_vector_driver(path: str) -> str:
    """Driver short-name for a path (the reference's driver-probe
    loop, GDALOpenEx): extension first, then magic bytes, then
    content sniff for XML/JSON text formats."""
    if os.path.isdir(path):
        if os.path.exists(os.path.join(path, "metadata.json")):
            # MVT directory dataset (the reference's MVT driver
            # identifies on metadata.json too, ogrmvtdataset.cpp)
            return "MVT"
        for ext, drv in _VECTOR_EXT.items():
            if _glob.glob(os.path.join(path, f"part-*{ext}")):
                return drv
        if _glob.glob(os.path.join(path, "*.parquet")) or \
                _glob.glob(os.path.join(path, "part-*.snappy.parquet")):
            return "Parquet"
        raise ValueError(f"{path}: no recognizable part files")
    ext = os.path.splitext(path)[1].lower()
    if ext == ".pbf":
        with open(path, "rb") as fh:
            return _sniff_pbf(fh.read(64 * 1024 + 4))
    if ext in _VECTOR_EXT:
        return _VECTOR_EXT[ext]
    with open(path, "rb") as fh:
        head = fh.read(256)
    for magic, drv in _MAGIC:
        if head.startswith(magic):
            if drv == "GPKG" and head[68:72] != b"GPKG":
                # SQLite but no GeoPackage application_id (offset
                # 68, spec Req 2): the other sqlite container we
                # read is MBTiles (identified by its metadata
                # table, mbtilesdataset.cpp's Identify)
                return "MBTiles"
            return drv
    s = head.lstrip()
    if s.startswith(b"<?xml") or s.startswith(b"<"):
        if b"<gpx" in head or b"topografix" in head:
            return "GPX"
        if b"<kml" in head or b"Placemark" in head:
            return "KML"
        if b"FeatureCollection" in head or b"featureMember" in head \
                or b"opengis.net/gml" in head:
            return "GML"
    if s.startswith(b"{") or s.startswith(b"["):
        # a Topology document is TopoJSON, not a FeatureCollection
        # (the reference's GeoJSON driver family sniffs the same key)
        if b'"Topology"' in head:
            return "TopoJSON"
        return "GeoJSON"
    raise ValueError(f"{path}: no driver recognizes this dataset "
                     "(the reference returns NULL from ogr.Open "
                     "here; this engine raises)")


def open_vector(spark, path: str, driver: str | None = None,
                **opts):
    """ogr.Open analog: sniff (or take) the driver and return the
    uniform DataFrame(fid, geometry WKB, fields...) frame.  Extra
    ``opts`` pass through to the driver reader (e.g. ``bbox=`` for
    FlatGeobuf/GPKG, ``layer=`` for GPX)."""
    drv = driver or sniff_vector_driver(path)
    if drv == "ESRI Shapefile":
        from functools import reduce

        from gdal_spark.sources.shapefile import read_shapefile
        if os.path.isdir(path):
            # parts layout: one trio per partition; union the
            # per-part plans (each stays split by its own .shx)
            parts = sorted(_glob.glob(os.path.join(path,
                                                   "part-*.shp")))
            return reduce(lambda a, b: a.unionByName(b),
                          (read_shapefile(spark, p, **opts)
                           for p in parts))
        return read_shapefile(spark, path, **opts)
    if drv in ("GeoJSON", "GeoJSONSeq"):
        from gdal_spark.sources.geojson import read_geojson
        return read_geojson(spark, path, **opts)
    if drv == "TopoJSON":
        from gdal_spark.sources.topojson import read_topojson
        return read_topojson(spark, path, **opts)
    if drv == "CSV":
        from gdal_spark.sources.csvfile import read_csv_layer
        return read_csv_layer(spark, path, **opts)
    if drv == "FlatGeobuf":
        from gdal_spark.sources.flatgeobuf import read_flatgeobuf
        return read_flatgeobuf(spark, path, **opts)
    if drv == "GPKG":
        from gdal_spark.sources.geopackage import read_gpkg
        return read_gpkg(spark, path, **opts)
    if drv == "GPX":
        from gdal_spark.sources.xmlgeo import read_gpx
        return read_gpx(spark, path, **opts)
    if drv == "KML":
        from gdal_spark.sources.xmlgeo import read_kml
        return read_kml(spark, path, **opts)
    if drv == "GML":
        from gdal_spark.sources.gml import read_gml
        return read_gml(spark, path, **opts)
    if drv == "MVT":
        from gdal_spark.sources.mvt import read_mvt
        return read_mvt(spark, path, **opts)
    if drv == "OSM":
        from gdal_spark.sources.osm import read_osm
        return read_osm(spark, path, **opts)
    if drv == "MBTiles":
        from gdal_spark.sources.mbtiles import read_mbtiles
        return read_mbtiles(spark, path, **opts)
    if drv == "Parquet":
        # GeoParquet-aware: a plain read unless bbox= asks for the
        # footer-pruned scan (files without geo footers pass through)
        from gdal_spark.sources.geoparquet import read_geoparquet
        return read_geoparquet(spark, path, **opts)
    raise ValueError(f"unknown driver {drv!r}")


def write_vector(df, path: str, driver: str | None = None,
                 **opts):
    """Writer dispatch (the other half of ogr2ogr): the driver
    comes from the explicit argument or the output extension.
    Passes ``opts`` through (``mode="single"``, ``layer=`` for
    GPX, ...)."""
    drv = driver
    if drv is None:
        ext = os.path.splitext(path)[1].lower()
        drv = _VECTOR_EXT.get(ext)
        if drv is None:
            raise ValueError(
                f"{path}: give driver= or use a known extension "
                f"({sorted(_VECTOR_EXT)})")
    if drv == "ESRI Shapefile":
        from gdal_spark.sources.shapefile import write_shapefile
        return write_shapefile(df, path, **opts)
    if drv in ("GeoJSON", "GeoJSONSeq"):
        from gdal_spark.sources.geojson import write_geojson
        return write_geojson(df, path, **opts)
    if drv == "CSV":
        from gdal_spark.sources.csvfile import write_csv_layer
        return write_csv_layer(df, path, **opts)
    if drv == "FlatGeobuf":
        from gdal_spark.sources.flatgeobuf import write_flatgeobuf
        return write_flatgeobuf(df, path, **opts)
    if drv == "GPKG":
        from gdal_spark.sources.geopackage import write_gpkg
        if "layer" in opts:  # uniform layer= -> gpkg table name
            opts["table"] = opts.pop("layer")
        return write_gpkg(df, path, **opts)
    if drv == "GPX":
        from gdal_spark.sources.xmlgeo import write_gpx
        return write_gpx(df, path, **opts)
    if drv == "KML":
        from gdal_spark.sources.xmlgeo import write_kml
        return write_kml(df, path, **opts)
    if drv == "GML":
        from gdal_spark.sources.gml import write_gml
        return write_gml(df, path, **opts)
    if drv == "MVT":
        from gdal_spark.sources.mvt import write_mvt
        return write_mvt(df, path, **opts)
    if drv == "MBTiles":
        from gdal_spark.sources.mbtiles import write_mbtiles_vector
        return write_mbtiles_vector(df, path, **opts)
    if drv == "GeoParquet":
        from gdal_spark.sources.geoparquet import write_geoparquet
        return write_geoparquet(df, path, **opts)
    if drv == "Parquet":
        df.write.parquet(path, mode="overwrite")
        return None
    raise ValueError(f"unknown driver {drv!r}")


def convert(spark, src: str, dst: str, *,
            src_driver: str | None = None,
            dst_driver: str | None = None,
            src_opts: dict | None = None,
            dst_opts: dict | None = None):
    """ogr2ogr: open ``src`` with any driver, write ``dst`` with
    any driver — fully distributed on both sides (the frame never
    materializes on the driver except in a single-file writer's
    declared streaming mode)."""
    df = open_vector(spark, src, driver=src_driver,
                     **(src_opts or {}))
    return write_vector(df, dst, driver=dst_driver,
                        **(dst_opts or {}))


_KIND_NAMES = {1: "Point", 2: "LineString", 3: "Polygon",
               4: "MultiPoint", 5: "MultiLineString",
               6: "MultiPolygon"}


def vector_info(spark, path: str, driver: str | None = None,
                **opts) -> dict:
    """ogrinfo -json analog: driver, featureCount, extent,
    geometry types present, field schema.  One distributed pass
    (count + envelope + type histogram in a single agg)."""
    drv = driver or sniff_vector_driver(path)
    df = open_vector(spark, path, driver=drv, **opts)
    fields = [{"name": f.name, "type": f.dataType.simpleString()}
              for f in df.schema.fields
              if f.name not in ("fid", "geometry")]
    if "geometry" not in df.columns:
        n = df.count()
        return {"driver": drv, "featureCount": n,
                "extent": None, "geometryTypes": [],
                "fields": fields}

    from typing import Iterator

    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.types import (
        DoubleType, LongType, StringType, StructField, StructType,
    )

    from gdal_spark.geometry.wkb import parse_wkb

    schema = StructType([
        StructField("minx", DoubleType()),
        StructField("miny", DoubleType()),
        StructField("maxx", DoubleType()),
        StructField("maxy", DoubleType()),
        StructField("kind", StringType()),
        StructField("n", LongType()),
    ])

    def probe(batches: Iterator[pd.DataFrame]
              ) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows: dict = {}
            for g in b["geometry"]:
                if g is None:
                    key = "None"
                    box = (np.inf, np.inf, -np.inf, -np.inf)
                else:
                    gm = parse_wkb(bytes(g))
                    xs = np.concatenate([p[:, 0]
                                         for p in gm.parts])
                    ys = np.concatenate([p[:, 1]
                                         for p in gm.parts])
                    key = _KIND_NAMES.get(gm.kind, str(gm.kind))
                    box = (xs.min(), ys.min(), xs.max(), ys.max())
                cur = rows.get(key)
                if cur is None:
                    rows[key] = [box[0], box[1], box[2], box[3], 1]
                else:
                    cur[0] = min(cur[0], box[0])
                    cur[1] = min(cur[1], box[1])
                    cur[2] = max(cur[2], box[2])
                    cur[3] = max(cur[3], box[3])
                    cur[4] += 1
            yield pd.DataFrame({
                "minx": [v[0] for v in rows.values()],
                "miny": [v[1] for v in rows.values()],
                "maxx": [v[2] for v in rows.values()],
                "maxy": [v[3] for v in rows.values()],
                "kind": list(rows.keys()),
                "n": [v[4] for v in rows.values()],
            })

    agg = (df.select("geometry").mapInPandas(probe, schema)
           .groupBy("kind")
           .agg(F.min("minx").alias("minx"),
                F.min("miny").alias("miny"),
                F.max("maxx").alias("maxx"),
                F.max("maxy").alias("maxy"),
                F.sum("n").alias("n"))
           .collect())
    total = int(sum(r["n"] for r in agg))
    kinds = sorted(r["kind"] for r in agg if r["kind"] != "None")
    boxes = [r for r in agg if r["kind"] != "None"]
    extent = None
    if boxes:
        extent = [min(r["minx"] for r in boxes),
                  min(r["miny"] for r in boxes),
                  max(r["maxx"] for r in boxes),
                  max(r["maxy"] for r in boxes)]
    return {"driver": drv, "featureCount": total,
            "extent": extent, "geometryTypes": kinds,
            "fields": fields}


def raster_info(path: str) -> dict:
    """gdalinfo -json analog, header-only.  Accepts a GeoTIFF file
    or a z/x/y tile-pyramid directory (the engine's pyramid
    layout): driver, size, band count, dtype, geotransform,
    EPSG; for pyramids also the zoom levels and tile counts.
    SQLite tile containers (MBTiles, GeoPackage pyramids) report
    driver, format, zoom levels, tile counts and bounds — all from
    the metadata tables, no blob decode.  Zarr v2 stores report
    per-array shape/chunks/dtype/compressor from the .zarray JSON."""
    if os.path.isdir(path) and (
            os.path.exists(os.path.join(path, ".zarray"))
            or os.path.exists(os.path.join(path, ".zgroup"))):
        from gdal_spark.sources.zarr import zarr_info

        zi = zarr_info(path)
        return {"driver": "Zarr", "kind": zi["kind"],
                "arrays": {
                    name: {"shape": m["shape"],
                           "chunks": m["chunks"],
                           "dtype": m["dtype"],
                           "compressor": (m.get("compressor") or
                                          {}).get("id", "raw")
                           if isinstance(m.get("compressor"), dict)
                           else "raw"}
                    for name, m in zi["arrays"].items()}}
    if os.path.isfile(path):
        with open(path, "rb") as fh:
            head = fh.read(72)
        if head.startswith(b"SQLite format 3\x00"):
            import sqlite3 as _sq

            con = _sq.connect(f"file:{path}?mode=ro", uri=True)
            try:
                if head[68:72] == b"GPKG":
                    tbl = con.execute(
                        "SELECT table_name FROM gpkg_contents "
                        "WHERE data_type = 'tiles' "
                        "ORDER BY table_name").fetchone()
                    if tbl is None:
                        raise ValueError(
                            f"{path}: GeoPackage has no tile "
                            "pyramid (use vector_info)")
                    per_zoom = dict(con.execute(
                        f'SELECT zoom_level, COUNT(*) FROM '
                        f'"{tbl[0]}" GROUP BY zoom_level '
                        "ORDER BY zoom_level"))
                    ext = con.execute(
                        "SELECT min_x, min_y, max_x, max_y, srs_id "
                        "FROM gpkg_contents WHERE table_name = ?",
                        (tbl[0],)).fetchone()
                    return {"driver": "GPKG", "table": tbl[0],
                            "zooms": per_zoom,
                            "bounds": list(ext[:4]),
                            "epsg": ext[4]}
                meta = dict(con.execute(
                    "SELECT name, value FROM metadata"))
                per_zoom = dict(con.execute(
                    "SELECT zoom_level, COUNT(*) FROM tiles "
                    "GROUP BY zoom_level ORDER BY zoom_level"))
                return {"driver": "MBTiles",
                        "format": meta.get("format", "png"),
                        "zooms": per_zoom,
                        "bounds": ([float(v) for v in
                                    meta["bounds"].split(",")]
                                   if "bounds" in meta else None),
                        "name": meta.get("name")}
            finally:
                con.close()
    if os.path.isdir(path):
        zooms = sorted(int(z) for z in os.listdir(path)
                       if z.isdigit())
        if not zooms:
            raise ValueError(f"{path}: not a z/x/y pyramid")
        per_zoom = {}
        sample = None
        for z in zooms:
            n = 0
            for xdir in _glob.glob(os.path.join(path, str(z),
                                                "*")):
                files = os.listdir(xdir)
                n += len(files)
                if sample is None and files:
                    sample = os.path.join(xdir, files[0])
            per_zoom[z] = n
        info: dict = {"driver": "TilePyramid", "zooms": per_zoom}
        if sample and sample.endswith((".tif", ".tiff")):
            from gdal_spark.sources.vrt import tiff_meta
            info["sampleTile"] = tiff_meta(sample)
        return info
    from gdal_spark.sources.vrt import tiff_meta

    m = tiff_meta(path)
    return {"driver": "GTiff", "size": [m["width"], m["height"]],
            "bands": m["bands"], "dtype": m["dtype"],
            "geotransform": (list(m["geotransform"])
                             if m["geotransform"] else None),
            "epsg": m["epsg"]}
