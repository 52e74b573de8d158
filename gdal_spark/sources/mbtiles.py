"""MBTiles driver — raster + vector tile container over SQLite.

The reference ships MBTiles as a first-class driver
(/root/reference/ogr/ogrsf_frmts/mbtiles/mbtilesdataset.cpp, and
the MVT writer's MBTILES container in mvtutils.h:54-60).  This
module re-derives the format from the PUBLIC MBTiles 1.3 spec
(mapbox/mbtiles-spec): one SQLite database with a ``tiles`` table
(zoom_level, tile_column, tile_row, tile_data) in **TMS row
order** (``tile_row = 2^z - 1 - y_xyz``) plus a ``metadata``
key/value table; vector tilesets are gzip-compressed MVT blobs
with ``format=pbf`` and the TileJSON ``json`` metadata row.

Spark-first shape (same stance as the GeoPackage sink):

* blob ENCODE runs fully distributed — ``tile_blob_frame`` (the
  in-repo PNG/JPEG codecs) for raster pyramids, the MVT stage-B
  kernel for vector tiles; the driver only streams finished blobs
  into the single SQLite writer (SQLite is one-writer-per-file).
* READ plans rowid-range splits over ``tiles`` with the zoom
  predicate pushed into every task's SQL; foreign files where
  ``tiles`` is a VIEW (the images+map dedup layout) fall back to
  per-zoom column-range splits.
"""

from __future__ import annotations

import json
import os
import sqlite3
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from gdal_spark.functions.geo import ORIGIN


def _connect_ro(path: str) -> sqlite3.Connection:
    return sqlite3.connect(f"file:{path}?mode=ro&immutable=1",
                           uri=True)


def _check_path(path: str, what: str) -> None:
    if "://" in str(path):
        raise ValueError(
            f"{what} needs a plain shared-filesystem path "
            f"(got {path!r}); object-store URIs are not supported")


def _create_mbtiles(path: str) -> sqlite3.Connection:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    if os.path.exists(path):
        os.remove(path)
    con = sqlite3.connect(path)
    cur = con.cursor()
    cur.execute("PRAGMA journal_mode = OFF")
    cur.execute("PRAGMA synchronous = OFF")
    cur.executescript("""
        CREATE TABLE metadata (name TEXT, value TEXT);
        CREATE TABLE tiles (
            zoom_level INTEGER,
            tile_column INTEGER,
            tile_row INTEGER,
            tile_data BLOB);
        CREATE UNIQUE INDEX tile_index ON tiles
            (zoom_level, tile_column, tile_row);
    """)
    return con


def _bounds_lonlat(ext_tiles: dict, zmax: int) -> list[float]:
    from gdal_spark.sources.mvt import _inv_merc

    mnx, mny, mxx, mxy = ext_tiles[zmax]        # xyz tile indices
    span = 2.0 * ORIGIN / (1 << zmax)
    corners = np.array([
        [mnx * span - ORIGIN, ORIGIN - (mxy + 1) * span],
        [(mxx + 1) * span - ORIGIN, ORIGIN - mny * span]])
    ll = _inv_merc(corners)
    return [ll[0, 0], ll[0, 1], ll[1, 0], ll[1, 1]]


def _write_metadata(cur, rows: dict) -> None:
    cur.executemany("INSERT INTO metadata VALUES (?, ?)",
                    [(k, str(v)) for k, v in rows.items()])


def write_mbtiles(tiles: DataFrame, path: str, *,
                  format: str = "png", quality: int = 75,
                  name: str | None = None) -> int:
    """TILE_SCHEMA DataFrame -> one raster MBTiles file.

    Encode runs distributed (``tile_blob_frame``); rows insert in
    TMS order per the spec.  Returns the tile count."""
    _check_path(path, "write_mbtiles")

    from gdal_spark.operators.tiling import tile_blob_frame

    blobs = tile_blob_frame(tiles, format=format, quality=quality)
    con = _create_mbtiles(path)
    cur = con.cursor()
    n = 0
    zooms: set[int] = set()
    ext_tiles: dict[int, list] = {}
    from gdal_spark.operators.tiling import bounded_local_stream

    rows_it, _n = bounded_local_stream(blobs)
    for row in rows_it:
        z, tx, ty = int(row["zoom"]), int(row["tile_x"]), \
            int(row["tile_y"])
        cur.execute(
            "INSERT INTO tiles VALUES (?,?,?,?)",
            (z, tx, (1 << z) - 1 - ty, bytes(row["blob"])))
        n += 1
        zooms.add(z)
        e = ext_tiles.setdefault(z, [tx, ty, tx, ty])
        e[0], e[1] = min(e[0], tx), min(e[1], ty)
        e[2], e[3] = max(e[2], tx), max(e[3], ty)
    meta = {
        "name": name or os.path.splitext(os.path.basename(path))[0],
        "type": "overlay",
        "version": "1.1",
        "format": "jpg" if format == "jpeg" else format,
    }
    if zooms:
        zmin, zmax = min(zooms), max(zooms)
        b = _bounds_lonlat(ext_tiles, zmax)
        meta.update({
            "minzoom": zmin, "maxzoom": zmax,
            "bounds": ",".join(repr(round(v, 7)) for v in b),
            "center": f"{round((b[0] + b[2]) / 2, 7)},"
                      f"{round((b[1] + b[3]) / 2, 7)},{zmin}",
        })
    _write_metadata(cur, meta)
    con.commit()
    con.close()
    return n


def write_mbtiles_vector(df: DataFrame, path: str, *,
                         layer: str = "layer0", minzoom: int = 0,
                         maxzoom: int = 5, extent: int = 4096,
                         buffer: int = 80,
                         simplification: float | None = None,
                         name: str | None = None,
                         geometry_col: str = "geometry") -> dict:
    """Vector frame -> one vector-tile MBTiles (gzip MVT blobs —
    the spec REQUIRES gzip for pbf).  Same two distributed stages
    as ``write_mvt``; only finished blobs stream into SQLite."""
    _check_path(path, "write_mbtiles_vector")

    from gdal_spark.sources.mvt import (
        _mvt_encode_frame, _mvt_metadata, _mvt_prepare,
    )

    covered, fid_col, prop_cols, field_types = _mvt_prepare(
        df, geometry_col, minzoom, maxzoom, extent, buffer)
    blobs = _mvt_encode_frame(
        covered, path=None, layer=layer, extent=extent,
        buffer=buffer, compress=True,
        simplification=simplification, fid_col=fid_col,
        prop_cols=prop_cols, field_types=field_types,
        geometry_col=geometry_col)

    con = _create_mbtiles(path)
    cur = con.cursor()
    n = n_feat = nbytes = 0
    ext_tiles: dict[int, list] = {}
    from gdal_spark.operators.tiling import bounded_local_stream

    rows_it, _n = bounded_local_stream(blobs)
    for row in rows_it:
        z, tx, ty = int(row["zoom"]), int(row["tile_x"]), \
            int(row["tile_y"])
        blob = bytes(row["blob"])
        cur.execute("INSERT INTO tiles VALUES (?,?,?,?)",
                    (z, tx, (1 << z) - 1 - ty, blob))
        n += 1
        n_feat += int(row["n_features"])
        nbytes += len(blob)
        e = ext_tiles.setdefault(z, [tx, ty, tx, ty])
        e[0], e[1] = min(e[0], tx), min(e[1], ty)
        e[2], e[3] = max(e[2], tx), max(e[3], ty)
    # reuse the directory sink's metadata builder: feed it the same
    # maxzoom tile extents it would have aggregated JVM-side
    if ext_tiles:
        zmax = max(ext_tiles)
        stats = {"txmin": ext_tiles[zmax][0],
                 "tymin": ext_tiles[zmax][1],
                 "txmax": ext_tiles[zmax][2],
                 "tymax": ext_tiles[zmax][3]}
    else:
        stats = {"txmin": None, "tymin": None,
                 "txmax": None, "tymax": None}
    meta = _mvt_metadata(
        name or os.path.splitext(os.path.basename(path))[0],
        layer, minzoom, maxzoom, stats, field_types, bool(fid_col))
    _write_metadata(cur, meta)
    con.commit()
    con.close()
    return {"tiles": n, "features": n_feat, "nbytes": nbytes}


def mbtiles_metadata(path: str) -> dict:
    """The metadata table as a dict (mbtiles-spec 1.3 §metadata)."""
    _check_path(path, "mbtiles_metadata")
    con = _connect_ro(path)
    try:
        return dict(con.execute(
            "SELECT name, value FROM metadata"))
    finally:
        con.close()


def _plan_splits(path: str, zoom: int | None,
                 rows_per_task: int,
                 min_tasks: int = 1) -> list[tuple]:
    """(lo, hi, zoom_or_-1) rowid ranges; per-zoom column ranges
    when ``tiles`` is a view (the dedup images+map layout).

    ``rows_per_task`` caps task size for big stores;  ``min_tasks``
    shrinks the step for SMALL stores so a 1024-tile pyramid still
    fans out across the cluster instead of decoding single-task."""
    con = _connect_ro(path)
    try:
        kind = con.execute(
            "SELECT type FROM sqlite_master WHERE name = 'tiles'"
        ).fetchone()
        if kind is None:
            raise ValueError(f"{path}: no tiles table")
        if kind[0] == "table":
            q = "SELECT MIN(rowid), MAX(rowid) FROM tiles"
            args: tuple = ()
            if zoom is not None:
                q += " WHERE zoom_level = ?"
                args = (zoom,)
            lo, hi = con.execute(q, args).fetchone()
            if lo is None:
                return []
            span = int(hi) - int(lo) + 1
            step = max(1, min(rows_per_task,
                              -(-span // max(min_tasks, 1))))
            return [("rowid", int(a),
                     min(int(a) + step - 1, int(hi)), -1)
                    for a in range(int(lo), int(hi) + 1, step)]
        # view: split tile_column ranges per zoom
        zq = "SELECT DISTINCT zoom_level FROM tiles"
        if zoom is not None:
            zq += f" WHERE zoom_level = {int(zoom)}"
        out = []
        for (z,) in con.execute(zq).fetchall():
            lo, hi = con.execute(
                "SELECT MIN(tile_column), MAX(tile_column) FROM "
                "tiles WHERE zoom_level = ?", (z,)).fetchone()
            step = max((int(hi) - int(lo) + 1) // 64, 1)
            out.extend(
                ("col", a, min(a + step - 1, int(hi)), int(z))
                for a in range(int(lo), int(hi) + 1, step))
        return out
    finally:
        con.close()


def _task_sql(mode: str, z: int, zoom: int | None) -> str:
    sql = ("SELECT zoom_level, tile_column, tile_row, tile_data "
           "FROM tiles WHERE ")
    sql += ("rowid BETWEEN ? AND ?" if mode == "rowid"
            else "tile_column BETWEEN ? AND ? AND zoom_level = "
            + str(z))
    if mode == "rowid" and zoom is not None:
        sql += f" AND zoom_level = {int(zoom)}"
    return sql


def read_mbtiles(spark: SparkSession, path: str, *,
                 zoom: int | None = None, layer: str | None = None,
                 rows_per_task: int = 2048) -> DataFrame:
    """MBTiles -> DataFrame, distributed.

    format png/jpg: TILE_SCHEMA rows (one per band, XYZ tile_y —
    the TMS flip undone on read), decoded with the in-repo codecs.
    format pbf: one row per feature per tile, same shape as
    ``read_mvt`` (zoom, tile_x, tile_y, fid, geometry WKB lon/lat,
    typed properties from the ``json`` metadata row)."""
    _check_path(path, "read_mbtiles")
    meta = mbtiles_metadata(path)
    fmt = meta.get("format", "png")
    tasks = _plan_splits(
        path, zoom, rows_per_task,
        min_tasks=spark.sparkContext.defaultParallelism)
    qzoom = zoom

    tdf = (pd.DataFrame(tasks, columns=["mode", "lo", "hi", "z"])
           if tasks else
           pd.DataFrame({"mode": pd.Series(dtype=str),
                         "lo": pd.Series(dtype="int64"),
                         "hi": pd.Series(dtype="int64"),
                         "z": pd.Series(dtype="int64")}))
    tdf["file"] = path
    ranges = spark.createDataFrame(tdf)
    nparts = max(len(tasks), 1)
    ranges = ranges.repartition(
        min(nparts, spark.sparkContext.defaultParallelism * 2))

    if fmt in ("png", "jpg", "jpeg"):
        from gdal_spark.operators.tiling import TILE_SCHEMA

        def raster_kernel(batches: Iterator[pd.DataFrame]
                          ) -> Iterator[pd.DataFrame]:
            from gdal_spark.operators.jpeg import decode_jpeg
            from gdal_spark.operators.png import decode_png
            from gdal_spark.operators.tiling import encode_tile
            for b in batches:
                for _, t in b.iterrows():
                    con = _connect_ro(t["file"])
                    try:
                        rows = con.execute(
                            _task_sql(t["mode"], int(t["z"]),
                                      qzoom),
                            (int(t["lo"]), int(t["hi"]))).fetchall()
                    finally:
                        con.close()
                    out = {k: [] for k in
                           ("zoom", "tile_x", "tile_y", "band",
                            "data", "dtype", "tile_size")}
                    for z, tx, trow, blob in rows:
                        blob = bytes(blob)
                        img = (decode_png(blob)
                               if blob[:4] == b"\x89PNG"
                               else decode_jpeg(blob))
                        if img.ndim == 2:
                            img = img[:, :, None]
                        ty = (1 << z) - 1 - trow      # TMS -> XYZ
                        for bi in range(img.shape[2]):
                            payload, dts = encode_tile(
                                np.ascontiguousarray(
                                    img[:, :, bi]), None)
                            out["zoom"].append(z)
                            out["tile_x"].append(tx)
                            out["tile_y"].append(ty)
                            out["band"].append(bi + 1)
                            out["data"].append(payload)
                            out["dtype"].append(dts)
                            out["tile_size"].append(img.shape[0])
                    yield pd.DataFrame(out)

        return ranges.mapInPandas(raster_kernel, TILE_SCHEMA)

    if fmt != "pbf":
        raise ValueError(f"{path}: unsupported mbtiles format "
                         f"{fmt!r}")

    from pyspark.sql.types import (
        BinaryType, IntegerType, LongType, StructField, StructType,
    )

    from gdal_spark.sources.mvt import (
        _TYPE_TO_SPARK, _coerce_value, _decode_tile, _parts_to_wkb,
    )

    j = json.loads(meta["json"])
    layers = j["vector_layers"]
    lyr = layer or layers[0]["id"]
    ftypes = j.get("field_types", {}).get(lyr)
    if ftypes is None:
        vl = next(v for v in layers if v["id"] == lyr)
        ftypes = {c: {"String": "String", "Boolean": "Boolean"}.get(
            t, "Real") for c, t in vl["fields"].items()}
    prop_cols = list(ftypes)

    schema = StructType(
        [StructField("zoom", IntegerType()),
         StructField("tile_x", LongType()),
         StructField("tile_y", LongType()),
         StructField("fid", LongType()),
         StructField("geometry", BinaryType())]
        + [StructField(c, _TYPE_TO_SPARK[ftypes[c]])
           for c in prop_cols])

    def vector_kernel(batches: Iterator[pd.DataFrame]
                      ) -> Iterator[pd.DataFrame]:
        rows: list[dict] = []
        for b in batches:
            for _, t in b.iterrows():
                con = _connect_ro(t["file"])
                try:
                    tiles = con.execute(
                        _task_sql(t["mode"], int(t["z"]), qzoom),
                        (int(t["lo"]), int(t["hi"]))).fetchall()
                finally:
                    con.close()
                for z, tx, trow, blob in tiles:
                    ty = (1 << z) - 1 - trow          # TMS -> XYZ
                    span = 2.0 * ORIGIN / (1 << z)
                    x0 = tx * span - ORIGIN
                    y_top = ORIGIN - ty * span
                    _n, lext, feats = _decode_tile(bytes(blob), lyr)
                    for fid, gtype, gparts, props in feats:
                        wkb = _parts_to_wkb(gtype, gparts, x0,
                                            y_top, span, lext)
                        if wkb is None:
                            continue
                        row = {"zoom": z, "tile_x": tx,
                               "tile_y": ty, "fid": fid,
                               "geometry": wkb}
                        for c in prop_cols:
                            v = props.get(c)
                            row[c] = None if v is None else \
                                _coerce_value(v, ftypes[c])
                        rows.append(row)
                        if len(rows) >= 4096:
                            yield pd.DataFrame(rows)
                            rows = []
        if rows:
            yield pd.DataFrame(rows)

    return ranges.mapInPandas(vector_kernel, schema)
