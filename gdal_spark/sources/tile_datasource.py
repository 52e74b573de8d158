"""Python Data Source for z/x/y tile pyramids (SURVEY §7's "custom
DataSourceV2 for tile pyramids", feasible Spark-first since PySpark
4.0's datasource API).

Reads a slippy-map directory (`<path>/<zoom>/<x>/<y>.png`, the layout
the reference's tile writer and write_tiles(format="png") emit —
apps/gdalalg_raster_tile.cpp:509-545) back as TILE_SCHEMA rows, with
REAL filter pushdown: zoom and tile_x prune whole DIRECTORIES before
any file opens, tile_y prunes file names inside a partition.  At a
continental pyramid (millions of tiles) a `WHERE zoom = 12 AND
tile_x BETWEEN a AND b` scan therefore lists and reads only the
matching subtree — the same partition-pruning story as the parquet
sinks, but for the file-per-tile layout.

    from gdal_spark.sources.tile_datasource import register_tile_source
    register_tile_source(spark)
    df = (spark.read.format("tile_pyramid")
          .option("path", "/data/pyr").load()
          .filter("zoom = 3 AND tile_x >= 4"))

One input partition per (zoom, x) directory — the natural file-list
unit; multi-channel PNGs explode into one row per band.
"""

from __future__ import annotations

import os

from pyspark.sql.datasource import (
    DataSource, DataSourceReader, EqualTo, GreaterThan,
    GreaterThanOrEqual, InputPartition, LessThan, LessThanOrEqual,
)

_SCHEMA = ("zoom int, tile_x int, tile_y int, band int, "
           "data binary, dtype string, tile_size int")


class _XDirPartition(InputPartition):
    def __init__(self, zoom: int, xdir: str, tile_x: int):
        self.zoom = zoom
        self.xdir = xdir
        self.tile_x = tile_x


class TilePyramidReader(DataSourceReader):
    """Directory-pruning reader: bounds accumulated from pushed
    filters restrict the zoom/x dir listing and the y file list."""

    _PRUNABLE = {"zoom", "tile_x", "tile_y"}

    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("tile_pyramid needs .option('path', ...)")
        self.convention = options.get("convention", "xyz")
        # col -> [lo, hi] inclusive bounds (None = unbounded)
        self.bounds: dict[str, list] = {
            c: [None, None] for c in ("zoom", "tile_x", "tile_y")}

    def pushFilters(self, filters):
        for f in filters:
            attr = getattr(f, "attribute", None)
            col = attr[0] if attr and len(attr) == 1 else None
            if col not in self._PRUNABLE:
                yield f                     # not ours — Spark re-checks
                continue
            b = self.bounds[col]
            if isinstance(f, EqualTo):
                v = int(f.value)
                b[0] = v if b[0] is None else max(b[0], v)
                b[1] = v if b[1] is None else min(b[1], v)
            elif isinstance(f, GreaterThan):
                v = int(f.value) + 1
                b[0] = v if b[0] is None else max(b[0], v)
            elif isinstance(f, GreaterThanOrEqual):
                v = int(f.value)
                b[0] = v if b[0] is None else max(b[0], v)
            elif isinstance(f, LessThan):
                v = int(f.value) - 1
                b[1] = v if b[1] is None else min(b[1], v)
            elif isinstance(f, LessThanOrEqual):
                v = int(f.value)
                b[1] = v if b[1] is None else min(b[1], v)
            else:
                yield f                     # unsupported shape

    def _in_bounds(self, col: str, v: int) -> bool:
        lo, hi = self.bounds[col]
        return (lo is None or v >= lo) and (hi is None or v <= hi)

    def partitions(self):
        parts = []
        # a missing root is a caller error, not an empty dataset —
        # match spark.read.parquet's behavior instead of silently
        # returning 0 rows; the no-op partition below is only for a
        # listing pruned to nothing by pushed filters
        zooms = sorted(os.listdir(self.path))
        def as_int(s: str):
            # zoom -1 marks a plain (non-pyramid) tile grid, e.g.
            # tiles_from_array output — accept signed integers
            try:
                return int(s)
            except ValueError:
                return None

        for zs in zooms:
            z = as_int(zs)
            if z is None or not self._in_bounds("zoom", z):
                continue
            zdir = os.path.join(self.path, zs)
            if not os.path.isdir(zdir):
                continue
            for xs in sorted(os.listdir(zdir)):
                x = as_int(xs)
                if x is None or not self._in_bounds("tile_x", x):
                    continue
                parts.append(_XDirPartition(z,
                                            os.path.join(zdir, xs),
                                            x))
        # Spark requires >= 1 partition; an empty pruned listing
        # still needs a no-op partition
        return parts or [_XDirPartition(-1, "", -1)]

    def read(self, part: _XDirPartition):
        if not part.xdir:        # the empty no-op partition
            return
        import numpy as np

        from gdal_spark.operators.gtiff import decode_gtiff
        from gdal_spark.operators.jpeg import decode_jpeg
        from gdal_spark.operators.png import decode_png
        from gdal_spark.operators.tiling import encode_tile

        names = sorted(os.listdir(part.xdir))
        stems: dict[str, str] = {}
        for fn in names:
            if fn.rsplit(".", 1)[-1] in ("png", "jpg", "jpeg",
                                         "tif", "tiff"):
                stem = fn.rsplit(".", 1)[0]
                if stem in stems:
                    raise ValueError(
                        f"mixed tile formats for the same tile in "
                        f"{part.xdir}: {stems[stem]} and {fn} — a "
                        "stale pyramid (append across formats?); "
                        "rewrite with mode='overwrite'")
                stems[stem] = fn
        for fn in names:
            if fn.endswith(".png"):
                codec = decode_png
            elif fn.endswith(".jpg") or fn.endswith(".jpeg"):
                codec = decode_jpeg
            elif fn.endswith(".tif") or fn.endswith(".tiff"):
                # geotiff tiles carry native (possibly non-uint8)
                # dtypes; drop the georef meta — the tile key
                # re-derives it
                codec = lambda b: decode_gtiff(b)[0]  # noqa: E731
            else:
                continue
            fy = int(fn.rsplit(".", 1)[0])
            if self.convention == "xyz":
                ty = fy
            else:
                if part.zoom < 0:
                    raise ValueError(
                        "tms convention needs a non-negative zoom "
                        "(plain tile grids are xyz)")
                # the per-zoom flip is monotonic, so the pushed
                # tile_y bounds apply to the flipped value — TMS
                # prunes files exactly like xyz (the filename alone
                # decides, before any open)
                ty = (1 << part.zoom) - 1 - fy
            if not self._in_bounds("tile_y", ty):
                continue
            with open(os.path.join(part.xdir, fn), "rb") as fh:
                img = codec(fh.read())
            if img.ndim == 2:
                img = img[:, :, None]
            ts = img.shape[0]
            for b in range(img.shape[2]):
                payload, dts = encode_tile(
                    np.ascontiguousarray(img[:, :, b]), None)
                yield (part.zoom, part.tile_x, ty, b + 1,
                       payload, dts, ts)


class TilePyramidDataSource(DataSource):
    @classmethod
    def name(cls):
        return "tile_pyramid"

    def schema(self):
        return _SCHEMA

    def reader(self, schema):
        return TilePyramidReader(self.options)


def register_tile_source(spark) -> None:
    """Register the 'tile_pyramid' format on this session.

    SIDE EFFECT: enables ``spark.sql.python.filterPushdown.enabled``
    session-wide when it is not already true — Spark gates the Python
    datasource pushFilters() API behind that conf, and a reader
    implementing it refuses to initialize otherwise.  The flag also
    applies to every OTHER Python data source in the session (they
    receive pushFilters calls they may ignore, which is safe but
    observable).  Callers who need it off must unset it after use."""
    conf = "spark.sql.python.filterPushdown.enabled"
    if spark.conf.get(conf, "false") != "true":
        spark.conf.set(conf, "true")
    spark.dataSource.register(TilePyramidDataSource)
