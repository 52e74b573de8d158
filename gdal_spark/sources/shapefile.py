"""ESRI Shapefile driver (read + write), from the public specs.

Re-derives the reference's flagship vector driver
(ogr/ogrsf_frmts/shape/ — shpopen.c record I/O, dbfopen.c attribute
I/O, ogrshapelayer.cpp feature assembly, shptree/organizePolygons
ring grouping) from the ESRI Shapefile Technical Description (July
1998) and the dBASE III table format — stdlib struct + NumPy only.

Spark-first distribution: a shapefile is ONE .shp stream, but the
.shx sidecar is a fixed 8-byte-per-record offset index.  The reader
loads .shx driver-side (bounded: the format's 32-bit offsets cap any
shapefile at 4 GiB, so .shx tops out ~16 MiB), plans record-range
SPLITS, and each Spark task seeks into .shp/.dbf independently —
shapelib's random-access contract turned into partition planning.
The writer's default ``mode="parts"`` emits one shapefile set per
partition (the parquet part-file convention applied to .shp);
``mode="single"`` streams one classic .shp/.shx/.dbf trio through
the driver with bounded memory (toLocalIterator), for consumers that
need the one-file layout the reference writes.

Geometry: shape types 1/3/5/8 and their Z (11/13/15/18) and M
(21/23/25/28) variants decode; Z/M ordinates are dropped (this
engine is 2-D, like the png/jpeg Byte convention — declared in
COVERAGE.md).  Polygon records group their rings by winding order
(spec: outer rings clockwise, holes counter-clockwise) and each hole
is assigned to the smallest enclosing shell, the same job
OGRGeometryFactory::organizePolygons does; WKB output uses OGC
orientation (shells CCW, holes CW).

Attribute typing (dbfopen.c conventions): C -> string, N/F with
decimals -> double, N without -> long, L -> boolean, D -> date.
"""

from __future__ import annotations

import os
import struct
from datetime import date

import numpy as np
import pandas as pd

from gdal_spark.geometry.wkb import (
    LINESTRING, MULTILINESTRING, MULTIPOINT, MULTIPOLYGON, POINT,
    POLYGON, Geom, linestring_wkb, multilinestring_wkb,
    multipoint_wkb, multipolygon_wkb, parse_wkb, point_wkb,
    polygon_wkb,
)

_FILE_CODE = 9994
_VERSION = 1000

# shape-type families: base XY, Z variant, M variant
_POINT_T, _ARC_T, _POLYGON_T, _MULTIPOINT_T = 1, 3, 5, 8
_BASE = {1: 1, 11: 1, 21: 1, 3: 3, 13: 3, 23: 3,
         5: 5, 15: 5, 25: 5, 8: 8, 18: 8, 28: 8}


# ------------------------------------------------------------ rings

def _signed_area(ring: np.ndarray) -> float:
    x, y = ring[:, 0], ring[:, 1]
    return 0.5 * float(np.dot(x, np.roll(y, -1))
                       - np.dot(y, np.roll(x, -1)))


def _point_in_ring(px: float, py: float, ring: np.ndarray) -> bool:
    """Even-odd ray cast (the ogrlayer.cpp PIP rule, re-stated)."""
    x, y = ring[:, 0], ring[:, 1]
    x2, y2 = np.roll(x, -1), np.roll(y, -1)
    cross = (y > py) != (y2 > py)
    if not cross.any():
        return False
    with np.errstate(divide="ignore", invalid="ignore"):
        xin = x + (py - y) * (x2 - x) / (y2 - y)
    return bool(np.count_nonzero(px < xin[cross]) & 1)


def _group_rings(rings: list[np.ndarray]) -> list[list[np.ndarray]]:
    """Shapefile ring soup -> list of [shell, holes...] polygons.

    Spec winding: CW (negative shoelace) = shell, CCW = hole.  Holes
    attach to the smallest enclosing shell; unenclosed holes promote
    to shells (organizePolygons' lenient default).  Output follows
    OGC orientation: shells CCW, holes CW.
    """
    shells: list[np.ndarray] = []
    holes: list[np.ndarray] = []
    for r in rings:
        (shells if _signed_area(r) <= 0 else holes).append(r)
    if not shells and holes:        # malformed: all CCW
        shells, holes = holes, []
    polys: list[list[np.ndarray]] = [[s[::-1]] for s in shells]
    areas = [abs(_signed_area(s)) for s in shells]
    for h in holes:
        px, py = float(h[0, 0]), float(h[0, 1])
        best = -1
        best_area = np.inf
        for i, s in enumerate(shells):
            if areas[i] < best_area and _point_in_ring(px, py, s):
                best, best_area = i, areas[i]
        if best < 0:
            polys.append([h])          # promote: CCW is shell order
        else:
            polys[best].append(h[::-1])   # hole: CCW -> CW
    return polys


# ----------------------------------------------------- .shp records

def _shp_record_to_wkb(content: bytes) -> bytes | None:
    stype = struct.unpack_from("<i", content, 0)[0]
    if stype == 0:
        return None
    base = _BASE.get(stype)
    if base is None:
        raise ValueError(f"shapefile shape type {stype} is out of "
                         "scope (MultiPatch)")
    if base == _POINT_T:
        x, y = struct.unpack_from("<2d", content, 4)
        return point_wkb(x, y)
    if base == _MULTIPOINT_T:
        n = struct.unpack_from("<i", content, 36)[0]
        if len(content) < 40 + 16 * n:
            raise ValueError(
                "truncated shapefile record (content shorter than "
                "its declared point count)")
        pts = np.frombuffer(content, dtype="<f8", count=2 * n,
                            offset=40).reshape(n, 2)
        return multipoint_wkb([(float(x), float(y)) for x, y in pts])
    # arc / polygon: parts + points
    nparts, npts = struct.unpack_from("<2i", content, 36)
    if len(content) < 44 + 4 * nparts + 16 * npts:
        raise ValueError(
            "truncated shapefile record (content shorter than its "
            "declared part/point counts)")
    parts = np.frombuffer(content, dtype="<i4", count=nparts,
                          offset=44)
    coords = np.frombuffer(content, dtype="<f8", count=2 * npts,
                           offset=44 + 4 * nparts).reshape(npts, 2)
    bounds = list(parts) + [npts]
    pieces = [np.array(coords[bounds[i]:bounds[i + 1]])
              for i in range(nparts)]
    if base == _ARC_T:
        if len(pieces) == 1:
            return linestring_wkb(pieces[0])
        return multilinestring_wkb(pieces)
    polys = _group_rings(pieces)
    if len(polys) == 1:
        return polygon_wkb(polys[0])
    return multipolygon_wkb(polys)


def _orient(ring: np.ndarray, clockwise: bool) -> np.ndarray:
    a = _signed_area(ring)
    if (a > 0) == clockwise:
        return ring[::-1]
    return ring


def _wkb_to_shp(wkb: bytes | None) -> tuple[int, bytes]:
    """WKB -> (shape_type, record content bytes)."""
    if wkb is None:
        return 0, struct.pack("<i", 0)
    g: Geom = parse_wkb(wkb)

    def poly_content(ring_lists: list[list[np.ndarray]]) -> bytes:
        rings = []
        for rl in ring_lists:
            rings.append(_orient(np.asarray(rl[0], float), True))
            rings.extend(_orient(np.asarray(h, float), False)
                         for h in rl[1:])
        return parts_content(_POLYGON_T, rings)

    def parts_content(stype: int, pieces: list[np.ndarray]) -> bytes:
        allc = np.vstack(pieces)
        npts = len(allc)
        offs, acc = [], 0
        for p in pieces:
            offs.append(acc)
            acc += len(p)
        return (struct.pack("<i", stype)
                + struct.pack("<4d", allc[:, 0].min(),
                              allc[:, 1].min(), allc[:, 0].max(),
                              allc[:, 1].max())
                + struct.pack("<2i", len(pieces), npts)
                + struct.pack(f"<{len(offs)}i", *offs)
                + np.ascontiguousarray(allc, "<f8").tobytes())

    if g.kind == POINT:
        x, y = g.parts[0][0]
        return _POINT_T, struct.pack("<i2d", _POINT_T, x, y)
    if g.kind == MULTIPOINT:
        allc = np.vstack(g.parts)
        return _MULTIPOINT_T, (
            struct.pack("<i4d", _MULTIPOINT_T, allc[:, 0].min(),
                        allc[:, 1].min(), allc[:, 0].max(),
                        allc[:, 1].max())
            + struct.pack("<i", len(allc))
            + np.ascontiguousarray(allc, "<f8").tobytes())
    if g.kind == LINESTRING:
        return _ARC_T, parts_content(_ARC_T, [g.parts[0]])
    if g.kind == MULTILINESTRING:
        return _ARC_T, parts_content(_ARC_T, list(g.parts))
    if g.kind == POLYGON:
        return _POLYGON_T, poly_content([list(g.parts)])
    if g.kind == MULTIPOLYGON:
        po = g.part_offsets
        return _POLYGON_T, poly_content(
            [list(g.parts[po[i]:po[i + 1]])
             for i in range(len(po) - 1)])
    raise ValueError(f"unsupported WKB kind {g.kind} for shapefile")


_FAMILY = {_POINT_T: "point", _ARC_T: "arc", _POLYGON_T: "polygon",
           _MULTIPOINT_T: "multipoint"}


# ------------------------------------------------------------- .dbf

def _dbf_header(buf: bytes):
    """-> (n_records, header_size, record_size,
    fields=[(name, type, length, decimals, offset)])."""
    n_rec = struct.unpack_from("<I", buf, 4)[0]
    hdr, rsz = struct.unpack_from("<2H", buf, 8)
    fields = []
    i, off = 32, 1                  # offset 0 is the deletion flag
    while i < len(buf) and buf[i] != 0x0D:
        f = buf[i:i + 32]
        name = f[:11].split(b"\0")[0].decode("ascii")
        fields.append((name, chr(f[11]), f[16], f[17], off))
        off += f[16]
        i += 32
    return n_rec, hdr, rsz, fields


def _parse_dbf_values(raw: list[bytes], ftype: str, dec: int):
    txt = [b.strip() for b in raw]
    if ftype == "C":
        return pd.array(
            [t.decode("utf-8", "replace") if t else None
             for t in txt], dtype="string")
    if ftype in ("N", "F"):
        s = pd.Series([t.decode("ascii") if t else None
                       for t in txt])
        num = pd.to_numeric(s, errors="coerce")
        if ftype == "N" and dec == 0:
            return num.astype("Int64")
        return num.astype("float64")
    if ftype == "L":
        return pd.array(
            [None if t in (b"", b"?") else t in (b"T", b"t", b"Y",
                                                 b"y")
             for t in txt], dtype="boolean")
    if ftype == "D":
        return [date(int(t[:4]), int(t[4:6]), int(t[6:8]))
                if len(t) == 8 and t.isdigit() else None
                for t in txt]
    return pd.array([t.decode("utf-8", "replace") if t else None
                     for t in txt], dtype="string")


def _spark_type(ftype: str, dec: int):
    from pyspark.sql.types import (
        BooleanType, DateType, DoubleType, LongType, StringType,
    )
    if ftype == "C":
        return StringType()
    if ftype in ("N", "F"):
        return LongType() if (ftype == "N" and dec == 0) \
            else DoubleType()
    if ftype == "L":
        return BooleanType()
    if ftype == "D":
        return DateType()
    return StringType()


# ------------------------------------------------------------- read

def _stem(path: str) -> str:
    return path[:-4] if path.lower().endswith(
        (".shp", ".shx", ".dbf")) else path


def read_shapefile(spark, path: str,
                   records_per_split: int = 65536):
    """Read one shapefile set -> DataFrame(fid, geometry WKB,
    attribute columns).

    ``path``: the .shp (or the extension-less stem); .shx/.dbf are
    found beside it.  Must be a POSIX path every executor can reach
    (shared filesystem — the write_tiles contract).  A missing .dbf
    yields a geometry-only frame.  Splits of ``records_per_split``
    records each become Spark partitions; tasks seek via the .shx
    offsets, so a 4 GiB shapefile fans out without any single task
    reading the whole stream.
    """
    from pyspark.sql.types import (
        BinaryType, LongType, StructField, StructType,
    )

    if "://" in str(path):
        raise ValueError(
            "read_shapefile needs a plain shared-filesystem path "
            f"(got {path!r}); object-store URIs are not supported")
    stem = _stem(path)
    shp_path, shx_path = stem + ".shp", stem + ".shx"
    dbf_path = stem + ".dbf"
    if not os.path.exists(shx_path):
        raise FileNotFoundError(
            f"{shx_path}: the reader plans splits from the .shx "
            "index (regenerate it with write_shapefile or shapelib)")
    with open(shx_path, "rb") as fh:
        shx = fh.read()
    n_rec = (len(shx) - 100) // 8

    fields: list = []
    if os.path.exists(dbf_path):
        with open(dbf_path, "rb") as fh:
            head = fh.read(32 * 2049)   # 2048-field format cap
        dbf_n, _, _, fields = _dbf_header(head)
        if dbf_n != n_rec:
            raise ValueError(
                f".dbf has {dbf_n} records but .shx has {n_rec}")

    # output column names: dedupe (case-insensitive, Spark's
    # resolution rule) against the generated fid/geometry columns —
    # e.g. a round-tripped frame whose dbf carries a "fid" attribute
    out_names: list[str] = []
    taken = {"fid", "geometry"}
    for f in fields:
        name, k = f[0], 0
        while name.lower() in taken:
            k += 1
            name = f"{f[0]}_{k}"
        taken.add(name.lower())
        out_names.append(name)
    schema = StructType(
        [StructField("fid", LongType()),
         StructField("geometry", BinaryType())]
        + [StructField(n, _spark_type(f[1], f[3]))
           for n, f in zip(out_names, fields)])
    field_meta = [(n,) + f[1:] for n, f in zip(out_names, fields)]
    has_dbf = bool(fields)

    splits = [(s, min(records_per_split, n_rec - s))
              for s in range(0, n_rec, records_per_split)] or [(0, 0)]
    splits_df = spark.createDataFrame(
        pd.DataFrame(splits, columns=["start", "count"]))
    if len(splits) > 1:
        splits_df = splits_df.repartition(len(splits))

    def kernel(batches):
        for b in batches:
            for _, row in b.iterrows():
                start, count = int(row["start"]), int(row["count"])
                if count == 0:
                    yield pd.DataFrame(
                        {f.name: [] for f in schema.fields})
                    continue
                with open(shx_path, "rb") as fh:
                    fh.seek(100 + 8 * start)
                    idx = np.frombuffer(fh.read(8 * count),
                                        dtype=">i4").reshape(count, 2)
                lo = int(idx[:, 0].min()) * 2
                hi = int((idx[:, 0] + idx[:, 1]).max()) * 2 + 8
                with open(shp_path, "rb") as fh:
                    fh.seek(lo)
                    blob = fh.read(hi - lo)
                geoms = []
                for off, ln in idx:
                    at = int(off) * 2 - lo + 8   # skip record header
                    geoms.append(
                        _shp_record_to_wkb(blob[at:at + int(ln) * 2]))
                out = {"fid": np.arange(start, start + count,
                                        dtype=np.int64),
                       "geometry": geoms}
                if has_dbf:
                    with open(dbf_path, "rb") as fh:
                        _, hdr, rsz, _ = _dbf_header(fh.read(32))
                        fh.seek(hdr + start * rsz)
                        chunk = fh.read(count * rsz)
                    for name, ftype, flen, dec, foff in field_meta:
                        raw = [chunk[i * rsz + foff:
                                     i * rsz + foff + flen]
                               for i in range(count)]
                        out[name] = _parse_dbf_values(raw, ftype,
                                                      dec)
                yield pd.DataFrame(out)

    return splits_df.mapInPandas(kernel, schema)


# ------------------------------------------------------------ write

_DEF_NUM = (18, 0)      # int64 -> N 18.0 (dbfopen.c default widths)
_DEF_REAL = (24, 15)    # double -> N 24.15 (OGR Real default)


def _field_defs(df, geometry_col: str):
    """Derive dBASE field descriptors from the Spark schema; string
    widths come from one JVM-side max(length()) agg (capped at the
    format's 254)."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import (
        BooleanType, DateType, DoubleType, FloatType, IntegerType,
        LongType, StringType,
    )

    defs = []
    str_cols = []
    for f in df.schema.fields:
        if f.name == geometry_col:
            continue
        if isinstance(f.dataType, StringType):
            str_cols.append(f.name)
            defs.append([f.name, "C", 80, 0])
        elif isinstance(f.dataType, (LongType, IntegerType)):
            defs.append([f.name, "N", *_DEF_NUM])
        elif isinstance(f.dataType, (DoubleType, FloatType)):
            defs.append([f.name, "N", *_DEF_REAL])
        elif isinstance(f.dataType, BooleanType):
            defs.append([f.name, "L", 1, 0])
        elif isinstance(f.dataType, DateType):
            defs.append([f.name, "D", 8, 0])
        else:
            raise ValueError(
                f"column {f.name}: {f.dataType} has no dBASE "
                "mapping (string/long/double/boolean/date only)")
    if str_cols:
        widths = df.agg(*[
            F.max(F.length(c)).alias(c) for c in str_cols]).first()
        for d in defs:
            if d[1] == "C":
                d[2] = min(254, max(1, int(widths[d[0]] or 1)))
    return [tuple(d) for d in defs]


def _dbf_format(value, ftype: str, flen: int, dec: int) -> bytes:
    if value is None or (isinstance(value, float)
                         and np.isnan(value)):
        return b" " * flen
    if ftype == "C":
        b = str(value).encode("utf-8")[:flen]
        return b.ljust(flen)
    if ftype == "N":
        if dec:
            s = f"{value:.{dec}f}"
            if len(s) > flen:
                # dbfopen.c's overflow ladder: fewer decimals to
                # fit the width, then scientific notation
                d2 = flen - len(f"{value:.0f}") - 1
                s = f"{value:.{d2}f}" if d2 > 0 \
                    else f"{value:.{max(flen - 8, 1)}e}"
                if len(s) > flen:
                    s = f"{value:.{max(flen - 9, 1)}e}"
            s = s.rjust(flen)
        else:
            s = f"{int(value):{flen}d}"
        if len(s) > flen:
            raise ValueError(
                f"value {value!r} overflows N {flen}.{dec}")
        return s.encode("ascii")
    if ftype == "L":
        return b"T" if value else b"F"
    if ftype == "D":
        return f"{value.year:04d}{value.month:02d}{value.day:02d}" \
            .encode("ascii")
    raise ValueError(f"bad field type {ftype}")


class _ShpSet:
    """Streaming writer for one .shp/.shx/.dbf trio: records append,
    headers (lengths + bbox + counts) patch on close."""

    def __init__(self, stem: str, field_defs):
        self.shp = open(stem + ".shp", "wb")
        self.shx = open(stem + ".shx", "wb")
        self.dbf = open(stem + ".dbf", "wb")
        self.field_defs = field_defs
        self.n = 0
        self.shape_type = 0
        self.bbox = [np.inf, np.inf, -np.inf, -np.inf]
        self.shp.write(b"\0" * 100)
        self.shx.write(b"\0" * 100)
        hdr_size = 32 + 32 * len(field_defs) + 1
        self.rsz = 1 + sum(d[2] for d in field_defs)
        self.dbf.write(b"\0" * 8
                       + struct.pack("<2H", hdr_size, self.rsz)
                       + b"\0" * 20)
        for name, ftype, flen, dec in field_defs:
            self.dbf.write(
                name.encode("ascii")[:10].ljust(11, b"\0")
                + ftype.encode("ascii")
                + b"\0" * 4 + bytes([flen, dec]) + b"\0" * 14)
        self.dbf.write(b"\x0D")

    def add(self, wkb: bytes | None, attrs: tuple) -> None:
        stype, content = _wkb_to_shp(wkb)
        if stype:
            if self.shape_type == 0:
                self.shape_type = stype
            elif _FAMILY[stype] != _FAMILY[self.shape_type]:
                raise ValueError(
                    "a shapefile holds ONE geometry family: got "
                    f"{_FAMILY[stype]} after "
                    f"{_FAMILY[self.shape_type]}")
            if stype in (_ARC_T, _POLYGON_T, _MULTIPOINT_T):
                x0, y0, x1, y1 = struct.unpack_from("<4d", content, 4)
            else:
                x0, y0 = struct.unpack_from("<2d", content, 4)
                x1, y1 = x0, y0
            b = self.bbox
            b[0], b[1] = min(b[0], x0), min(b[1], y0)
            b[2], b[3] = max(b[2], x1), max(b[3], y1)
        self.n += 1
        off_words = self.shp.tell() // 2
        self.shx.write(struct.pack(">2i", off_words,
                                   len(content) // 2))
        self.shp.write(struct.pack(">2i", self.n,
                                   len(content) // 2) + content)
        rec = bytearray(b" ")
        for (name, ftype, flen, dec), v in zip(self.field_defs,
                                               attrs):
            rec += _dbf_format(v, ftype, flen, dec)
        self.dbf.write(rec)

    def close(self) -> None:
        self.dbf.write(b"\x1A")
        bbox = self.bbox if self.n and self.shape_type else \
            [0.0, 0.0, 0.0, 0.0]
        for fh, length in ((self.shp, self.shp.tell()),
                           (self.shx, 100 + 8 * self.n)):
            fh.seek(0)
            fh.write(struct.pack(">i", _FILE_CODE) + b"\0" * 20
                     + struct.pack(">i", length // 2)
                     + struct.pack("<2i", _VERSION, self.shape_type)
                     + struct.pack("<4d", *bbox) + b"\0" * 32)
            fh.close()
        self.dbf.seek(0)
        self.dbf.write(bytes([3, 26, 8, 17]))
        self.dbf.write(struct.pack("<I", self.n))
        self.dbf.close()


def write_shapefile(df, path: str, geometry_col: str = "geometry",
                    mode: str = "parts") -> int:
    """Write a WKB DataFrame as shapefile set(s); returns the row
    count written.

    mode="parts" (default, distributed): ``path`` is a directory;
    each Spark partition writes its own ``part-NNNNN.shp`` trio —
    the parquet part-file convention.  mode="single": one classic
    .shp/.shx/.dbf trio at ``path`` streamed through the driver with
    bounded memory (toLocalIterator) — the layout the reference's
    shapefile driver emits, inherently one sequential stream.
    """
    if "://" in str(path):
        raise ValueError(
            "write_shapefile needs a plain shared-filesystem path "
            f"(got {path!r}); object-store URIs are not supported")
    field_defs = _field_defs(df, geometry_col)
    attr_cols = [d[0] for d in field_defs]
    cols = [geometry_col] + attr_cols

    if mode == "single":
        stem = _stem(path)
        os.makedirs(os.path.dirname(stem) or ".", exist_ok=True)
        w = _ShpSet(stem, field_defs)
        for row in df.select(*cols).toLocalIterator():
            w.add(row[0], tuple(row[1:]))
        n = w.n
        w.close()
        return n
    if mode != "parts":
        raise ValueError(f"unknown mode {mode!r} (parts/single)")

    from gdal_spark.session import spread_for_kernel

    df = spread_for_kernel(df)
    os.makedirs(path, exist_ok=True)
    from pyspark.sql import functions as F
    from pyspark.sql.types import (
        LongType, StructField, StructType,
    )

    count_schema = StructType([StructField("n", LongType())])

    def kernel(batches):
        from pyspark import TaskContext
        pid = TaskContext.get().partitionId()
        w = None
        n = 0
        for b in batches:
            if w is None:
                w = _ShpSet(os.path.join(path, f"part-{pid:05d}"),
                            field_defs)
            geom = b[geometry_col]
            attrs = b[attr_cols].itertuples(index=False, name=None) \
                if attr_cols else ((),) * len(b)
            for g, a in zip(geom, attrs):
                w.add(None if g is None else bytes(g), a)
                n += 1
        if w is not None:
            w.close()
        yield pd.DataFrame({"n": [n]})

    counts = df.select(*cols).mapInPandas(kernel, count_schema)
    return int(counts.agg(F.sum("n")).first()[0] or 0)
