"""GPX + KML drivers (read + write), Spark-first.

Re-derives the reference's GPX driver (ogr/ogrsf_frmts/gpx/, the
format is the public Topografix GPX 1.1 schema) and the KML reader/
writer (ogr/ogrsf_frmts/kml/, OGC KML 2.2) over stdlib
``xml.etree.ElementTree``.

Spark-first scale design — the Hadoop text-split trick for XML:
GPX/KML FEATURE elements (``<wpt>``, ``<rte>``, ``<trk>``,
``<Placemark>``) are self-contained and cannot nest within
themselves, so a task owning byte range [lo, hi) of a file

* scans ITS OWN slice for feature-start tags (a match counts only
  if its absolute offset lands in [lo, hi) — the same ownership
  rule Hadoop's LineRecordReader uses for newlines),
* reads past ``hi`` only to finish the last element that STARTS in
  its range (bounded by the element length),
* parses each element slice independently with ElementTree.

No driver-side file scan at all: the driver only stats file sizes
and cuts even byte ranges.  ``fid`` is the element's byte offset —
unique, stable, monotone in file order (declared; the positional
convention of the reference is a sequential-reader artifact).

WRITE ``mode="parts"`` emits one standalone document per partition
(``part-NNNNN.gpx`` / ``.kml``) inside mapInPandas; ``mode=
"single"`` streams one classic document through the driver
(bounded memory, same stance as the other drivers).

Declared scope: GPX layers waypoints / routes / tracks (+
route_points / track_points flattened per-point views) with the
core fields name/cmt/desc/ele/time; link/extensions and metadata
drop.  KML: Placemarks flattened into one layer (folder hierarchy
drops), name/description fields, Point/LineString/LinearRing(->
POLYGON)/Polygon/homogeneous MultiGeometry; styles, gx: extensions
and mixed MultiGeometry -> NULL geometry.  Altitudes drop (2-D
engine).
"""

from __future__ import annotations

import glob as _glob
import os
import re
from xml.etree import ElementTree as ET
from xml.sax.saxutils import escape as _xesc

import numpy as np
import pandas as pd

from gdal_spark.geometry.wkb import (
    LINESTRING, MULTILINESTRING, MULTIPOINT, MULTIPOLYGON, POINT,
    POLYGON, linestring_wkb, multilinestring_wkb, multipoint_wkb,
    multipolygon_wkb, parse_wkb, point_wkb, polygon_wkb,
)

_GPX_LAYERS = ("waypoints", "routes", "tracks", "route_points",
               "track_points")
_GPX_TAG = {"waypoints": b"wpt", "routes": b"rte", "tracks": b"trk",
            "route_points": b"rte", "track_points": b"trk"}


# ======================================================= XML bits

def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _child(el, name: str):
    for c in el:
        if _local(c.tag) == name:
            return c
    return None


def _children(el, name: str):
    return [c for c in el if _local(c.tag) == name]


def _text(el, name: str) -> str | None:
    c = _child(el, name)
    if c is None or c.text is None:
        return None
    return c.text


def _coords(text: str | None) -> np.ndarray:
    """KML <coordinates> -> (n, 2) lon/lat.  Tuples separate on
    whitespace; the spec-violating ``0, 1`` spacing the reference
    tolerates (kml_with_space_content_in_coordinates.kml) is
    normalized by collapsing space around commas first."""
    if not text or not text.strip():
        return np.empty((0, 2))
    s = re.sub(r"\s*,\s*", ",", text.strip())
    pts = []
    for tok in s.split():
        parts = tok.split(",")
        if len(parts) < 2:
            continue
        pts.append((float(parts[0]), float(parts[1])))
    return np.array(pts, dtype=float) if pts else np.empty((0, 2))


# ============================================= byte-range scanner

def _feature_slices(buf: bytes, base: int, lo: int, hi: int,
                    tag: bytes):
    """(abs_offset, element_bytes) for every <tag ...> element whose
    start offset falls in [lo, hi).  ``buf`` starts at file offset
    ``base`` and extends far enough to close the last owned element
    (the caller guarantees this)."""
    pat = re.compile(rb"<" + tag + rb"[\s/>]")
    close = b"</" + tag + b">"
    out = []
    for m in pat.finditer(buf):
        pos = base + m.start()
        if pos < lo or pos >= hi:
            continue
        # self-closing?  the first '>' from the start tells us
        gt = buf.index(b">", m.start())
        if buf[gt - 1:gt] == b"/":
            out.append((pos, buf[m.start():gt + 1]))
            continue
        end = buf.index(close, gt) + len(close)
        out.append((pos, buf[m.start():end]))
    return out


def _read_span(path: str, lo: int, hi: int, tag: bytes,
               fsize: int) -> tuple[bytes, int]:
    """Read [lo-pad, hi + enough-to-close-the-last-element)."""
    pad = 64 if lo else 0           # a start tag spanning lo
    close = b"</" + tag + b">"
    with open(path, "rb") as fh:
        fh.seek(lo - pad)
        # read past hi by the opener length so a start tag whose
        # first byte lands just before hi is still recognizable
        buf = fh.read(hi - lo + pad + len(tag) + 2)
        # extend until the final (possibly cut) element can close:
        # cheap check — keep reading while an opener in our range
        # might still be unclosed
        ext = b""
        while True:
            tail = buf + ext
            last = None
            for m in re.finditer(rb"<" + tag + rb"[\s/>]", tail):
                if (lo - pad) + m.start() < hi:
                    last = m.start()
            if last is None:
                break
            gt = tail.find(b">", last)
            if gt != -1 and tail[gt - 1:gt] == b"/":
                break
            if gt != -1 and tail.find(close, gt) != -1:
                break
            if (lo - pad) + len(tail) >= fsize:
                break
            with open(path, "rb") as fh2:
                fh2.seek(lo - pad + len(tail))
                more = fh2.read(1 << 20)
            if not more:
                break
            ext += more
        buf = buf + ext
    return buf, lo - pad


def _plan_tasks(path: str, suffix: str,
                bytes_per_task: int) -> list[tuple[str, int, int]]:
    if os.path.isdir(path):
        files = sorted(_glob.glob(os.path.join(path,
                                               f"part-*{suffix}")))
        if not files:
            raise FileNotFoundError(f"{path}: no part-*{suffix}")
    else:
        files = [path]
    tasks = []
    for f in files:
        sz = os.path.getsize(f)
        for lo in range(0, max(sz, 1), bytes_per_task):
            tasks.append((f, lo, min(lo + bytes_per_task, sz)))
    return tasks


def _range_reader(spark, path: str, suffix: str, tag: bytes,
                  bytes_per_task: int, row_fn, schema):
    """Plan byte-range tasks and mapInPandas-parse them; ``row_fn``
    maps (abs_offset, ElementTree element) -> list of row dicts."""
    if "://" in str(path):
        raise ValueError(
            f"read needs a plain shared-filesystem path (got "
            f"{path!r}); object-store URIs are not supported")
    tasks = _plan_tasks(path, suffix, bytes_per_task)

    def kernel(batches):
        for b in batches:
            for _, t in b.iterrows():
                f, lo, hi = t["file"], int(t["lo"]), int(t["hi"])
                fsize = os.path.getsize(f)
                buf, base = _read_span(f, lo, hi, tag, fsize)
                rows = []
                for pos, frag in _feature_slices(buf, base, lo, hi,
                                                 tag):
                    el = ET.fromstring(frag.decode(
                        "utf-8", errors="replace"))
                    rows.extend(row_fn(pos, el))
                cols = {f.name: [] for f in schema.fields}
                for r in rows:
                    for k in cols:
                        cols[k].append(r.get(k))
                yield pd.DataFrame(cols) if rows else \
                    pd.DataFrame({f.name: pd.Series(dtype=object)
                                  for f in schema.fields})

    tdf = pd.DataFrame(tasks, columns=["file", "lo", "hi"])
    ranges = spark.createDataFrame(tdf)
    return (ranges.repartition(
        min(len(tasks),
            spark.sparkContext.defaultParallelism * 2))
        .mapInPandas(kernel, schema))


# ============================================================ GPX

def _gpx_schema(layer: str):
    from pyspark.sql.types import (
        BinaryType, DoubleType, LongType, StringType, StructField,
        StructType,
    )
    base = [StructField("fid", LongType()),
            StructField("geometry", BinaryType())]
    if layer == "waypoints":
        extra = [StructField("name", StringType()),
                 StructField("cmt", StringType()),
                 StructField("desc", StringType()),
                 StructField("ele", DoubleType()),
                 StructField("time", StringType())]
    elif layer in ("routes", "tracks"):
        extra = [StructField("name", StringType()),
                 StructField("cmt", StringType()),
                 StructField("desc", StringType())]
    elif layer == "route_points":
        extra = [StructField("route_fid", LongType()),
                 StructField("route_point_id", LongType()),
                 StructField("ele", DoubleType()),
                 StructField("time", StringType())]
    else:                                     # track_points
        extra = [StructField("track_fid", LongType()),
                 StructField("track_seg_id", LongType()),
                 StructField("track_seg_point_id", LongType()),
                 StructField("ele", DoubleType()),
                 StructField("time", StringType())]
    return StructType(base + extra)


def _pt_fields(el) -> dict:
    ele = _text(el, "ele")
    return {"ele": float(ele) if ele is not None else None,
            "time": _text(el, "time")}


def _gpx_rows(layer: str):
    def rows(pos: int, el):
        name = {"name": _text(el, "name"), "cmt": _text(el, "cmt"),
                "desc": _text(el, "desc")}
        if layer == "waypoints":
            r = {"fid": pos,
                 "geometry": point_wkb(float(el.get("lon")),
                                       float(el.get("lat"))),
                 **name, **_pt_fields(el)}
            return [r]
        if layer == "routes":
            pts = _children(el, "rtept")
            xy = np.array([(float(p.get("lon")), float(p.get("lat")))
                           for p in pts], dtype=float)
            return [{"fid": pos,
                     "geometry": (linestring_wkb(xy) if len(xy)
                                  else None), **name}]
        if layer == "tracks":
            segs = []
            for seg in _children(el, "trkseg"):
                pts = _children(seg, "trkpt")
                if pts:
                    segs.append(np.array(
                        [(float(p.get("lon")), float(p.get("lat")))
                         for p in pts], dtype=float))
            return [{"fid": pos,
                     "geometry": (multilinestring_wkb(segs)
                                  if segs else None), **name}]
        # per-point fids: element byte offset << 20 + running point
        # index — unique for files < 8 TB and < 1M points/element
        if layer == "route_points":
            out = []
            for i, p in enumerate(_children(el, "rtept")):
                out.append({"fid": (pos << 20) + i,
                            "route_fid": pos,
                            "route_point_id": i,
                            "geometry": point_wkb(
                                float(p.get("lon")),
                                float(p.get("lat"))),
                            **_pt_fields(p)})
            return out
        out = []                                  # track_points
        seq = 0
        for si, seg in enumerate(_children(el, "trkseg")):
            for i, p in enumerate(_children(seg, "trkpt")):
                out.append({"fid": (pos << 20) + seq,
                            "track_fid": pos, "track_seg_id": si,
                            "track_seg_point_id": i,
                            "geometry": point_wkb(
                                float(p.get("lon")),
                                float(p.get("lat"))),
                            **_pt_fields(p)})
                seq += 1
        return out
    return rows


def read_gpx(spark, path: str, layer: str = "waypoints", *,
             bytes_per_task: int = 8 << 20):
    """Read a .gpx file or a directory of part-*.gpx ->
    DataFrame(fid, geometry WKB, layer fields).  ``layer`` is one
    of waypoints / routes / tracks / route_points / track_points
    (the reference's five GPX layers, ogr/ogrsf_frmts/gpx)."""
    if layer not in _GPX_LAYERS:
        raise ValueError(f"layer must be one of {_GPX_LAYERS}, "
                         f"got {layer!r}")
    return _range_reader(spark, path, ".gpx", _GPX_TAG[layer],
                         bytes_per_task, _gpx_rows(layer),
                         _gpx_schema(layer))


def _num(v) -> str:
    return repr(float(v))


def _gpx_feature_xml(layer: str, geom, row: dict) -> str:
    def fields(keys, r):
        s = ""
        for k in keys:
            v = r.get(k)
            if v is None or (isinstance(v, float) and np.isnan(v)):
                continue
            sv = _num(v) if k == "ele" else _xesc(str(v))
            s += f"<{k}>{sv}</{k}>"
        return s

    if layer == "waypoints":
        x, y = geom.parts[0][0]
        return (f'<wpt lat="{_num(y)}" lon="{_num(x)}">'
                + fields(("ele", "time", "name", "cmt", "desc"),
                         row) + "</wpt>\n")
    if layer == "routes":
        body = fields(("name", "cmt", "desc"), row)
        for x, y in geom.parts[0]:
            body += f'<rtept lat="{_num(y)}" lon="{_num(x)}"/>'
        return f"<rte>{body}</rte>\n"
    body = fields(("name", "cmt", "desc"), row)
    for part in geom.parts:
        body += "<trkseg>"
        for x, y in part:
            body += f'<trkpt lat="{_num(y)}" lon="{_num(x)}"/>'
        body += "</trkseg>"
    return f"<trk>{body}</trk>\n"


_GPX_HEAD = ('<?xml version="1.0"?>\n<gpx version="1.1" '
             'creator="gdal_spark" '
             'xmlns="http://www.topografix.com/GPX/1/1">\n')


def write_gpx(df, path: str, layer: str = "waypoints", *,
              geometry_col: str = "geometry",
              mode: str = "parts") -> int | None:
    """Write a WKB DataFrame as GPX.  ``layer`` decides the element
    kind: waypoints (POINT + ele/time/name/cmt/desc columns when
    present), routes (LINESTRING -> rtept runs), tracks
    ((MULTI)LINESTRING -> trkseg per part).  mode="parts" emits one
    document per partition under ``path/``; mode="single" streams
    one classic .gpx through the driver; returns the row count for
    single, None for parts."""
    if layer not in ("waypoints", "routes", "tracks"):
        raise ValueError("writable layers: waypoints/routes/tracks,"
                         f" got {layer!r}")
    return _write_xml(df, path, ".gpx", geometry_col, mode,
                      _GPX_HEAD, "</gpx>\n",
                      lambda g, r: _gpx_feature_xml(layer, g, r))


# ============================================================ KML

def _kml_geom_wkb(el) -> bytes | None:
    """KML geometry element -> WKB (None for empty / unsupported —
    the reference's geometries.kml matrix semantics)."""
    kind = _local(el.tag)
    if kind == "Point":
        xy = _coords(_text(el, "coordinates"))
        return point_wkb(float(xy[0, 0]), float(xy[0, 1])) \
            if len(xy) else None
    if kind == "LineString":
        xy = _coords(_text(el, "coordinates"))
        return linestring_wkb(xy) if len(xy) >= 2 else None
    if kind == "LinearRing":
        xy = _coords(_text(el, "coordinates"))
        return polygon_wkb([xy]) if len(xy) >= 4 else None
    if kind == "Polygon":
        rings = []
        ob = _child(el, "outerBoundaryIs")
        lr = _child(ob, "LinearRing") if ob is not None else None
        if lr is not None:
            xy = _coords(_text(lr, "coordinates"))
            if len(xy) >= 4:
                rings.append(xy)
        if not rings:
            return None
        for ib in _children(el, "innerBoundaryIs"):
            lr = _child(ib, "LinearRing")
            if lr is None:
                continue
            xy = _coords(_text(lr, "coordinates"))
            if len(xy) >= 4:
                rings.append(xy)
        return polygon_wkb(rings)
    if kind == "MultiGeometry":
        parts = [(g, _kml_geom_wkb(g)) for g in el]
        parts = [(g, w) for g, w in parts if w is not None]
        if not parts:
            return None
        kinds = {parse_wkb(w).kind for _, w in parts}
        if kinds == {POINT}:
            return multipoint_wkb(
                [tuple(map(float, parse_wkb(w).parts[0][0]))
                 for _, w in parts])
        if kinds == {LINESTRING}:
            return multilinestring_wkb(
                [parse_wkb(w).parts[0] for _, w in parts])
        if kinds == {POLYGON}:
            return multipolygon_wkb(
                [list(parse_wkb(w).rings()) for _, w in parts])
        return None          # mixed MultiGeometry: declared out
    return None


_KML_GEOM_TAGS = ("Point", "LineString", "LinearRing", "Polygon",
                  "MultiGeometry")


def _kml_rows(pos: int, el):
    geom = None
    for c in el:
        if _local(c.tag) in _KML_GEOM_TAGS:
            geom = _kml_geom_wkb(c)
            break
    return [{"fid": pos, "geometry": geom,
             "name": _text(el, "name"),
             "description": _text(el, "description")}]


def read_kml(spark, path: str, *, bytes_per_task: int = 8 << 20):
    """Read a .kml file or a directory of part-*.kml ->
    DataFrame(fid, geometry WKB, name, description).  Placemarks
    from every folder flatten into one layer (declared); any KML
    namespace version parses (tags match on local names)."""
    from pyspark.sql.types import (
        BinaryType, LongType, StringType, StructField, StructType,
    )
    schema = StructType([
        StructField("fid", LongType()),
        StructField("geometry", BinaryType()),
        StructField("name", StringType()),
        StructField("description", StringType()),
    ])
    return _range_reader(spark, path, ".kml", b"Placemark",
                         bytes_per_task, _kml_rows, schema)


def _kml_coords(arr: np.ndarray) -> str:
    return " ".join(f"{_num(x)},{_num(y)}" for x, y in arr)


def _kml_geom_xml(g) -> str:
    if g.kind == POINT:
        return ("<Point><coordinates>"
                + _kml_coords(g.parts[0]) + "</coordinates></Point>")
    if g.kind == LINESTRING:
        return ("<LineString><coordinates>"
                + _kml_coords(g.parts[0])
                + "</coordinates></LineString>")
    if g.kind == POLYGON:
        s = ("<Polygon><outerBoundaryIs><LinearRing><coordinates>"
             + _kml_coords(g.parts[0])
             + "</coordinates></LinearRing></outerBoundaryIs>")
        for hole in g.parts[1:]:
            s += ("<innerBoundaryIs><LinearRing><coordinates>"
                  + _kml_coords(hole)
                  + "</coordinates></LinearRing></innerBoundaryIs>")
        return s + "</Polygon>"
    # multi kinds -> MultiGeometry of singles
    if g.kind in (MULTIPOINT, MULTILINESTRING, MULTIPOLYGON):
        single = {MULTIPOINT: POINT, MULTILINESTRING: LINESTRING,
                  MULTIPOLYGON: POLYGON}[g.kind]
        po = g.part_offsets
        groups = [g.parts[po[i]:po[i + 1]]
                  for i in range(len(po) - 1)]
        from gdal_spark.geometry.wkb import Geom
        inner = "".join(_kml_geom_xml(Geom(single, list(gr),
                                           [0, len(gr)]))
                        for gr in groups)
        return f"<MultiGeometry>{inner}</MultiGeometry>"
    raise ValueError(f"unsupported WKB kind {g.kind}")


def _kml_feature_xml(g, row: dict) -> str:
    s = "<Placemark>"
    for k in ("name", "description"):
        v = row.get(k)
        if v is not None and not (isinstance(v, float)
                                  and np.isnan(v)):
            s += f"<{k}>{_xesc(str(v))}</{k}>"
    return s + _kml_geom_xml(g) + "</Placemark>\n"


_KML_HEAD = ('<?xml version="1.0" encoding="UTF-8"?>\n'
             '<kml xmlns="http://www.opengis.net/kml/2.2">'
             "<Document>\n")


def write_kml(df, path: str, *, geometry_col: str = "geometry",
              mode: str = "parts") -> int | None:
    """Write a WKB DataFrame as KML Placemarks (name/description
    columns emit as elements when present; other columns drop —
    declared, the reference's KML writer keeps name/description
    plus a schema extension this engine scopes out)."""
    return _write_xml(df, path, ".kml", geometry_col, mode,
                      _KML_HEAD, "</Document></kml>\n",
                      _kml_feature_xml)


# =============================================== shared XML writer

def _write_xml(df, path, suffix, geometry_col, mode, head, tail,
               feature_fn) -> int | None:
    if "://" in str(path):
        raise ValueError(
            f"write needs a plain shared-filesystem path (got "
            f"{path!r}); object-store URIs are not supported")
    cols = [c for c in df.columns if c != geometry_col]

    def encode(pdf: pd.DataFrame) -> list[str]:
        out = []
        for _, r in pdf.iterrows():
            gv = r[geometry_col]
            if gv is None:
                continue
            g = parse_wkb(bytes(gv))
            out.append(feature_fn(g, {c: r[c] for c in cols}))
        return out

    from pyspark.sql.types import (
        LongType, StringType, StructField, StructType,
    )

    if mode == "parts":
        from gdal_spark.session import spread_for_kernel

        df = spread_for_kernel(df)
        os.makedirs(path, exist_ok=True)
        out_schema = StructType([StructField("file", StringType()),
                                 StructField("n", LongType())])

        def part_kernel(batches):
            from pyspark import TaskContext
            pid = TaskContext.get().partitionId()
            chunks = [b for b in batches]
            if not chunks or not sum(len(b) for b in chunks):
                return
            pdf = pd.concat(chunks, ignore_index=True)
            frags = encode(pdf)
            out = os.path.join(path, f"part-{pid:05d}{suffix}")
            with open(out, "w", encoding="utf-8") as fh:
                fh.write(head)
                fh.writelines(frags)
                fh.write(tail)
            yield pd.DataFrame({"file": [out], "n": [len(frags)]})

        df.mapInPandas(part_kernel, out_schema).collect()
        return None
    if mode != "single":
        raise ValueError(f"mode must be 'parts' or 'single', "
                         f"got {mode!r}")

    enc_schema = StructType([StructField("xml", StringType())])

    def enc_kernel(batches):
        for b in batches:
            frags = encode(b)
            if frags:
                yield pd.DataFrame({"xml": frags})

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    n = 0
    with open(path, "w", encoding="utf-8") as fh:
        fh.write(head)
        for row in (df.mapInPandas(enc_kernel, enc_schema)
                    .toLocalIterator(prefetchPartitions=True)):
            fh.write(row["xml"])
            n += 1
        fh.write(tail)
    return n
