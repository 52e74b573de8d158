"""GeoJSON / GeoJSONSeq driver (read + write), from RFC 7946/8142.

Re-derives the read/write surface of the reference's GeoJSON driver
family (ogr/ogrsf_frmts/geojson/ — ogrgeojsonreader.cpp feature
assembly + field type promotion, ogrgeojsonwriter.cpp serialization,
the GeoJSONSeq streaming variant) from the public RFCs alone.

Spark-first distribution: the line-oriented GeoJSONSeq layout
(.geojsonl — one feature per line, or RFC 8142 RS-delimited
.geojsons) is the scale path — `spark.read.text` splits it into
tasks and a Pandas-batched kernel parses each slice, so a 100 GB
feature log fans out like any text source.  A classic single-doc
FeatureCollection is ONE JSON value and parses driver-side (bounded
by file size — the same single-stream contract as the reference's
non-streaming mode); the writer's default ``mode="parts"`` emits one
part-NNNNN.geojsonl per partition and ``mode="single"`` streams one
FeatureCollection through the driver with bounded memory.

Typing (ogrgeojsonreader.cpp promotion semantics): properties
promote bool -> long -> double -> string across features; list and
object values serialize as canonical JSON strings (declared
simplification — the engine's relational surface is scalar
columns).  Z ordinates drop (2-D engine, same declaration as the
shapefile driver).  GeometryCollection is out of scope (raises with
a clear message).
"""

from __future__ import annotations

import glob as _glob
import json
import os

import numpy as np
import pandas as pd

from gdal_spark.geometry.wkb import (
    LINESTRING, MULTILINESTRING, MULTIPOINT, MULTIPOLYGON, POINT,
    POLYGON, Geom, linestring_wkb, multilinestring_wkb,
    multipoint_wkb, multipolygon_wkb, parse_wkb, point_wkb,
    polygon_wkb,
)

_RS = "\x1e"

_GEOM_TYPES = ("Point", "LineString", "Polygon", "MultiPoint",
               "MultiLineString", "MultiPolygon")


# --------------------------------------------- geometry conversion

def _xy(coord) -> tuple[float, float]:
    return float(coord[0]), float(coord[1])   # Z (coord[2]) drops


def geojson_to_wkb(obj: dict | None) -> bytes | None:
    """GeoJSON geometry object -> WKB (None passes through)."""
    if obj is None:
        return None
    t = obj.get("type")
    c = obj.get("coordinates")
    if t == "Point":
        return point_wkb(*_xy(c))
    if t == "MultiPoint":
        return multipoint_wkb([_xy(p) for p in c])
    if t == "LineString":
        return linestring_wkb([_xy(p) for p in c])
    if t == "MultiLineString":
        return multilinestring_wkb([[_xy(p) for p in part]
                                    for part in c])
    if t == "Polygon":
        return polygon_wkb([[_xy(p) for p in ring] for ring in c])
    if t == "MultiPolygon":
        return multipolygon_wkb(
            [[[_xy(p) for p in ring] for ring in poly]
             for poly in c])
    if t == "GeometryCollection":
        raise ValueError(
            "GeometryCollection is out of scope (the engine's WKB "
            "model holds homogeneous geometries; split the "
            "collection upstream)")
    raise ValueError(f"unknown GeoJSON geometry type {t!r}")


def wkb_to_geojson(wkb: bytes | None) -> dict | None:
    """WKB -> GeoJSON geometry object (None passes through)."""
    if wkb is None:
        return None
    g: Geom = parse_wkb(bytes(wkb))

    def pts(a) -> list:
        return [[float(x), float(y)] for x, y in a]

    if g.kind == POINT:
        x, y = g.parts[0][0]
        return {"type": "Point", "coordinates": [float(x), float(y)]}
    if g.kind == MULTIPOINT:
        return {"type": "MultiPoint",
                "coordinates": [p for a in g.parts for p in pts(a)]}
    if g.kind == LINESTRING:
        return {"type": "LineString", "coordinates": pts(g.parts[0])}
    if g.kind == MULTILINESTRING:
        return {"type": "MultiLineString",
                "coordinates": [pts(a) for a in g.parts]}
    if g.kind == POLYGON:
        return {"type": "Polygon",
                "coordinates": [pts(r) for r in g.parts]}
    if g.kind == MULTIPOLYGON:
        po = g.part_offsets
        return {"type": "MultiPolygon",
                "coordinates": [
                    [pts(r) for r in g.parts[po[i]:po[i + 1]]]
                    for i in range(len(po) - 1)]}
    raise ValueError(f"unsupported WKB kind {g.kind} for GeoJSON")


# -------------------------------------------------- type promotion

_BOOL, _LONG, _DOUBLE, _STRING = 0, 1, 2, 3
_RANK_NAME = {_BOOL: "boolean", _LONG: "long", _DOUBLE: "double",
              _STRING: "string"}
_I64_MAX = 2 ** 63 - 1


def _value_rank(v) -> int:
    if isinstance(v, bool):
        return _BOOL
    if isinstance(v, int):
        return _LONG if abs(v) <= _I64_MAX else _DOUBLE
    if isinstance(v, float):
        return _DOUBLE
    return _STRING        # str, list, dict


def _coerce(v, rank: int):
    if v is None:
        return None
    if rank == _BOOL:
        return bool(v)
    if rank == _LONG:
        return int(v)
    if rank == _DOUBLE:
        return float(v)
    if isinstance(v, (list, dict)):
        return json.dumps(v, separators=(",", ":"),
                          ensure_ascii=False)
    if isinstance(v, bool):
        return "true" if v else "false"
    return str(v)


def _infer_fields(features) -> list[tuple[str, int]]:
    """First-seen-order property names with promoted ranks
    (ogrgeojsonreader.cpp's bool -> int -> real -> string lattice)."""
    order: list[str] = []
    rank: dict[str, int] = {}
    for f in features:
        props = f.get("properties") or {}
        for k, v in props.items():
            if v is None:
                if k not in rank:
                    order.append(k)
                    rank[k] = -1        # unseen type yet
                continue
            r = _value_rank(v)
            if k not in rank:
                order.append(k)
                rank[k] = r
            elif rank[k] == -1:
                rank[k] = r
            elif rank[k] != r:
                rank[k] = max(rank[k], r)
    return [(k, rank[k] if rank[k] >= 0 else _STRING)
            for k in order]


def _spark_type(rank: int):
    from pyspark.sql.types import (
        BooleanType, DoubleType, LongType, StringType,
    )
    return {_BOOL: BooleanType(), _LONG: LongType(),
            _DOUBLE: DoubleType(), _STRING: StringType()}[rank]


# ------------------------------------------------------------- read

def _doc_features(doc) -> list[dict]:
    t = doc.get("type")
    if t == "FeatureCollection":
        return doc.get("features") or []
    if t == "Feature":
        return [doc]
    if t in _GEOM_TYPES or t == "GeometryCollection":
        return [{"type": "Feature", "geometry": doc,
                 "properties": {}}]
    raise ValueError(f"not a GeoJSON document (type {t!r})")


def _fid_of(f):
    v = f.get("id")
    return int(v) if isinstance(v, (int, np.integer)) \
        and not isinstance(v, bool) else None


def _features_frame(features, fields) -> pd.DataFrame:
    out: dict = {
        "fid": pd.array([_fid_of(f) for f in features],
                        dtype="Int64"),
        "geometry": [geojson_to_wkb(f.get("geometry"))
                     for f in features],
    }
    for name, rank, col in fields:
        vals = [_coerce((f.get("properties") or {}).get(name), rank)
                for f in features]
        if rank == _LONG:
            out[col] = pd.array(vals, dtype="Int64")
        elif rank == _BOOL:
            out[col] = pd.array(vals, dtype="boolean")
        elif rank == _DOUBLE:
            out[col] = pd.array(vals, dtype="float64")
        else:
            out[col] = pd.array(vals, dtype="string")
    return pd.DataFrame(out)


def _dedupe(fields):
    """(name, rank) -> (name, rank, out_col) unique vs fid/geometry
    (case-insensitive, Spark's resolution rule)."""
    taken = {"fid", "geometry"}
    out = []
    for name, rank in fields:
        col, k = name, 0
        while col.lower() in taken:
            k += 1
            col = f"{name}_{k}"
        taken.add(col.lower())
        out.append((name, rank, col))
    return out


def _seq_records(text: str):
    recs = text.split(_RS) if _RS in text else text.splitlines()
    for r in recs:
        r = r.strip()
        if r:
            yield json.loads(r)


def read_geojson(spark, path: str, sample_bytes: int = 1 << 20):
    """Read GeoJSON -> DataFrame(fid, geometry WKB, property
    columns).

    ``path``: a .geojsonl/.geojsons sequence file (or a directory of
    part-*.geojsonl written by write_geojson) -> DISTRIBUTED read
    via spark.read.text + an Arrow-batched parse kernel; or a single
    .geojson/.json document (FeatureCollection, Feature, or bare
    geometry) -> driver-side parse, bounded by the file size.
    Property types promote bool -> long -> double -> string from the
    first ``sample_bytes`` of the sequence (whole doc for the
    single-doc form); lists/objects arrive as JSON strings.
    """
    from pyspark.sql.types import (
        BinaryType, LongType, StructField, StructType,
    )

    if "://" in str(path):
        raise ValueError(
            "read_geojson needs a plain shared-filesystem path "
            f"(got {path!r}); object-store URIs are not supported")

    if os.path.isdir(path):
        files = sorted(_glob.glob(os.path.join(path, "part-*")))
        if not files:
            raise FileNotFoundError(f"{path}: no part-* files")
        seq = True
    else:
        files = [path]
        seq = path.lower().endswith((".geojsonl", ".geojsons",
                                     ".ndjson"))

    if not seq:
        with open(path, encoding="utf-8-sig") as fh:
            features = _doc_features(json.load(fh))
        fields = _dedupe(_infer_fields(features))
        pdf = _features_frame(features, fields)
        schema = StructType(
            [StructField("fid", LongType()),
             StructField("geometry", BinaryType())]
            + [StructField(c, _spark_type(r))
               for _, r, c in fields])
        return spark.createDataFrame(pdf, schema=schema)

    # sequence: sample driver-side for the schema, parse
    # distributed.  The sample spans EVERY part head (a column
    # that is all-null in part-0 must still pick its type up from a
    # later part), bounded by sample_bytes total.
    sample_feats: list = []
    budget = sample_bytes
    sep = "\n"
    for f in files:
        if budget <= 0:
            break
        with open(f, encoding="utf-8-sig") as fh:
            head = fh.read(budget)
        complete = len(head) < budget
        budget -= len(head)
        if _RS in head:
            sep = _RS
        if not complete:             # drop the cut-off tail record
            head = head.rsplit(_RS if _RS in head else "\n", 1)[0]
        sample_feats.extend(_seq_records(head))
    fields = _dedupe(_infer_fields(sample_feats))
    schema = StructType(
        [StructField("fid", LongType()),
         StructField("geometry", BinaryType())]
        + [StructField(c, _spark_type(r)) for _, r, c in fields])

    reader = spark.read
    if sep == _RS:
        reader = reader.option("lineSep", _RS)
    lines = reader.text(files)

    def kernel(batches):
        for b in batches:
            feats = [json.loads(s) for s in b["value"]
                     if s and s.strip()]
            yield _features_frame(feats, fields)

    return lines.mapInPandas(kernel, schema)


# ------------------------------------------------------------ write

def _feature_json(geom, attrs: dict, fid) -> str:
    f: dict = {"type": "Feature"}
    if fid is not None and not pd.isna(fid):
        f["id"] = int(fid)
    f["geometry"] = wkb_to_geojson(geom)
    props = {}
    for k, v in attrs.items():
        if v is None or (isinstance(v, float) and np.isnan(v)):
            props[k] = None
        elif isinstance(v, (np.integer,)):
            props[k] = int(v)
        elif isinstance(v, (np.floating,)):
            props[k] = float(v)
        elif isinstance(v, (np.bool_,)):
            props[k] = bool(v)
        elif hasattr(v, "isoformat"):    # date / datetime
            props[k] = v.isoformat()
        else:
            props[k] = v
    f["properties"] = props
    return json.dumps(f, separators=(",", ":"), ensure_ascii=False)


def write_geojson(df, path: str, geometry_col: str = "geometry",
                  mode: str = "parts") -> int:
    """Write a WKB DataFrame as GeoJSON; returns rows written.

    mode="parts" (default, distributed): ``path`` is a directory of
    part-NNNNN.geojsonl (one RFC 7946 Feature per line — the
    GeoJSONSeq layout the reference streams).  mode="single": one
    classic FeatureCollection document at ``path`` streamed through
    the driver with bounded memory.  A ``fid`` column becomes the
    feature ``id``; other non-geometry columns become properties
    (dates as ISO strings).
    """
    if "://" in str(path):
        raise ValueError(
            "write_geojson needs a plain shared-filesystem path "
            f"(got {path!r}); object-store URIs are not supported")
    attr_cols = [c for c in df.columns
                 if c not in (geometry_col, "fid")]
    has_fid = "fid" in df.columns
    cols = [geometry_col] + (["fid"] if has_fid else []) + attr_cols

    def row_json(vals) -> str:
        geom = None if vals[0] is None else bytes(vals[0])
        fid = vals[1] if has_fid else None
        attrs = dict(zip(attr_cols, vals[2 if has_fid else 1:]))
        return _feature_json(geom, attrs, fid)

    if mode == "single":
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        n = 0
        with open(path, "w", encoding="utf-8") as fh:
            fh.write('{"type":"FeatureCollection","features":[\n')
            for row in df.select(*cols).toLocalIterator():
                fh.write((",\n" if n else "") + row_json(tuple(row)))
                n += 1
            fh.write("\n]}\n")
        return n
    if mode != "parts":
        raise ValueError(f"unknown mode {mode!r} (parts/single)")

    from gdal_spark.session import spread_for_kernel

    df = spread_for_kernel(df)
    os.makedirs(path, exist_ok=True)
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, StructField, StructType

    count_schema = StructType([StructField("n", LongType())])

    def kernel(batches):
        from pyspark import TaskContext
        pid = TaskContext.get().partitionId()
        fh = None
        n = 0
        for b in batches:
            if fh is None:
                fh = open(os.path.join(
                    path, f"part-{pid:05d}.geojsonl"), "w",
                    encoding="utf-8")
            for vals in b.itertuples(index=False, name=None):
                fh.write(row_json(vals) + "\n")
                n += 1
        if fh is not None:
            fh.close()
        yield pd.DataFrame({"n": [n]})

    counts = df.select(*cols).mapInPandas(kernel, count_schema)
    return int(counts.agg(F.sum("n")).first()[0] or 0)
