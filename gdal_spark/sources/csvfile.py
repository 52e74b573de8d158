"""OGR CSV driver (read + write), Spark-first.

Re-derives the reference's CSV driver surface
(ogr/ogrsf_frmts/csv/ogrcsvlayer.cpp field typing + geometry
resolution, ogrcsvdatasource.cpp separator sniffing, the .csvt
sidecar convention of doc/source/drivers/vector/csv.rst) on top of
Spark's native CSV source — the scale path IS ``spark.read.csv`` /
``df.write.csv`` (JVM parsing, splittable files, predicate pushdown
on non-geometry columns), with Python touching only the geometry
assembly kernel.

Semantics kept from the reference:

* ``.csvt`` sidecar — one line of quoted comma-separated types
  (``Integer``, ``Integer64``, ``Real``, ``String``, ``Date``,
  ``Time``, ``DateTime``, ``WKT``, ``CoordX``, ``CoordY``; width /
  precision qualifiers like ``Integer(5)`` / ``Real(10.7)`` parse
  and drop; subtypes ``Integer(Boolean)``, ``Integer(Int16)``,
  ``Real(Float32)`` map to Spark's boolean/short/float;
  ``JSon*List`` types arrive as JSON strings).
* geometry resolution precedence: a ``WKT``-typed .csvt column >
  ``geom_possible_names`` glob match (cell values may be WKT,
  hex-WKB, or GeoJSON — detected per value, as the reference does) >
  ``x_possible_names``+``y_possible_names`` point assembly;
  ``keep_geom_columns=False`` mirrors KEEP_GEOM_COLUMNS=NO.
* separator sniffing over the header line (comma/semicolon/tab/
  pipe — AUTO of ogrcsvdatasource.cpp), ``.tsv`` implies tab.
* AUTODETECT_TYPE=YES maps to Spark's native ``inferSchema``
  (declared divergence: Spark's two-pass inference does not keep
  the quoted-vs-unquoted string distinction the reference's
  autodetect uses).

Declared divergences: no FID column (the reference numbers rows in
file order, which is a partition-order artifact at scale — callers
needing stable ids use zipWithIndex or a key column); ``Time``
fields stay strings (no Spark time-of-day type).

Writer: ``mode="parts"`` is ``df.write.csv`` (one part per
partition, JVM-side, no Python in the loop) with geometry rendered
per GEOMETRY=AS_WKT / AS_XY / AS_YX / NONE; ``create_csvt`` writes
the sidecar from the Spark schema; ``mode="single"`` streams one
classic .csv through the driver with bounded memory.
"""

from __future__ import annotations

import csv as _csv
import fnmatch
import glob as _glob
import io
import json
import os

import numpy as np
import pandas as pd

from gdal_spark.geometry.wkb import parse_wkb, to_wkt, wkt_wkb

# ---------------------------------------------------------- .csvt

_CSVT_TO_SPARK = {
    "integer": "int", "integer64": "long", "real": "double",
    "string": "string", "date": "date", "time": "string",
    "datetime": "timestamp", "wkt": "string",
    "coordx": "double", "coordy": "double",
    "jsonstringlist": "string", "jsonintegerlist": "string",
    "jsoninteger64list": "string", "jsonreallist": "string",
}
_SUBTYPE_TO_SPARK = {"boolean": "boolean", "int16": "short",
                     "float32": "float"}


def parse_csvt(path: str) -> list[tuple[str, str]]:
    """.csvt sidecar -> [(ogr_type_lower, spark_type), ...]."""
    with open(path, encoding="utf-8-sig") as fh:
        line = fh.readline().strip()
    out = []
    for tok in next(_csv.reader(io.StringIO(line))):
        tok = tok.strip()
        base, sub = tok, ""
        if "(" in tok:
            base = tok[:tok.index("(")].strip()
            sub = tok[tok.index("(") + 1:tok.rindex(")")].strip()
        b = base.lower()
        if b == "integer" and sub.lower() in _SUBTYPE_TO_SPARK:
            out.append((b, _SUBTYPE_TO_SPARK[sub.lower()]))
        elif b == "real" and sub.lower() == "float32":
            out.append((b, "float"))
        elif b in _CSVT_TO_SPARK:
            out.append((b, _CSVT_TO_SPARK[b]))
        else:
            raise ValueError(f"unknown .csvt type {tok!r}")
    return out


_SPARK_TO_CSVT = {
    "int": "Integer", "bigint": "Integer64", "double": "Real",
    "float": "Real(Float32)", "string": "String", "date": "Date",
    "timestamp": "DateTime", "boolean": "Integer(Boolean)",
    "smallint": "Integer(Int16)", "tinyint": "Integer(Int16)",
}


# ------------------------------------------------------- sniffing

def _sniff_sep(header_line: str, path: str) -> str:
    if path.lower().endswith((".tsv", ".psv")):
        return "\t" if path.lower().endswith(".tsv") else "|"
    counts = {}
    in_q = False
    for ch in header_line:
        if ch == '"':
            in_q = not in_q
        elif not in_q and ch in ",;\t|":
            counts[ch] = counts.get(ch, 0) + 1
    return max(counts, key=counts.get) if counts else ","


def _read_header(path: str, sep: str | None) -> tuple[list[str], str]:
    with open(path, encoding="utf-8-sig", newline="") as fh:
        first = fh.readline()
        if sep is None:
            sep = _sniff_sep(first, path)
        fh.seek(0)
        rdr = _csv.reader(fh, delimiter=sep)
        header = next(rdr)
    return [h.strip() for h in header], sep


def _match(names, patterns) -> str | None:
    for pat in patterns:
        for n in names:
            if fnmatch.fnmatchcase(n.lower(), pat.lower()):
                return n
    return None


# ----------------------------------------------------------- read

def _geom_cell_to_wkb(v) -> bytes | None:
    """One GEOM_POSSIBLE_NAMES cell: WKT, hex-WKB, or GeoJSON —
    detected per value (ogrcsvlayer.cpp does the same sniff)."""
    if v is None or (isinstance(v, float) and np.isnan(v)):
        return None
    s = str(v).strip()
    if not s:
        return None
    try:
        if s[0] == "{":
            from gdal_spark.sources.geojson import geojson_to_wkb
            return geojson_to_wkb(json.loads(s))
        if s[:2] in ("00", "01") and len(s) >= 10 \
                and all(c in "0123456789abcdefABCDEF" for c in s[:16]):
            return bytes.fromhex(s)
        return wkt_wkb(s)
    except (ValueError, KeyError):
        # the reference warns and leaves the feature geometry-less
        # on unparseable cells (ogrcsvlayer.cpp); same leniency here
        return None


def read_csv_layer(spark, path: str, *, sep: str | None = None,
                   autodetect_types: bool = False,
                   x_possible_names=("lon", "long", "longitude", "x"),
                   y_possible_names=("lat", "latitude", "y"),
                   geom_possible_names=("WKT",),
                   keep_geom_columns: bool = True,
                   **reader_options):
    """Read a CSV layer -> DataFrame(geometry WKB?, fields...).

    ``path``: one .csv/.tsv file or a directory of part-*.csv
    (both read distributed — Spark's CSV source splits files).
    A ``.csvt`` sidecar (``<file>.csvt`` next to a file, or any
    ``*.csvt`` inside a directory) types the columns exactly;
    otherwise ``autodetect_types=True`` uses Spark's inferSchema and
    the default leaves every field a string (the reference's
    default).  ``reader_options`` pass through to ``spark.read``
    (e.g. ``dateFormat="yyyy/MM/dd"`` for slash-date files).
    """
    if "://" in str(path):
        raise ValueError(
            "read_csv_layer needs a plain shared-filesystem path "
            f"(got {path!r}); mount object stores via Hadoop conf "
            "and pass the mounted path")

    if os.path.isdir(path):
        parts = sorted(_glob.glob(os.path.join(path, "part-*")))
        files = [f for f in parts if not f.endswith(".crc")]
        if not files:
            raise FileNotFoundError(f"{path}: no part-* files")
        sidecars = _glob.glob(os.path.join(path, "*.csvt"))
        csvt = sidecars[0] if sidecars else None
        probe = files[0]
    else:
        files = [path]
        probe = path
        base = os.path.splitext(path)[0]
        csvt = base + ".csvt" if os.path.exists(base + ".csvt") \
            else None

    header, sep = _read_header(probe, sep)

    # escape='"' = RFC 4180 doubled-quote escaping (the convention
    # the reference's CSV driver and Python's csv module use; Spark
    # defaults to backslash escaping) — overridable via options
    reader = (spark.read.option("header", True).option("sep", sep)
              .option("encoding", "UTF-8").option("escape", '"'))
    for k, v in reader_options.items():
        reader = reader.option(k, v)

    roles: dict[str, str] = {}
    if csvt:
        types = parse_csvt(csvt)
        if len(types) != len(header):
            raise ValueError(
                f"{csvt}: {len(types)} types for {len(header)} "
                "columns")
        ddl = ", ".join(f"`{c}` {t}" for c, (_, t)
                        in zip(header, types))
        reader = reader.schema(ddl)
        for c, (ogr, _) in zip(header, types):
            if ogr in ("wkt", "coordx", "coordy"):
                roles[ogr] = roles.get(ogr) or c
    elif autodetect_types:
        reader = reader.option("inferSchema", True)
    else:
        reader = reader.schema(
            ", ".join(f"`{c}` string" for c in header))

    df = reader.csv(files)

    # ---- geometry resolution (reference precedence order)
    geom_src: list[str] = []
    kernel = None
    if "wkt" in roles:
        geom_src = [roles["wkt"]]
    else:
        g = _match(header, geom_possible_names)
        if g is not None:
            geom_src = [g]
    if geom_src:
        col = geom_src[0]

        def kernel(batches):
            for b in batches:
                out = b.drop(columns=[] if keep_geom_columns
                             else geom_src)
                out.insert(0, "geometry",
                           [_geom_cell_to_wkb(v) for v in b[col]])
                yield out
    else:
        if "coordx" in roles and "coordy" in roles:
            xc, yc = roles["coordx"], roles["coordy"]
        else:
            xc = _match(header, x_possible_names)
            yc = _match(header, y_possible_names)
        if xc and yc:
            geom_src = [xc, yc]
            dt = dict(df.dtypes)
            x_is_str = dt[xc] == "string"
            y_is_str = dt[yc] == "string"

            def kernel(batches):
                for b in batches:
                    n = len(b)
                    arr = np.empty(n, dtype=[("hdr", "S5"),
                                             ("x", "<f8"),
                                             ("y", "<f8")])
                    arr["hdr"] = b"\x01\x01\x00\x00\x00"
                    xs = pd.to_numeric(b[xc], errors="coerce") \
                        if x_is_str else b[xc]
                    ys = pd.to_numeric(b[yc], errors="coerce") \
                        if y_is_str else b[yc]
                    arr["x"] = np.asarray(xs, dtype=np.float64)
                    arr["y"] = np.asarray(ys, dtype=np.float64)
                    raw = arr.tobytes()
                    bad = np.isnan(arr["x"]) | np.isnan(arr["y"])
                    out = b.drop(columns=[] if keep_geom_columns
                                 else geom_src)
                    out.insert(0, "geometry",
                               [None if bad[i]
                                else raw[i * 21:(i + 1) * 21]
                                for i in range(n)])
                    yield out

    if kernel is None:
        return df          # plain attribute table, fully JVM-side

    from pyspark.sql.types import BinaryType, StructField, StructType
    keep = [f for f in df.schema.fields
            if keep_geom_columns or f.name not in geom_src]
    schema = StructType([StructField("geometry", BinaryType())]
                        + keep)
    return df.mapInPandas(kernel, schema)


# ---------------------------------------------------------- write

def _csvt_line(schema, geom_cols: dict[str, str]) -> str:
    toks = []
    for f in schema.fields:
        if f.name in geom_cols:
            toks.append(geom_cols[f.name])
            continue
        t = f.dataType.simpleString()
        if t not in _SPARK_TO_CSVT:
            raise ValueError(
                f"column {f.name!r}: no .csvt mapping for Spark "
                f"type {t!r}")
        toks.append(_SPARK_TO_CSVT[t])
    return ",".join(f'"{t}"' for t in toks)


def write_csv_layer(df, path: str, *, geometry: str = "AS_WKT",
                    geometry_col: str = "geometry", sep: str = ",",
                    create_csvt: bool = False,
                    mode: str = "parts") -> int | None:
    """Write a WKB DataFrame as a CSV layer.

    geometry: AS_WKT (a leading ``WKT`` column, lossless repr
    floats), AS_XY / AS_YX (leading X,Y double columns — point
    layers only), or NONE (drop).  mode="parts" is ``df.write.csv``
    — one part-*.csv per partition, pure JVM, returns None (no
    extra count job at scale); mode="single" streams one file
    through the driver and returns the row count.  create_csvt
    writes the type sidecar (layer.csvt inside the parts directory,
    ``<file>.csvt`` next to a single file).
    """
    if "://" in str(path):
        raise ValueError(
            "write_csv_layer needs a plain shared-filesystem path "
            f"(got {path!r})")
    has_geom = geometry_col in df.columns and geometry != "NONE"
    geom_cols: dict[str, str] = {}
    if has_geom:
        rest = [c for c in df.columns if c != geometry_col]
        if geometry == "AS_WKT":
            from pyspark.sql.types import (
                StringType, StructField, StructType,
            )
            schema = StructType(
                [StructField("WKT", StringType())]
                + [df.schema[c] for c in rest])

            def kernel(batches):
                for b in batches:
                    out = b.drop(columns=[geometry_col])
                    out.insert(0, "WKT",
                               [None if g is None
                                else to_wkt(parse_wkb(bytes(g)),
                                            None)
                                for g in b[geometry_col]])
                    yield out

            df = df.mapInPandas(kernel, schema)
            geom_cols = {"WKT": "WKT"}
        elif geometry in ("AS_XY", "AS_YX"):
            from pyspark.sql.types import (
                DoubleType, StructField, StructType,
            )
            names = ("X", "Y") if geometry == "AS_XY" else ("Y", "X")
            schema = StructType(
                [StructField(names[0], DoubleType()),
                 StructField(names[1], DoubleType())]
                + [df.schema[c] for c in rest])

            def kernel(batches):
                for b in batches:
                    n = len(b)
                    xs = np.full(n, np.nan)
                    ys = np.full(n, np.nan)
                    for i, g in enumerate(b[geometry_col]):
                        if g is None:
                            continue
                        raw = bytes(g)
                        if len(raw) != 21 or raw[:5] != \
                                b"\x01\x01\x00\x00\x00":
                            raise ValueError(
                                "GEOMETRY=AS_XY needs a pure point "
                                "layer (AS_WKT handles the rest)")
                        xy = np.frombuffer(raw, "<f8", 2, 5)
                        xs[i], ys[i] = xy[0], xy[1]
                    out = b.drop(columns=[geometry_col])
                    out.insert(0, names[1],
                               ys if names[1] == "Y" else xs)
                    out.insert(0, names[0],
                               xs if names[0] == "X" else ys)
                    yield out

            df = df.mapInPandas(kernel, schema)
            geom_cols = {"X": "CoordX", "Y": "CoordY"}
        else:
            raise ValueError(f"unknown geometry mode {geometry!r}")
    elif geometry_col in df.columns:
        df = df.drop(geometry_col)

    if mode == "parts":
        (df.write.mode("overwrite").option("header", True)
         .option("sep", sep).option("escape", '"').csv(path))
        if create_csvt:
            with open(os.path.join(path, "layer.csvt"), "w") as fh:
                fh.write(_csvt_line(df.schema, geom_cols) + "\n")
        return None
    if mode != "single":
        raise ValueError(f"unknown mode {mode!r} (parts/single)")

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    n = 0
    with open(path, "w", encoding="utf-8", newline="") as fh:
        w = _csv.writer(fh, delimiter=sep)
        w.writerow(df.columns)
        for row in df.toLocalIterator():
            w.writerow(["" if v is None else v for v in row])
            n += 1
    if create_csvt:
        with open(os.path.splitext(path)[0] + ".csvt", "w") as fh:
            fh.write(_csvt_line(df.schema, geom_cols) + "\n")
    return n
