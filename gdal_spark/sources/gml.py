"""GML driver (read + write), Spark-first.

Re-derives the reference's GML driver surface
(/root/reference/ogr/ogrsf_frmts/gml/) from the public OGC GML
2.1.2 / 3.x geometry grammar over stdlib ElementTree — the C++
driver is a SAX state machine with a .gfs type cache; here the
shape is the repo's byte-range XML split (sources/xmlgeo.py):
member elements cannot self-nest, so tasks own even byte ranges
and parse their own feature fragments with NO driver file scan.

Layout matrix handled (anchored on the reference's own autotest
corpus):

* ``<gml:featureMember>`` wrappers, one per feature (GML2 WFS,
  gnis_pop fixtures) — the member tag is the split tag.
* ``<gml:featureMembers>`` plural container (GeoServer WFS 1.1,
  archsites fixture) — the FEATURE element is the split tag.
* geometry encodings: ``gml:pos`` / ``gml:posList``
  (srsDimension-aware) and GML2 ``gml:coordinates`` with cs/ts
  separators; Point / LineString / Polygon
  (exterior|outerBoundaryIs + interior|innerBoundaryIs) / Curve
  with LineStringSegment patches /
  MultiPoint / MultiLineString|MultiCurve /
  MultiPolygon|MultiSurface via *Member(s) children.
* axis order: values are taken as (x, y) EXCEPT urn-style srsName
  CRS in the registry's geographic list (EPSG 4326/4258/4267/
  4269/4277/4313/4314), which the authority defines lat,lon and
  therefore swap — the reference's own GML3 expected files carry
  ``<gml:pos>49 2</gml:pos>`` for (2, 49).  Projected urn codes
  keep document order (easting first in every reference fixture).
  Anything beyond this list is declared out of scope.

Schema inference reads the FIRST ``schema_sample`` members of the
first file driver-side (bounded head read — the reference scans
the whole file or keeps a .gfs cache): property element local
names + types (all-int -> long, numeric -> double, else string);
a ``fid`` / ``gml:id`` attribute surfaces as the string column
``gml_id``.  ``fid`` is the member's byte offset (the repo's
declared XML-driver convention).

WRITE emits the reference's own ogr flavor (ogr:FeatureCollection
+ gml:featureMember + ogr:geometryProperty, GML3 pos/posList with
MultiCurve/MultiSurface members, no srsName -> no axis question on
round-trip); ``mode="parts"`` one document per partition,
``mode="single"`` streamed through the driver.
"""

from __future__ import annotations

import os
import re
from xml.etree import ElementTree as ET
from xml.sax.saxutils import escape as _xesc

import numpy as np

from gdal_spark.geometry.wkb import (
    LINESTRING, MULTILINESTRING, MULTIPOINT, MULTIPOLYGON, POINT,
    POLYGON, linestring_wkb, multilinestring_wkb, multipoint_wkb,
    multipolygon_wkb, point_wkb, polygon_wkb,
)
from gdal_spark.sources.xmlgeo import _local, _write_xml

# urn-style srsName codes whose authority axis order is lat,lon
# (the geographic members of the CRS registry; functions/crs.py)
_GEOGRAPHIC_LATLON = {"4326", "4258", "4267", "4269", "4277",
                      "4313", "4314"}

_URN_EPSG = re.compile(r"urn:[^ ]*:EPSG:[^:]*:?(\d+)$")


def _axis_swapped(srs: str | None) -> bool:
    if not srs:
        return False
    m = _URN_EPSG.match(srs.strip())
    return bool(m) and m.group(1) in _GEOGRAPHIC_LATLON


# ------------------------------------------------------- fragments

_PFX = re.compile(rb"<(/?)([A-Za-z_][\w.\-]*):")
_ATTR_PFX = re.compile(rb"\s([A-Za-z_][\w.\-]*):[\w.\-]+\s*=")


def _parse_fragment(frag: bytes):
    """ET-parse a mid-file fragment whose namespace prefixes are
    declared on the (absent) document root: wrap it in a synthetic
    root that binds every prefix to ``x:<prefix>``."""
    pfx = {m.group(2) for m in _PFX.finditer(frag)}
    pfx |= {m.group(1) for m in _ATTR_PFX.finditer(frag)}
    pfx.discard(b"xmlns")
    pfx.discard(b"xml")
    decls = b" ".join(b'xmlns:%s="x:%s"' % (p, p) for p in sorted(pfx))
    root = ET.fromstring(b"<_r " + decls + b">" + frag + b"</_r>")
    return root[0]


def _floats(text: str) -> np.ndarray:
    return np.array(text.split(), dtype=np.float64)


def _pair_stream(el) -> np.ndarray:
    """coords of a pos/posList/coordinates child of ``el``."""
    for ch in el:
        ln = _local(ch.tag)
        if ln in ("pos", "posList"):
            dim = int(ch.get("srsDimension", "2") or "2")
            v = _floats(ch.text or "")
            n = len(v) // dim
            return v[:n * dim].reshape(n, dim)[:, :2]
        if ln == "coordinates":
            cs = ch.get("cs", ",")
            ts = ch.get("ts", " ")
            tuples = [t for t in (ch.text or "").split(ts) if t]
            return np.array([t.split(cs)[:2] for t in tuples],
                            dtype=np.float64)
    return np.zeros((0, 2))


def _ring_coords(ring_parent) -> np.ndarray | None:
    """exterior/interior/outerBoundaryIs/innerBoundaryIs ->
    LinearRing coords."""
    for ch in ring_parent:
        if _local(ch.tag) == "LinearRing":
            return _pair_stream(ch)
    return None


def _gml_geometry(el):
    """A gml geometry ELEMENT -> (kind, parts, part_offsets) in
    document axis order; None for empty/unsupported."""
    ln = _local(el.tag)
    if ln == "Point":
        c = _pair_stream(el)
        return (POINT, [c[:1]], None) if len(c) else None
    if ln == "LineString":
        c = _pair_stream(el)
        return (LINESTRING, [c], None) if len(c) >= 2 else None
    if ln == "Curve":
        segs = []
        for seg in el.iter():
            if _local(seg.tag) == "LineStringSegment":
                c = _pair_stream(seg)
                if len(c):
                    segs.append(c)
        if not segs:
            return None
        joined = [segs[0]]
        for s in segs[1:]:
            joined.append(s[1:] if np.array_equal(
                s[0], joined[-1][-1]) else s)
        return (LINESTRING, [np.vstack(joined)], None)
    if ln == "Polygon":
        rings = []
        for ch in el:
            cn = _local(ch.tag)
            if cn in ("exterior", "outerBoundaryIs"):
                r = _ring_coords(ch)
                if r is not None and len(r) >= 4:
                    rings.insert(0, r)
            elif cn in ("interior", "innerBoundaryIs"):
                r = _ring_coords(ch)
                if r is not None and len(r) >= 4:
                    rings.append(r)
        return (POLYGON, rings, None) if rings else None
    if ln == "MultiPoint":
        pts = [_gml_geometry(g) for g in el.iter()
               if _local(g.tag) == "Point"]
        pts = [p for p in pts if p]
        if not pts:
            return None
        return (MULTIPOINT, [p[1][0] for p in pts], None)
    if ln in ("MultiLineString", "MultiCurve"):
        ls = [_gml_geometry(g) for g in el.iter()
              if _local(g.tag) in ("LineString", "Curve")]
        ls = [p for p in ls if p]
        if not ls:
            return None
        return (MULTILINESTRING, [p[1][0] for p in ls], None)
    if ln in ("MultiPolygon", "MultiSurface"):
        polys = [_gml_geometry(g) for g in el.iter()
                 if _local(g.tag) == "Polygon"]
        polys = [p for p in polys if p]
        if not polys:
            return None
        parts, offsets = [], [0]
        for p in polys:
            parts.extend(p[1])
            offsets.append(len(parts))
        return (MULTIPOLYGON, parts, offsets)
    return None


_GEOM_TAGS = {"Point", "LineString", "Curve", "Polygon",
              "MultiPoint", "MultiLineString", "MultiCurve",
              "MultiPolygon", "MultiSurface"}


def _feature_geometry(feat) -> bytes | None:
    """First geometry property of a feature element -> WKB
    (axis-corrected), skipping gml:boundedBy envelopes."""
    for prop in feat:
        if _local(prop.tag) == "boundedBy":
            continue
        for ch in prop:
            if _local(ch.tag) not in _GEOM_TAGS:
                continue
            g = _gml_geometry(ch)
            if g is None:
                return None
            kind, parts, offsets = g
            if _axis_swapped(ch.get("srsName")):
                parts = [p[:, ::-1] for p in parts]
            if kind == POINT:
                return point_wkb(float(parts[0][0, 0]),
                                 float(parts[0][0, 1]))
            if kind == LINESTRING:
                return linestring_wkb(parts[0])
            if kind == POLYGON:
                return polygon_wkb(parts)
            if kind == MULTIPOINT:
                return multipoint_wkb(
                    [(p[0, 0], p[0, 1]) for p in parts])
            if kind == MULTILINESTRING:
                return multilinestring_wkb(parts)
            offsets = offsets or [0, len(parts)]
            return multipolygon_wkb(
                [parts[offsets[i]:offsets[i + 1]]
                 for i in range(len(offsets) - 1)])
    return None


def _feature_element(member):
    """Unwrap a featureMember wrapper; a bare feature element (the
    featureMembers-plural layout) passes through."""
    ln = _local(member.tag)
    if ln in ("featureMember", "member") and len(member):
        return member[0]
    return member


def _feature_fields(feat) -> dict:
    out = {}
    for prop in feat:
        ln = _local(prop.tag)
        if ln == "boundedBy":
            continue
        if any(_local(ch.tag) in _GEOM_TAGS for ch in prop):
            continue
        if len(prop) == 0:
            out[ln] = prop.text
    gid = feat.get("fid") or next(
        (v for k, v in feat.attrib.items()
         if _local(k) == "id"), None)
    if gid is not None:
        out["gml_id"] = gid
    return out


# ------------------------------------------------------- sniffing

_MEMBER_PAT = re.compile(
    rb"<([A-Za-z_][\w.\-]*:)?(featureMembers?|member)[\s>]")
_START_TAG = re.compile(rb"<([A-Za-z_][\w.\-]*:?[\w.\-]*)[\s/>]")


def _sniff_layout(path: str) -> tuple[bytes, bool]:
    """(split_tag, wrapped): the byte tag tasks split on, and
    whether members wrap the feature element."""
    files = _first_file(path)
    with open(files, "rb") as fh:
        head = fh.read(1 << 16)
    m = _MEMBER_PAT.search(head)
    if m is None:
        raise ValueError(
            f"{path}: no featureMember/member element in the first "
            "64KB — not a recognizable GML feature collection")
    name = (m.group(1) or b"") + m.group(2)
    if m.group(2) != b"featureMembers":
        return name, True
    # plural container: the feature element inside is the unit
    after = head[m.end():]
    fm = _START_TAG.search(after)
    if fm is None:
        raise ValueError(f"{path}: empty featureMembers container")
    return fm.group(1), False


def _first_file(path: str) -> str:
    if os.path.isdir(path):
        import glob as _g
        files = sorted(_g.glob(os.path.join(path, "part-*.gml")))
        if not files:
            raise FileNotFoundError(f"{path}: no part-*.gml")
        return files[0]
    return path


def _infer_schema(path: str, split_tag: bytes, sample: int):
    """Head-read the first ``sample`` members of the first file and
    infer (ordered field names, spark type strings)."""
    from gdal_spark.sources.xmlgeo import _feature_slices, _read_span

    f = _first_file(path)
    sz = os.path.getsize(f)
    names: list[str] = []
    values: dict[str, list] = {}
    got = 0
    step = 1 << 20
    lo = 0
    while got < sample and lo < sz:
        hi = min(lo + step, sz)
        buf, base = _read_span(f, lo, hi, split_tag, sz)
        for _pos, frag in _feature_slices(buf, base, lo, hi,
                                          split_tag):
            feat = _feature_element(_parse_fragment(frag))
            for k, v in _feature_fields(feat).items():
                if k not in values:
                    names.append(k)
                    values[k] = []
                values[k].append(v)
            got += 1
            if got >= sample:
                break
        lo += step

    def typ(vs: list) -> str:
        vs = [v for v in vs if v is not None]
        if not vs:
            return "string"
        try:
            if all(str(int(v)) == str(v).strip() for v in vs):
                return "long"
        except ValueError:
            pass
        try:
            [float(v) for v in vs]
            return "double"
        except ValueError:
            return "string"

    types = {k: ("string" if k == "gml_id" else typ(values[k]))
             for k in names}
    return names, types


# ------------------------------------------------------- read

def read_gml(spark, path: str, *, bytes_per_task: int = 8 << 20,
             schema_sample: int = 100):
    """GML feature collection(s) -> DataFrame(fid, geometry WKB,
    fields...), fully distributed byte-range tasks."""
    split_tag, _wrapped = _sniff_layout(path)
    names, types = _infer_schema(path, split_tag, schema_sample)

    from pyspark.sql.types import (
        BinaryType, DoubleType, LongType, StringType, StructField,
        StructType,
    )
    sty = {"long": LongType(), "double": DoubleType(),
           "string": StringType()}
    schema = StructType(
        [StructField("fid", LongType()),
         StructField("geometry", BinaryType())]
        + [StructField(n, sty[types[n]]) for n in names])
    tset = dict(types)

    def row_fn(pos: int, el) -> list[dict]:
        feat = _feature_element(el)
        row = {"fid": pos, "geometry": _feature_geometry(feat)}
        fields = _feature_fields(feat)
        for n in names:
            v = fields.get(n)
            if v is None:
                row[n] = None
            elif tset[n] == "long":
                try:
                    row[n] = int(v)
                except ValueError:
                    row[n] = None
            elif tset[n] == "double":
                try:
                    row[n] = float(v)
                except ValueError:
                    row[n] = None
            else:
                row[n] = v
        return [row]

    return _range_reader_gml(spark, path, split_tag,
                             bytes_per_task, row_fn, schema)


def _range_reader_gml(spark, path, tag, bytes_per_task, row_fn,
                      schema):
    """xmlgeo._range_reader with namespace-safe fragment parsing
    (GML fragments carry prefixes declared on the document root)."""
    import pandas as pd

    from gdal_spark.sources.xmlgeo import (
        _feature_slices, _plan_tasks, _read_span,
    )

    if "://" in str(path):
        raise ValueError(
            f"read needs a plain shared-filesystem path (got "
            f"{path!r}); object-store URIs are not supported")
    tasks = _plan_tasks(path, ".gml", bytes_per_task)

    def kernel(batches):
        for b in batches:
            for _, t in b.iterrows():
                f, lo, hi = t["file"], int(t["lo"]), int(t["hi"])
                fsize = os.path.getsize(f)
                buf, base = _read_span(f, lo, hi, tag, fsize)
                rows = []
                for pos, frag in _feature_slices(buf, base, lo, hi,
                                                 tag):
                    rows.extend(row_fn(pos, _parse_fragment(frag)))
                cols = {fd.name: [] for fd in schema.fields}
                for r in rows:
                    for k in cols:
                        cols[k].append(r.get(k))
                yield pd.DataFrame(cols) if rows else \
                    pd.DataFrame({fd.name: pd.Series(dtype=object)
                                  for fd in schema.fields})

    tdf = pd.DataFrame(tasks, columns=["file", "lo", "hi"])
    ranges = spark.createDataFrame(tdf)
    return (ranges.repartition(
        min(len(tasks),
            spark.sparkContext.defaultParallelism * 2))
        .mapInPandas(kernel, schema))


# ------------------------------------------------------- write

def _num(v) -> str:
    return repr(float(v))


def _pos_list(coords: np.ndarray) -> str:
    return " ".join(f"{_num(x)} {_num(y)}" for x, y in coords)


def _gml_geom_xml(g) -> str:
    from gdal_spark.geometry import wkb as W

    if g.kind == W.POINT:
        p = g.parts[0][0]
        return (f"<gml:Point><gml:pos>{_num(p[0])} {_num(p[1])}"
                "</gml:pos></gml:Point>")
    if g.kind == W.LINESTRING:
        return ("<gml:LineString><gml:posList>"
                f"{_pos_list(g.parts[0])}"
                "</gml:posList></gml:LineString>")
    if g.kind == W.POLYGON:
        return _poly_xml(g.parts)
    if g.kind == W.MULTIPOINT:
        inner = "".join(
            "<gml:pointMember><gml:Point><gml:pos>"
            f"{_num(p[0, 0])} {_num(p[0, 1])}"
            "</gml:pos></gml:Point></gml:pointMember>"
            for p in g.parts)
        return f"<gml:MultiPoint>{inner}</gml:MultiPoint>"
    if g.kind == W.MULTILINESTRING:
        inner = "".join(
            "<gml:curveMember><gml:LineString><gml:posList>"
            f"{_pos_list(p)}</gml:posList></gml:LineString>"
            "</gml:curveMember>" for p in g.parts)
        return f"<gml:MultiCurve>{inner}</gml:MultiCurve>"
    po = g.part_offsets
    inner = "".join(
        "<gml:surfaceMember>"
        + _poly_xml(g.parts[po[i]:po[i + 1]])
        + "</gml:surfaceMember>"
        for i in range(len(po) - 1))
    return f"<gml:MultiSurface>{inner}</gml:MultiSurface>"


def _poly_xml(rings) -> str:
    out = ["<gml:Polygon><gml:exterior><gml:LinearRing>"
           f"<gml:posList>{_pos_list(rings[0])}</gml:posList>"
           "</gml:LinearRing></gml:exterior>"]
    for h in rings[1:]:
        out.append("<gml:interior><gml:LinearRing><gml:posList>"
                   f"{_pos_list(h)}</gml:posList></gml:LinearRing>"
                   "</gml:interior>")
    out.append("</gml:Polygon>")
    return "".join(out)


_GML_HEAD = (
    '<?xml version="1.0" encoding="utf-8" ?>\n'
    "<ogr:FeatureCollection\n"
    '     xmlns:ogr="http://ogr.maptools.org/"\n'
    '     xmlns:gml="http://www.opengis.net/gml">\n')


def write_gml(df, path: str, *, layer: str = "layer",
              geometry_col: str = "geometry",
              mode: str = "parts") -> int | None:
    """WKB DataFrame -> GML (the reference writer's ogr flavor:
    gml:featureMember wrapping <ogr:{layer}>).  A ``fid`` column
    becomes gml:id="{layer}.{fid}"."""
    def feature_fn(g, row: dict) -> str:
        gid = ""
        if "fid" in row and row["fid"] is not None:
            gid = f' gml:id="{layer}.{int(row["fid"])}"'
        parts = [f"  <gml:featureMember>\n    <ogr:{layer}{gid}>"
                 "<ogr:geometryProperty>"
                 + _gml_geom_xml(g) + "</ogr:geometryProperty>"]
        for k, v in row.items():
            if k == "fid" or v is None or (
                    isinstance(v, float) and np.isnan(v)):
                continue
            sv = (_num(v) if isinstance(v, (float, np.floating))
                  else _xesc(str(v)))
            parts.append(f"<ogr:{k}>{sv}</ogr:{k}>")
        parts.append(f"</ogr:{layer}>\n  </gml:featureMember>\n")
        return "".join(parts)

    return _write_xml(df, path, ".gml", geometry_col, mode,
                      _GML_HEAD, "</ogr:FeatureCollection>\n",
                      feature_fn)
