"""TopoJSON reader.

Reference: the GeoJSON driver family's TopoJSON reader
(ogr/ogrsf_frmts/geojson/ogrtopojsonreader.cpp), re-derived from the
PUBLIC TopoJSON 1.0 specification: a ``Topology`` document with a
shared ``arcs`` table (delta-encoded positions when ``transform``
{scale, translate} is present), and ``objects`` whose geometries
reference arcs by index — negative index ``~k`` (-1-k) means arc k
reversed.  Named GeometryCollections become their own layer (the
reference's a_layer behavior); everything else lands in the catch-all
``TopoJSON`` layer.

Distribution contract (declared): a TopoJSON document is ONE shared
topology — the arc table is global, so the file is not byte-range
splittable (the reference loads it whole too).  The driver parses the
JSON once, then geometry ASSEMBLY runs distributed: features become a
DataFrame and each task decodes its own features against the
(broadcast) arc table — the same small-dimension broadcast shape as
the spatial-join prefilter.

Tolerance (declared, narrower than the reference): features whose
geometry is malformed or empty (null/short coordinates, out-of-range
arc indices) are DROPPED — this engine's WKB model has no EMPTY
geometries; the reference emits EMPTY placeholders there.  Properties
surface as string columns (union of keys), matching the fixture
expectations (id/name).
"""

from __future__ import annotations

import json
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    BinaryType, LongType, StringType, StructField, StructType,
)

from gdal_spark.geometry import wkb as W


def _decode_arcs(raw, transform) -> list[np.ndarray | None]:
    if not isinstance(raw, list):
        return []
    sx, sy = (transform.get("scale", [1.0, 1.0])
              if transform else [1.0, 1.0])
    tx, ty = (transform.get("translate", [0.0, 0.0])
              if transform else [0.0, 0.0])
    out: list[np.ndarray | None] = []
    for arc in raw:
        if not isinstance(arc, list):
            out.append(None)
            continue
        pts = [p for p in arc
               if isinstance(p, list) and len(p) >= 2
               and all(isinstance(v, (int, float)) for v in p[:2])]
        if len(pts) < 2:
            out.append(None)
            continue
        a = np.asarray([(p[0], p[1]) for p in pts], dtype=np.float64)
        if transform:
            a = np.cumsum(a, axis=0)      # delta-encoded per spec
            a[:, 0] = a[:, 0] * sx + tx
            a[:, 1] = a[:, 1] * sy + ty
        out.append(a)
    return out


def _stitch(arc_refs, arcs) -> np.ndarray | None:
    """One ring/line from a list of (possibly ~reversed) arc
    indices; consecutive arcs share their junction vertex."""
    if not isinstance(arc_refs, list) or not arc_refs:
        return None
    parts = []
    for r in arc_refs:
        if not isinstance(r, int):
            return None
        k = r if r >= 0 else -1 - r
        if k >= len(arcs) or arcs[k] is None:
            return None
        a = arcs[k]
        if r < 0:
            a = a[::-1]
        parts.append(a if not parts else a[1:])
    return np.concatenate(parts, axis=0)


def _point(coords, transform):
    if not isinstance(coords, list) or len(coords) < 2 or \
            not all(isinstance(v, (int, float)) for v in coords[:2]):
        return None
    x, y = float(coords[0]), float(coords[1])
    if transform:
        sx, sy = transform.get("scale", [1.0, 1.0])
        tx, ty = transform.get("translate", [0.0, 0.0])
        x, y = x * sx + tx, y * sy + ty
    return x, y


def _geom_wkb(g: dict, arcs, transform) -> bytes | None:
    t = g.get("type")
    if t == "Point":
        p = _point(g.get("coordinates"), transform)
        return None if p is None else W.point_wkb(*p)
    if t == "MultiPoint":
        cs = g.get("coordinates")
        if not isinstance(cs, list):
            return None
        pts = [p for p in (_point(c, transform) for c in cs)
               if p is not None]
        return W.multipoint_wkb(pts) if pts else None
    if t == "LineString":
        line = _stitch(g.get("arcs"), arcs)
        return None if line is None else W.linestring_wkb(line)
    if t == "MultiLineString":
        rs = g.get("arcs")
        if not isinstance(rs, list):
            return None
        lines = [ln for ln in (_stitch(r, arcs) for r in rs)
                 if ln is not None]
        return W.multilinestring_wkb(lines) if lines else None
    if t == "Polygon":
        rs = g.get("arcs")
        if not isinstance(rs, list):
            return None
        rings = [rg for rg in (_stitch(r, arcs) for r in rs)
                 if rg is not None]
        return W.polygon_wkb(rings) if rings else None
    if t == "MultiPolygon":
        ps = g.get("arcs")
        if not isinstance(ps, list):
            return None
        polys = []
        for rs in ps:
            if not isinstance(rs, list):
                continue
            rings = [rg for rg in (_stitch(r, arcs) for r in rs)
                     if rg is not None]
            if rings:
                polys.append(rings)
        return W.multipolygon_wkb(polys) if polys else None
    return None


def read_topojson(spark: SparkSession, path: str) -> DataFrame:
    """-> (layer, fid, geometry WKB, id, properties...) over every
    object in the Topology.  Named GeometryCollections are their own
    ``layer``; other objects land in layer 'TopoJSON'."""
    with open(path) as fh:
        text = fh.read()
    try:
        topo = json.loads(text)
    except json.JSONDecodeError:
        # the reference's libjson parser tolerates trailing commas
        # (topojson1.topojson in its own test corpus has them);
        # strip ",\s*]" / ",\s*}" outside strings and retry strict
        import re as _re

        topo = json.loads(_re.sub(
            r",(\s*[\]}])", r"\1",
            _re.sub(r'"(?:[^"\\]|\\.)*"',
                    lambda m: m.group(0).replace(",", "\x00"),
                    text)).replace("\x00", ","))
    if topo.get("type") != "Topology":
        raise ValueError(f"{path}: not a TopoJSON Topology document")
    transform = topo.get("transform")
    arcs = _decode_arcs(topo.get("arcs"), transform)

    objects = topo.get("objects")
    items: list[tuple[str, dict]] = []
    if isinstance(objects, dict):
        items = [(k, v) for k, v in objects.items()
                 if isinstance(v, dict)]
    elif isinstance(objects, list):
        items = [("", v) for v in objects if isinstance(v, dict)]

    feats: list[dict] = []
    prop_keys: list[str] = []

    def add(layer: str, g: dict) -> None:
        props = g.get("properties")
        props = props if isinstance(props, dict) else {}
        for k in props:
            if k not in prop_keys:
                prop_keys.append(k)
        # the id FIELD comes from the top-level geometry id or the
        # properties' "id" key (the reference folds both into the
        # same "id" column — topojson2's a_layer expectation)
        fid_id = g.get("id", props.get("id"))
        feats.append({"layer": layer, "g": g,
                      "id": fid_id, "props": props})

    for name, obj in items:
        if obj.get("type") == "GeometryCollection":
            layer = obj.get("id") or name or "TopoJSON"
            geoms = obj.get("geometries")
            if isinstance(geoms, list):
                for g in geoms:
                    if isinstance(g, dict):
                        add(str(layer), g)
        else:
            add(name or "TopoJSON", obj)

    prop_keys = sorted(k for k in prop_keys if k != "id")
    schema = StructType(
        [StructField("layer", StringType()),
         StructField("fid", LongType()),
         StructField("geometry", BinaryType()),
         StructField("id", StringType())]
        + [StructField(k, StringType()) for k in prop_keys])

    rows = pd.DataFrame([{
        "layer": f["layer"], "fid": i,
        "gjson": json.dumps(f["g"]),
        "id": None if f["id"] is None else str(f["id"]),
        **{k: (None if f["props"].get(k) is None
               else str(f["props"][k])) for k in prop_keys},
    } for i, f in enumerate(feats)])
    if not len(rows):
        return spark.createDataFrame([], schema)
    src = spark.createDataFrame(rows)

    def kernel(batches: Iterator[pd.DataFrame]
               ) -> Iterator[pd.DataFrame]:
        for b in batches:
            out = {f.name: [] for f in schema.fields}
            for _, r in b.iterrows():
                wkb = _geom_wkb(json.loads(r["gjson"]), arcs,
                                transform)
                if wkb is None:
                    continue          # EMPTY/malformed: declared drop
                out["layer"].append(r["layer"])
                out["fid"].append(int(r["fid"]))
                out["geometry"].append(wkb)
                out["id"].append(r["id"])
                for k in prop_keys:
                    out[k].append(r[k])
            yield pd.DataFrame(out)

    return src.mapInPandas(kernel, schema)
