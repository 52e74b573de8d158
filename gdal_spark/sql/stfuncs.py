"""The SQLITE-dialect spatial function table, Spark-registered.

The reference's SQL dialect exposes a spatialite-compatible ST_*
function surface (doc/source/user/sql_sqlite_dialect.rst; the
function bodies live in
ogr/ogrsf_frmts/sqlite/ogrsqlitesqlfunctionscommon.cpp and GEOS
behind ogr/ogrgeometry.cpp).  This module registers the same
surface as Arrow-batched pandas UDFs over the repo's own geometry
kernels, so every function is usable directly in ``spark.sql``
WHERE/SELECT clauses and in the OGR SQL dialect.

Scale note: every function here is a scalar map — embarrassingly
parallel, no shuffle, Arrow batch transfer.  The geometry-valued
ones return WKB binary columns, so they compose (e.g.
``ST_Area(ST_Buffer(ST_GeomFromText(w), 1.0))``).  For *join*
predicates use the dialect's ST_Intersects rewrite
(sql/ogrsql.py:427) — a raw UDF in an ON clause would execute as a
nested-loop; the rewrite turns it into the two-stage spatial join.

Declared scope: planar 2-D semantics over the homogeneous-WKB
engine; the overlay set (Intersection/Union/Difference/
SymDifference) is polygon×polygon (the GH kernel) and returns NULL
for other kinds; ST_Transform takes explicit (src, dst) EPSG codes
because WKB carries no SRID.

Function -> reference parity map (sql_sqlite_dialect.rst):
  constructors  ST_GeomFromText ST_GeomFromWKB ST_MakePoint/
                ST_Point ST_MakeEnvelope
  output        ST_AsText ST_AsBinary
  accessors     ST_X ST_Y ST_MinX ST_MinY ST_MaxX ST_MaxY
                ST_IsEmpty ST_IsValid ST_NumGeometries ST_NumPoints
                ST_GeometryN ST_Envelope ST_GeometryType (ogrsql)
  measures      ST_Area (ogrsql) ST_Length ST_Perimeter ST_Distance
  predicates    ST_Intersects ST_Contains ST_Within (ogrsql)
                ST_Disjoint
  processing    ST_Buffer ST_Centroid ST_ConvexHull ST_ConcaveHull
                ST_Simplify ST_SimplifyPreserveTopology
                ST_MakeValid ST_Intersection ST_Union ST_Difference
                ST_SymDifference ST_Transform ST_Hilbert
"""

from __future__ import annotations

import numpy as np
import pandas as pd

_ST_READY: set[int] = set()


def _geom_map(fn):
    """None-propagating WKB -> value series mapper."""
    def wrapped(col: pd.Series) -> pd.Series:
        from gdal_spark.geometry.wkb import parse_wkb

        return col.map(lambda b: fn(parse_wkb(bytes(b)))
                       if b is not None else None)
    return wrapped


def _bbox(g) -> tuple[float, float, float, float]:
    xs = np.concatenate([p[:, 0] for p in g.parts])
    ys = np.concatenate([p[:, 1] for p in g.parts])
    return float(xs.min()), float(ys.min()), \
        float(xs.max()), float(ys.max())


def _vertex_segment_min(a_parts, b_parts) -> float:
    """Min distance from A's vertices to B's segments+vertices,
    sqrt(dx*dx+dy*dy) form (matches plain-SQL oracles bit-for-bit
    on the point-point case)."""
    from gdal_spark.geometry.ops import point_segment_dist

    best = np.inf
    for pa in a_parts:
        for pb in b_parts:
            dx = pa[:, 0][:, None] - pb[:, 0][None, :]
            dy = pa[:, 1][:, None] - pb[:, 1][None, :]
            d2 = dx * dx + dy * dy
            best = min(best, float(np.sqrt(d2.min())))
            if len(pb) > 1:
                d = point_segment_dist(pa[:, 0], pa[:, 1], pb)
                best = min(best, float(np.min(d)))
    return best


def _geom_distance(ga, gb) -> float:
    from gdal_spark.geometry.overlay import geoms_intersect

    if geoms_intersect(ga, gb):
        return 0.0
    return min(_vertex_segment_min(ga.parts, gb.parts),
               _vertex_segment_min(gb.parts, ga.parts))


def _part_groups(g):
    """Parts grouped per member geometry (a MULTIPOLYGON member is
    its ring GROUP, not one ring — the part_offsets invariant)."""
    po = g.part_offsets
    return [g.parts[po[i]:po[i + 1]] for i in range(len(po) - 1)]


def _geometry_n(g, n: int):
    from gdal_spark.geometry import wkb as W

    groups = _part_groups(g)
    if n < 1 or n > len(groups):
        return None
    grp = groups[n - 1]
    if g.kind in (W.POLYGON, W.MULTIPOLYGON):
        return W.polygon_wkb(list(grp))
    if g.kind in (W.LINESTRING, W.MULTILINESTRING):
        return W.linestring_wkb(grp[0])
    return W.point_wkb(float(grp[0][0, 0]), float(grp[0][0, 1]))


def _overlay_pieces(ga, gb, op: str):
    """Multi-part-aware polygon overlay -> list of ring groups.

    Parts of a (multi)polygon are disjoint by the WKB invariant, so
    intersection/difference compose per part pair and concatenate;
    union routes everything through the planar-arrangement resolver
    (exact union semantics incl. hole/solid cancellation);
    symdifference = (A−B) ⊎ (B−A), disjoint by construction."""
    from gdal_spark.geometry.overlay import _close, _orient, poly_op

    a_groups = _part_groups(ga)
    b_groups = _part_groups(gb)
    if op == "union":
        from gdal_spark.geometry.valid import resolve_rings

        rings = []
        for grp in a_groups + b_groups:
            rings.append(_orient(_close(grp[0]), True))
            rings.extend(_orient(_close(h), False)
                         for h in grp[1:])
        return resolve_rings(rings, rule="positive")
    if op == "intersection":
        pieces = []
        for a in a_groups:
            for b in b_groups:
                pieces.extend(poly_op(list(a), list(b),
                                      "intersection"))
        return pieces
    if op == "difference":
        pieces = [list(a) for a in a_groups]
        for b in b_groups:
            nxt = []
            for p in pieces:
                nxt.extend(poly_op(p, list(b), "difference"))
            pieces = nxt
        return pieces
    # symdifference
    return (_overlay_pieces(ga, gb, "difference")
            + _overlay_pieces(gb, ga, "difference"))


def _overlay(op: str):
    """polygon x polygon overlay -> WKB (NULL for non-polygons or
    empty results) via the GH kernel + the multi-part emitter."""
    def fn(wa: pd.Series, wb: pd.Series) -> pd.Series:
        from gdal_spark.geometry import wkb as W
        from gdal_spark.geometry.wkb import parse_wkb
        from gdal_spark.plans.pipeline import _emit_poly

        out = []
        for a, b in zip(wa, wb):
            if a is None or b is None:
                out.append(None)
                continue
            ga, gb = parse_wkb(bytes(a)), parse_wkb(bytes(b))
            if ga.kind not in (W.POLYGON, W.MULTIPOLYGON) or \
                    gb.kind not in (W.POLYGON, W.MULTIPOLYGON):
                out.append(None)
                continue
            out.append(_emit_poly(_overlay_pieces(ga, gb, op)))
        return pd.Series(out, dtype=object)
    return fn


def register_st_functions(spark) -> None:
    """Register the full ST_* table on this session (idempotent
    per SparkContext).  Also pulls in the ogrsql base set."""
    key = id(spark.sparkContext)
    if key in _ST_READY:
        return
    _ST_READY.add(key)

    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import (
        BinaryType, BooleanType, DoubleType, IntegerType,
        StringType,
    )

    from gdal_spark.geometry import wkb as W
    from gdal_spark.geometry.packed import geom_centroid, geom_length
    from gdal_spark.geometry.wkb import parse_wkb
    from gdal_spark.plans.pipeline import (
        _do_convex_hull, _do_make_valid, _mk_buffer,
        _mk_concave_hull, _mk_simplify,
    )

    def reg(name, fn, rtype):
        spark.udf.register(name, pandas_udf(fn, rtype))

    # ---------------------------------------------- constructors
    def _from_text(col: pd.Series) -> pd.Series:
        return col.map(lambda s: W.wkt_wkb(s)
                       if s is not None else None)

    reg("st_geomfromtext", _from_text, BinaryType())

    def _identity(col: pd.Series) -> pd.Series:
        return col

    reg("st_geomfromwkb", _identity, BinaryType())
    reg("st_asbinary", _identity, BinaryType())

    def _make_point(x: pd.Series, y: pd.Series) -> pd.Series:
        return pd.Series(
            [None if (a is None or b is None or
                      (isinstance(a, float) and np.isnan(a)))
             else W.point_wkb(float(a), float(b))
             for a, b in zip(x, y)], dtype=object)

    reg("st_makepoint", _make_point, BinaryType())
    reg("st_point", _make_point, BinaryType())

    def _make_envelope(x0: pd.Series, y0: pd.Series, x1: pd.Series,
                       y1: pd.Series) -> pd.Series:
        out = []
        for a, b, c, d in zip(x0, y0, x1, y1):
            if a is None or b is None or c is None or d is None:
                out.append(None)
                continue
            ring = np.array([[a, b], [c, b], [c, d], [a, d],
                             [a, b]], dtype=float)
            out.append(W.polygon_wkb([ring]))
        return pd.Series(out, dtype=object)

    reg("st_makeenvelope", _make_envelope, BinaryType())

    # --------------------------------------------------- output
    def _as_text(col: pd.Series) -> pd.Series:
        return col.map(lambda b: W.to_wkt(parse_wkb(bytes(b)), None)
                       if b is not None else None)

    reg("st_astext", _as_text, StringType())

    # ------------------------------------------------ accessors
    reg("st_x", _geom_map(lambda g: float(g.parts[0][0, 0])),
        DoubleType())
    reg("st_y", _geom_map(lambda g: float(g.parts[0][0, 1])),
        DoubleType())
    reg("st_minx", _geom_map(lambda g: _bbox(g)[0]), DoubleType())
    reg("st_miny", _geom_map(lambda g: _bbox(g)[1]), DoubleType())
    reg("st_maxx", _geom_map(lambda g: _bbox(g)[2]), DoubleType())
    reg("st_maxy", _geom_map(lambda g: _bbox(g)[3]), DoubleType())

    def _is_empty(col: pd.Series) -> pd.Series:
        return col.map(
            lambda b: (len(parse_wkb(bytes(b)).parts) == 0
                       or all(len(p) == 0 for p in
                              parse_wkb(bytes(b)).parts))
            if b is not None else None)

    reg("st_isempty", _is_empty, BooleanType())

    def _is_valid(g) -> bool:
        from gdal_spark.geometry.ops import _ring_self_intersects

        if g.kind not in (W.POLYGON, W.MULTIPOLYGON):
            return True
        return not any(_ring_self_intersects(r) for r in g.rings())

    reg("st_isvalid", _geom_map(_is_valid), BooleanType())
    reg("st_numgeometries",
        _geom_map(lambda g: len(_part_groups(g))), IntegerType())
    reg("st_numpoints",
        _geom_map(lambda g: int(sum(len(p) for p in g.parts))),
        IntegerType())

    def _geometry_n_udf(col: pd.Series, n: pd.Series) -> pd.Series:
        return pd.Series(
            [None if b is None
             else _geometry_n(parse_wkb(bytes(b)), int(k))
             for b, k in zip(col, n)], dtype=object)

    reg("st_geometryn", _geometry_n_udf, BinaryType())

    def _envelope(g):
        x0, y0, x1, y1 = _bbox(g)
        return W.polygon_wkb([np.array(
            [[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]])])

    reg("st_envelope", _geom_map(_envelope), BinaryType())

    # ------------------------------------------------- measures
    reg("st_length", _geom_map(geom_length), DoubleType())

    def _perimeter(g) -> float:
        if g.kind not in (W.POLYGON, W.MULTIPOLYGON):
            return 0.0
        total = 0.0
        for r in g.rings():
            d = np.diff(r, axis=0)
            total += float(np.sqrt((d * d).sum(axis=1)).sum())
        return total

    reg("st_perimeter", _geom_map(_perimeter), DoubleType())

    def _distance(wa: pd.Series, wb: pd.Series) -> pd.Series:
        out = []
        for a, b in zip(wa, wb):
            if a is None or b is None:
                out.append(None)
                continue
            out.append(_geom_distance(parse_wkb(bytes(a)),
                                      parse_wkb(bytes(b))))
        return pd.Series(out, dtype="float64")

    reg("st_distance", _distance, DoubleType())

    # ----------------------------------------------- predicates
    def _disjoint(wa: pd.Series, wb: pd.Series) -> pd.Series:
        from gdal_spark.geometry.overlay import geoms_intersect

        out = []
        for a, b in zip(wa, wb):
            if a is None or b is None:
                out.append(None)
                continue
            out.append(not geoms_intersect(parse_wkb(bytes(a)),
                                           parse_wkb(bytes(b))))
        return pd.Series(out, dtype=object)

    reg("st_disjoint", _disjoint, BooleanType())

    # ----------------------------------------------- processing
    def _geom_to_geom(fn):
        def wrapped(col: pd.Series) -> pd.Series:
            return col.map(lambda b: fn(parse_wkb(bytes(b)))
                           if b is not None else None)
        return wrapped

    def _buffer(col: pd.Series, dist: pd.Series) -> pd.Series:
        return pd.Series(
            [None if b is None
             else _mk_buffer(float(d), 8)(parse_wkb(bytes(b)))
             for b, d in zip(col, dist)], dtype=object)

    reg("st_buffer", _buffer, BinaryType())

    reg("st_centroid",
        _geom_to_geom(lambda g: W.point_wkb(*geom_centroid(g))),
        BinaryType())
    reg("st_convexhull", _geom_to_geom(_do_convex_hull),
        BinaryType())

    def _concave(col: pd.Series, ratio: pd.Series) -> pd.Series:
        return pd.Series(
            [None if b is None
             else _mk_concave_hull(float(r))(parse_wkb(bytes(b)))
             for b, r in zip(col, ratio)], dtype=object)

    reg("st_concavehull", _concave, BinaryType())

    def _mk_simplify_udf(preserve: bool):
        def fn(col: pd.Series, tol: pd.Series) -> pd.Series:
            return pd.Series(
                [None if b is None
                 else _mk_simplify(float(t), preserve)(
                     parse_wkb(bytes(b)))
                 for b, t in zip(col, tol)], dtype=object)
        return fn

    reg("st_simplify", _mk_simplify_udf(False), BinaryType())
    reg("st_simplifypreservetopology", _mk_simplify_udf(True),
        BinaryType())
    reg("st_makevalid", _geom_to_geom(_do_make_valid), BinaryType())

    reg("st_intersection", _overlay("intersection"), BinaryType())
    reg("st_union", _overlay("union"), BinaryType())
    reg("st_difference", _overlay("difference"), BinaryType())
    reg("st_symdifference", _overlay("symdifference"), BinaryType())

    def _geom_wkb(kind, parts, part_offsets):
        if kind == W.POINT:
            return W.point_wkb(float(parts[0][0, 0]),
                               float(parts[0][0, 1]))
        if kind == W.MULTIPOINT:
            return W.multipoint_wkb([(float(p[0, 0]),
                                      float(p[0, 1]))
                                     for p in parts])
        if kind == W.LINESTRING:
            return W.linestring_wkb(parts[0])
        if kind == W.MULTILINESTRING:
            return W.multilinestring_wkb(list(parts))
        po = part_offsets
        groups = [parts[po[i]:po[i + 1]]
                  for i in range(len(po) - 1)]
        if kind == W.POLYGON:
            return W.polygon_wkb(list(groups[0]))
        return W.multipolygon_wkb([list(gr) for gr in groups])

    def _transform(col: pd.Series, src: pd.Series,
                   dst: pd.Series) -> pd.Series:
        from gdal_spark.functions.crs import transform as crs_tf

        out = []
        for b, s, d in zip(col, src, dst):
            if b is None:
                out.append(None)
                continue
            fn = crs_tf(f"EPSG:{int(s)}", f"EPSG:{int(d)}")
            g = parse_wkb(bytes(b))
            parts = []
            for p in g.parts:
                x, y = fn(p[:, 0].copy(), p[:, 1].copy())
                parts.append(np.column_stack([x, y]))
            out.append(_geom_wkb(g.kind, parts, g.part_offsets))
        return pd.Series(out, dtype=object)

    reg("st_transform", _transform, BinaryType())

    def _hilbert(x: pd.Series, y: pd.Series, x0: pd.Series,
                 y0: pd.Series, x1: pd.Series,
                 y1: pd.Series) -> pd.Series:
        from gdal_spark.functions.hilbert import hilbert_code_u16

        xv = x.to_numpy(float)
        yv = y.to_numpy(float)
        w = x1.to_numpy(float) - x0.to_numpy(float)
        h = y1.to_numpy(float) - y0.to_numpy(float)
        hm = (1 << 16) - 1
        gx = np.clip(np.floor(hm * (xv - x0.to_numpy(float))
                              / np.where(w == 0, 1, w)),
                     0, hm).astype(np.uint32)
        gy = np.clip(np.floor(hm * (yv - y0.to_numpy(float))
                              / np.where(h == 0, 1, h)),
                     0, hm).astype(np.uint32)
        return pd.Series(hilbert_code_u16(gx, gy).astype(np.int64))

    from pyspark.sql.types import LongType
    reg("st_hilbert", _hilbert, LongType())

    # base set (st_area / st_astext alias st_aswkt /
    # st_geometrytype / st_contains point + geom / st_within /
    # st_intersects) — shared with the OGR SQL dialect
    from gdal_spark.sql.ogrsql import _register_geom_udfs
    _register_geom_udfs(spark)
